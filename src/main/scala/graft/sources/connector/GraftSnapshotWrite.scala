package graft.sources.connector

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder => V2SortOrder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

import graft.sources.SnapshotTable

/** DataSource V2 WRITE path for [[SnapshotTable]] roots:
  *
  * {{{
  *   df.write.format("graft-snapshot").option("path", root)
  *     .mode("append").save()      // CAS append commit
  *     .mode("overwrite")          // truncate-replace commit
  * }}}
  *
  * Executor tasks write immutable parquet files straight into a
  * staging segment (parquet-mr, the writer twin of
  * [[GraftPartitionReader]]); the driver's commit computes the same
  * per-file manifest stats `append` would (min/max on the table's
  * cluster key, bloom on its bloom column — one column-pruned pass)
  * and lands the version through the SAME claim/publish CAS protocol
  * as every native commit. A concurrent native `append` and a V2
  * write therefore serialize correctly: one wins version N, the
  * other retries onto N+1 carrying both file sets.
  *
  * When the table is range-clustered, the write REQUESTS an ordered
  * distribution on the cluster key ([[RequiresDistributionAndOrdering]])
  * so Spark range-partitions + sorts the input before the tasks run —
  * new files land as disjoint key ranges and stay prunable, instead
  * of silently eroding the layout.
  *
  * Scope notes (stated): a task attempt that fails aborts and deletes
  * its own file; the whole-job abort deletes the staging segment. A
  * SPECULATIVE twin attempt that loses the commit race leaves an
  * unreferenced file inside the segment — invisible to every reader
  * (the manifest lists only committed files) and reaped with the
  * segment by `vacuum` once no manifest references it. */
private[connector] class GraftWriteBuilder(root: String,
    info: LogicalWriteInfo) extends WriteBuilder with SupportsTruncate {

  private var replace = false

  override def truncate(): WriteBuilder = { replace = true; this }

  override def build(): Write = {
    val schema = info.schema()
    schema.fields.foreach(f =>
      require(GraftSnapshotSource.SupportedTypes.contains(f.dataType),
        s"graft-snapshot v1 does not write ${f.dataType.simpleString} " +
          s"column '${f.name}'"))
    new GraftWrite(root, schema, replace)
  }
}

private[connector] class GraftWrite(root: String, schema: StructType,
    replace: Boolean) extends Write with RequiresDistributionAndOrdering {

  // the layout new files must maintain (empty for a replace: the new
  // contents define the table, and an explicit layout is the native
  // commit API's job)
  private val (clusterKey, bloomKey) = {
    val spark = SparkSession.active
    if (replace) (None, None)
    else {
      val (ck, bk) = SnapshotTable.layoutOf(spark, root)
      (ck.filter(k => schema.fieldNames.exists(_.equalsIgnoreCase(k))),
        bk.filter(k => schema.fieldNames.exists(_.equalsIgnoreCase(k))))
    }
  }

  /** A clustered table asks Spark to range-partition + sort the input
    * on the cluster key, so each task writes one compact key range —
    * the same shape `stageSegment` builds with repartitionByRange. */
  override def requiredDistribution(): Distribution =
    clusterKey.map(k => Distributions.ordered(Array[V2SortOrder](
      Expressions.sort(Expressions.column(k), SortDirection.ASCENDING))))
      .getOrElse(Distributions.unspecified())

  override def requiredOrdering(): Array[V2SortOrder] =
    clusterKey.map(k => Array[V2SortOrder](
      Expressions.sort(Expressions.column(k), SortDirection.ASCENDING)))
      .getOrElse(Array.empty)

  override def toBatch: BatchWrite =
    new GraftBatchWrite(root, schema, replace, clusterKey, bloomKey)
}

private[connector] case class GraftTaskFile(name: Option[String])
  extends WriterCommitMessage

private[connector] class GraftBatchWrite(root: String,
    schema: StructType, replace: Boolean, clusterKey: Option[String],
    bloomKey: Option[String]) extends BatchWrite {

  private val seg: Path = SnapshotTable.newSegmentPath(root)

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
  : DataWriterFactory = new GraftWriterFactory(seg.toString, schema.json)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val rel = messages.toSeq.collect {
      case GraftTaskFile(Some(name)) => s"_data/${seg.getName}/$name"
    }
    if (rel.isEmpty && !replace) return // empty append: nothing to commit
    val entries =
      if (rel.isEmpty) Seq.empty
      else SnapshotTable.statsEntries(spark, root, seg, rel,
        clusterKey, bloomKey)
    if (replace)
      SnapshotTable.replaceStaged(spark, root, seg, entries, schema)
    else
      SnapshotTable.appendStaged(spark, root, seg, entries, schema)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    SnapshotTable.fs(spark, root).delete(seg, true)
  }
}

private[connector] class GraftWriterFactory(segAbs: String,
    schemaJson: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
  : DataWriter[InternalRow] =
    new GraftDataWriter(segAbs, schemaJson, partitionId, taskId)
}

/** One parquet file per non-empty task, written with parquet-mr's
  * Group API under a schema translated field-by-field from the Spark
  * one (standard logical types — the stats pass and every Spark
  * reader read these files back natively). The file is created
  * LAZILY on the first row, so empty partitions leave nothing to
  * commit or clean. */
private[connector] class GraftDataWriter(segAbs: String,
    schemaJson: String, partitionId: Int, taskId: Long)
  extends DataWriter[InternalRow] {

  private val schema =
    DataType.fromJson(schemaJson).asInstanceOf[StructType]
  private val fileName =
    f"part-$partitionId%05d-$taskId.snappy.parquet"
  private val filePath = new Path(segAbs, fileName)
  private val msgType: MessageType = GraftDataWriter.parquetSchema(schema)
  private val factory = new SimpleGroupFactory(msgType)
  private var writer: ParquetWriter[Group] = _

  override def write(row: InternalRow): Unit = {
    if (writer == null)
      writer = ExampleParquetWriter.builder(filePath)
        .withConf(new Configuration())
        .withType(msgType)
        .withCompressionCodec(CompressionCodecName.SNAPPY)
        .build()
    val g = factory.newGroup()
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) addValue(g, i, schema.fields(i).dataType, row)
      i += 1
    }
    writer.write(g)
  }

  private def addValue(g: Group, i: Int, dt: DataType,
      row: InternalRow): Unit = dt match {
    case IntegerType | DateType => g.add(i, row.getInt(i))
    case LongType | TimestampType | TimestampNTZType =>
      g.add(i, row.getLong(i)) // timestamps are micros in InternalRow
    case FloatType => g.add(i, row.getFloat(i))
    case DoubleType => g.add(i, row.getDouble(i))
    case BooleanType => g.add(i, row.getBoolean(i))
    case StringType => g.add(i,
      Binary.fromConstantByteArray(row.getUTF8String(i).getBytes))
    case other => throw new UnsupportedOperationException(
      s"graft-snapshot writer: ${other.simpleString}")
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    GraftTaskFile(if (writer != null) Some(fileName) else None)
  }

  override def abort(): Unit = {
    if (writer != null) {
      writer.close()
      new Path(segAbs).getFileSystem(new Configuration())
        .delete(filePath, false)
    }
  }

  override def close(): Unit = ()
}

private[connector] object GraftDataWriter {

  /** Spark → parquet schema, the inverse of the reader's projection:
    * all fields optional, standard logical annotations so any parquet
    * reader (including Spark's vectorized one) round-trips the
    * values. */
  def parquetSchema(st: StructType): MessageType = {
    val b = Types.buildMessage()
    st.fields.foreach { f =>
      val t = f.dataType match {
        case IntegerType =>
          Types.optional(PrimitiveTypeName.INT32).named(f.name)
        case LongType =>
          Types.optional(PrimitiveTypeName.INT64).named(f.name)
        case FloatType =>
          Types.optional(PrimitiveTypeName.FLOAT).named(f.name)
        case DoubleType =>
          Types.optional(PrimitiveTypeName.DOUBLE).named(f.name)
        case BooleanType =>
          Types.optional(PrimitiveTypeName.BOOLEAN).named(f.name)
        case StringType =>
          Types.optional(PrimitiveTypeName.BINARY)
            .as(LogicalTypeAnnotation.stringType()).named(f.name)
        case DateType =>
          Types.optional(PrimitiveTypeName.INT32)
            .as(LogicalTypeAnnotation.dateType()).named(f.name)
        case TimestampType =>
          Types.optional(PrimitiveTypeName.INT64)
            .as(LogicalTypeAnnotation.timestampType(true,
              LogicalTypeAnnotation.TimeUnit.MICROS)).named(f.name)
        case TimestampNTZType =>
          Types.optional(PrimitiveTypeName.INT64)
            .as(LogicalTypeAnnotation.timestampType(false,
              LogicalTypeAnnotation.TimeUnit.MICROS)).named(f.name)
        case other => throw new UnsupportedOperationException(
          s"graft-snapshot writer: ${other.simpleString} " +
            s"column '${f.name}'")
      }
      b.addField(t)
    }
    b.named("graft_write")
  }
}
