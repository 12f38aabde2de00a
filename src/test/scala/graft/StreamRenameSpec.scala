package graft.sources.connector

import graft.SparkSpec
import graft.sources.SnapshotTable
import org.apache.spark.sql.catalyst.InternalRow

/** A RUNNING stream captures its schema at start; a mid-stream RENAME
  * means files committed after it store the NEW physical name while
  * the stream still asks for the old one. The rename epochs resolve
  * the stale request per file — post-rename files map (old logical ->
  * new physical) and the stream keeps serving real values under the
  * names it began with, instead of silently going NULL. */
class StreamRenameSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-srn").toString + "/t"

  test("a snapshot stream keeps serving a column renamed mid-stream: " +
      "post-rename files translate old-logical -> new-physical") {
    val root = tmpRoot()
    SnapshotTable.commit(spark, root,
      Seq((1L, 10), (2L, 20)).toDF("k", "x").coalesce(1))       // v1
    val startSchema = GraftSnapshotSource.schemaOf(spark, root, 1L)
    assert(startSchema.fieldNames.toSeq == Seq("k", "x"))
    val stream = new GraftMicroBatchStream(root, startSchema)
    val o0 = stream.initialOffset()
    val o1 = stream.latestOffset()
    // batch 1: pre-rename file, no aliases needed
    val b1 = stream.planInputPartitions(o0, o1)
    assert(b1.forall(
      _.asInstanceOf[GraftInputPartition].aliases.isEmpty))

    SnapshotTable.renameColumn(spark, root, "x", "y")           // v2
    SnapshotTable.append(spark, root,
      Seq((3L, 30)).toDF("k", "y").coalesce(1))                 // v3
    val o3 = stream.latestOffset()
    val b2 = stream.planInputPartitions(o1, o3)
    assert(b2.length == 1)
    val p = b2.head.asInstanceOf[GraftInputPartition]
    assert(p.aliases.toSeq == Seq("x" -> "y"),
      s"stale stream name must translate forward, got " +
        s"${p.aliases.toSeq}")
    // and the rows actually decode under the stream's schema
    val factory = new GraftReaderFactory(startSchema.json,
      Array.empty)
    val reader = factory.createReader(b2.head)
    val rows = Iterator.continually(reader)
      .takeWhile(_.next()).map(_.get().asInstanceOf[InternalRow])
      .map(r => (r.getLong(0), r.getInt(1))).toList
    reader.close()
    assert(rows == List((3L, 30)),
      s"mid-stream rename lost the column's values: $rows")
  }
}
