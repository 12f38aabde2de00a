package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra-Gries heavy-hitters sketch:
  * `graft_topk(col, k)` → ARRAY<STRUCT<item, est_count BIGINT>>.
  *
  * The frequency sibling of the HLL family — the vocabulary/heavy-user
  * census a 100 TB corpus runs without a full GROUP BY: at most `k`
  * counters per partial buffer, merged associatively (sum counts, then
  * decrement by the (k+1)-th largest and drop non-positive — the
  * standard MG merge). Guarantees: estimates never exceed true counts,
  * undercount by at most n/(k+1), and every item with frequency above
  * n/(k+1) is present. When `k` ≥ the number of distinct items no
  * decrement ever fires and the counts are EXACT and deterministic —
  * which is what makes the fixture query oracle-comparable.
  *
  * Output rows are sorted (count desc, item asc) for determinism.
  * Supported item types: STRING, BIGINT, INT.
  */
case class MisraGriesTopK(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Any, Long]]
  with UnaryLike[Expression] {

  override def prettyName: String = "graft_topk"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", child.dataType),
    StructField("est_count", LongType))), containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1 || k > 512)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be in [1, 512]")
    else child.dataType match {
      case StringType | LongType | IntegerType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName supports STRING/BIGINT/INT items, got ${t.simpleString}")
    }

  override def createAggregationBuffer(): java.util.HashMap[Any, Long] =
    new java.util.HashMap[Any, Long]()

  override def update(buf: java.util.HashMap[Any, Long],
      input: InternalRow): java.util.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    // UTF8String from an unsafe row points into a reused buffer — copy
    // before retaining it as a map key
    val key: Any = v match {
      case s: UTF8String => s.clone()
      case other => other
    }
    val cur = buf.get(key)
    if (buf.containsKey(key)) buf.put(key, cur + 1L)
    else if (buf.size < k) buf.put(key, 1L)
    else decrementAll(buf, 1L)
    buf
  }

  override def merge(buf: java.util.HashMap[Any, Long],
      other: java.util.HashMap[Any, Long]): java.util.HashMap[Any, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, (if (buf.containsKey(e.getKey)) cur else 0L)
        + e.getValue)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything, drop <= 0
      val counts = new Array[Long](buf.size)
      var i = 0
      val vs = buf.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val d = counts(buf.size - k - 1)
      decrementAll(buf, d)
    }
    buf
  }

  private def decrementAll(buf: java.util.HashMap[Any, Long],
      d: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - d
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }

  override def eval(buf: java.util.HashMap[Any, Long]): Any = {
    import scala.jdk.CollectionConverters._
    val sorted = buf.asScala.toSeq.sortWith { case ((i1, c1), (i2, c2)) =>
      if (c1 != c2) c1 > c2
      else (i1, i2) match {
        case (a: UTF8String, b: UTF8String) => a.compareTo(b) < 0
        case (a: Long, b: Long) => a < b
        case (a: Int, b: Int) => a < b
        case _ => false
      }
    }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(item, c)
    }.toArray[Any])
  }

  override def serialize(buf: java.util.HashMap[Any, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      e.getKey match {
        case s: UTF8String =>
          val b = s.getBytes
          out.writeInt(b.length); out.write(b)
        case l: Long => out.writeLong(l)
        case i: Int => out.writeInt(i)
      }
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Any, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[Any, Long](n * 2)
    var i = 0
    while (i < n) {
      val key: Any = child.dataType match {
        case StringType =>
          val len = in.readInt()
          val b = new Array[Byte](len)
          in.readFully(b)
          UTF8String.fromBytes(b)
        case LongType => in.readLong()
        case IntegerType => in.readInt()
        case t => throw new IllegalStateException(s"bad item type $t")
      }
      buf.put(key, in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MisraGriesTopK =
    copy(child = c)
}
