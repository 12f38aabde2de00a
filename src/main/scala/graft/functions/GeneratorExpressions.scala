package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_shingles(text, n)` — a custom Catalyst [[Generator]], the
  * table-function (UDTF) extension class: one OUTPUT ROW per word
  * n-gram shingle of the input text (whole text as a single shingle
  * when shorter than n tokens — the same convention as the
  * decontamination/shingle queries' transform+explode formulation,
  * which this is proven equivalent to in VectorExpressionsSpec).
  *
  * Why a Generator and not transform+explode: the higher-order form
  * materializes the full shingle ARRAY per row before exploding —
  * peak memory ∝ document size — while a Generator streams rows out
  * one at a time (Spark's Generate operator consumes the iterator
  * lazily), which matters when a 100 TB corpus contains pathological
  * multi-MB documents. Like every built-in generator (explode,
  * posexplode, inline), Generate sits outside whole-stage codegen, so
  * CodegenFallback costs nothing extra here.
  *
  * Reference analogue: the reference tokenizes event text fields in
  * Python loops (services/streaming-service/event_processor.py); this
  * is the engine-native row-generating equivalent.
  */
case class ShingleRows(child: Expression, n: Int)
    extends Generator with CodegenFallback {

  require(n >= 1, s"graft_shingles needs n >= 1, got $n")

  override def children: Seq[Expression] = Seq(child)

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles needs a string column, got ${child.dataType}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val toks = v.asInstanceOf[UTF8String].toString.split(' ')
      if (toks.length < n)
        Seq(InternalRow(UTF8String.fromString(toks.mkString(" "))))
      else
        (0 to toks.length - n).iterator.map { i =>
          InternalRow(UTF8String.fromString(
            toks.slice(i, i + n).mkString(" ")))
        }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
