package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations: declared, named row constraints with a
  * clean/quarantine split and per-constraint violation metrics — the
  * pipeline-gate pattern (Delta Live Tables' EXPECT ... ON VIOLATION,
  * re-expressed as plain DataFrame transforms, so it runs identically
  * in batch and inside foreachBatch).
  *
  * Semantics: a row is CLEAN iff every constraint evaluates TRUE.
  * NULL is a violation — the quarantine gate wants "provably fine",
  * not "not provably broken" (SQL CHECK keeps NULLs; a training-data
  * pipeline must not, because a NULL quality signal IS a quality
  * problem). The quarantine side names every failed constraint, so
  * triage can group by reason instead of re-deriving it.
  *
  * Scale shape: the split is one narrow projection computing a small
  * array column plus two filters over the same scan — no shuffle, no
  * UDF, whole-stage codegen end to end; the violations array is
  * bounded by the constraint count, never by data. */
object Expectations {

  /** Tag each row with its sorted list of failed constraint names. */
  def flag(df: DataFrame, constraints: Seq[(String, Column)]): DataFrame = {
    val fails = array(constraints.map { case (name, c) =>
      when(!coalesce(c, lit(false)), lit(name))
    }: _*)
    df.withColumn("violations",
      array_sort(filter(fails, x => x.isNotNull)))
  }

  /** Split into (clean, quarantined): clean rows drop the marker,
    * quarantined rows keep `violations` for reason-grouped triage. */
  def split(df: DataFrame, constraints: Seq[(String, Column)])
  : (DataFrame, DataFrame) = {
    val flagged = flag(df, constraints)
    (flagged.filter(size(col("violations")) === 0).drop("violations"),
      flagged.filter(size(col("violations")) > 0))
  }

  /** Attach per-constraint violation counts (plus total rows) as
    * `observe()` metrics under `name` — surfaced through the same
    * QueryExecutionListener/StreamingQueryListener machinery the
    * Monitoring module uses, so a quality regression shows up in the
    * metrics stream without a second pass over the data. */
  def observed(df: DataFrame, constraints: Seq[(String, Column)],
      name: String = "expectations"): DataFrame = {
    val metrics = constraints.map { case (n, c) =>
      sum(when(!coalesce(c, lit(false)), 1L).otherwise(0L))
        .as(s"viol_$n")
    } :+ count(lit(1)).as("rows_total")
    df.observe(name, metrics.head, metrics.tail: _*)
  }
}
