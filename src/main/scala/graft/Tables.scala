package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Table loaders + shared helpers for oracle-deterministic arithmetic.
  *
  * All queries read the driver-generated parquet fixtures
  * (`/root/testdata/sf*`, see FIXTURES.md). Reads go through here so every
  * operator gets the same scan path (plain parquet scan; Catalyst handles
  * column pruning + predicate pushdown — verified via .explain in specs).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // every consumer gets the engine's optimizer rules (notably the
    // event-time pushdown for the derived ts column below)
    graft.plans.GraftRules.attach(spark)
    // Fixture timestamps are written without isAdjustedToUTC; read them
    // as session-tz TimestampType (the session is pinned UTC in every
    // entry point) rather than TIMESTAMP_NTZ, so one ts type reaches all
    // queries regardless of fixture vintage and predicates stay natively
    // pushable — no normalizing Cast between the scan and the filters.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if (name == "events") {
      // The events.ts encoding has varied across fixture generations:
      // plain TIMESTAMP(MICROS) (current), and TIMESTAMP(NANOS), which
      // Spark's vectorized reader rejects — readable only as raw int64
      // via legacy.parquet.nanosAsLong. Detect from the loaded schema
      // and normalize.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // int64 nanos: convert via exact integer division — ns DIV 1000
          // (a double division would lose precision: epoch-ns ~1.7e18 >
          // 2^53). plans.EventTimePushdown recovers scan pruning for
          // predicates on this derived column.
          raw.withColumn("ts",
            expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}

/** Determinism helpers for DuckDB-oracle-compared queries (SURVEY.md §7
  * "sharp edges"): float sums differ bit-wise between engines depending on
  * accumulation order, so money-like doubles (fixtures carry 2-decimal
  * values) are summed as exact DECIMAL and cast back to double — both
  * engines then produce the identical IEEE-754 value.
  */
object Ql {
  /** Query signature of the driver contract: (session, sfDir) => result. */
  type Q = (SparkSession, String) => DataFrame

  /** 2-decimal exact cast; DECIMAL(12,2) keeps products within both
    * engines' 38-digit cap even after two multiplications. */
  def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact sum of 2-decimal money values, surfaced as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact mean: decimal sum cast to double, divided by exact count —
    * identical operand bits in both engines => identical quotient. */
  def davg(c: Column): Column = sum(dec(c)).cast("double") / count(c)
}
