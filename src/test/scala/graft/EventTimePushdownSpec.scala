package graft

import org.apache.spark.sql.functions._

class EventTimePushdownSpec extends SparkSpec {
  import spark.implicits._

  private val cutoff = lit("2024-01-15 00:00:00").cast("timestamp")

  test("ts predicate reaches the parquet scan as a raw-ns bound") {
    val df = Tables.load(spark, sfDir, "events")
      .filter(col("ts") >= cutoff)
      .select("event_id")
    val scanLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PushedFilters")).get
    assert(scanLine.contains("GreaterThanOrEqual(ts"), scanLine)
  }

  test("augmented filter returns exactly the same rows") {
    val filtered = Tables.load(spark, sfDir, "events")
      .filter(col("ts") >= cutoff)
      .select("event_id").as[Long].collect().toSet
    // reference computed WITHOUT any plan involvement: collect the raw
    // nanos and apply the µs comparison in plain Scala
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val cutoffUs = java.time.Instant.parse("2024-01-15T00:00:00Z")
      .getEpochSecond * 1000000L
    val expected = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_id", "ts").as[(Long, Long)].collect()
      .filter { case (_, ns) => ns / 1000L >= cutoffUs }.map(_._1).toSet
    assert(filtered == expected)
    assert(filtered.nonEmpty)
  }

  test("equality and upper bounds are augmented soundly") {
    val ev = Tables.load(spark, sfDir, "events")
    val lower = ev.filter(col("ts") < cutoff).count()
    val upper = ev.filter(col("ts") >= cutoff).count()
    assert(lower + upper == ev.count())
    // strict/loose bound agreement around an exact event timestamp
    val someTs = ev.select(max(col("ts"))).collect()(0).getTimestamp(0)
    val eq = ev.filter(col("ts") === lit(someTs)).count()
    assert(eq >= 1)
  }
}
