package graft

import org.apache.spark.sql.functions._
import graft.operators.Expectations

/** Declared data-quality expectations (operators/Expectations): the
  * gate semantics the Scaladoc states, pinned — clean/quarantine
  * partition the input exactly, NULL constraint results quarantine
  * (provably-fine semantics), violation reasons are complete and
  * sorted, and the observe() face reports per-constraint counts
  * without a second pass. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val constraints = Seq(
    "has_name" -> col("name").isNotNull,
    "positive" -> (col("v") > 0),
    "short_name" -> (length(col("name")) <= 4))

  private lazy val fixture = Seq(
    (1, "ok", 5.0),          // clean
    (2, null, 1.0),          // has_name fails; short_name NULL -> fails
    (3, "toolong", 2.0),     // short_name fails
    (4, "neg", -1.0),        // positive fails
    (5, "bad!!", -9.0)       // short_name AND positive fail
  ).toDF("id", "name", "v")

  test("split partitions the input exactly; quarantine names every " +
      "failed constraint, sorted; NULL evaluations quarantine") {
    val (clean, quar) = Expectations.split(fixture, constraints)
    assert(clean.select("id").as[Int].collect().toSeq == Seq(1))
    val reasons = quar.select(col("id"), col("violations"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[String](1).toList).toMap
    assert(reasons == Map(
      2 -> List("has_name", "short_name"), // NULL length => violation
      3 -> List("short_name"),
      4 -> List("positive"),
      5 -> List("positive", "short_name")))
    assert(clean.count() + quar.count() == fixture.count())
    assert(clean.columns.toSeq == Seq("id", "name", "v"),
      "clean side must drop the marker column")
  }

  test("observed() surfaces per-constraint violation counts through " +
      "the metrics stream — no second pass over the data") {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.Row]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          ns: Long): Unit =
        qe.observedMetrics.get("quality_gate").foreach(got.add)
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      Expectations.observed(fixture, constraints, "quality_gate")
        .write.format("noop").mode("overwrite").save()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (got.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(!got.isEmpty, "observed metrics never arrived")
      val m = got.peek()
      assert(m.getAs[Long]("viol_has_name") == 1L)
      assert(m.getAs[Long]("viol_positive") == 2L)
      assert(m.getAs[Long]("viol_short_name") == 3L)
      assert(m.getAs[Long]("rows_total") == 5L)
    } finally spark.listenerManager.unregister(listener)
  }

  test("streaming quality gate: a foreachBatch expectations split " +
      "lands clean and quarantined rows in separate snapshot tables " +
      "that exactly partition the input — replay-safe via MERGE") {
    import graft.sources.SnapshotTable
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-qgate")
      .toString
    val cleanRoot = s"$base/clean"
    val quarRoot = s"$base/quarantine"
    val gate = Seq(
      "positive" -> (col("v") > 0),
      "short_name" -> (length(col("name")) <= 4))
    val stream = MemoryStream[(Long, String, Double)]
    val q = stream.toDF().toDF("id", "name", "v")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) {
          val (clean, quar) = Expectations.split(b, gate)
          // MERGE, not append: a replayed micro-batch upserts the
          // same keys instead of duplicating them — the same
          // exactly-once-per-key contract the lakehouse sink uses
          if (!clean.isEmpty) SnapshotTable.merge(spark, cleanRoot,
            clean, "id")
          if (!quar.isEmpty) SnapshotTable.merge(spark, quarRoot,
            quar.withColumn("violations",
              concat_ws(",", col("violations"))), "id")
        }
        ()
      }.start()
    try {
      stream.addData((1L, "ok", 5.0), (2L, "toolong", 2.0),
        (3L, "neg", -1.0))
      q.processAllAvailable()
      stream.addData((4L, "fine", 1.0), (5L, "bad", -2.0))
      q.processAllAvailable()
    } finally q.stop()
    val cleanIds = SnapshotTable.read(spark, cleanRoot)
      .select("id").as[Long].collect().sorted.toSeq
    val quar = SnapshotTable.read(spark, quarRoot)
      .select("id", "violations").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleanIds == Seq(1L, 4L))
    assert(quar == Map(2L -> "short_name", 3L -> "positive",
      5L -> "positive"))
  }

  test("the events_expectations query reports clean + per-reason " +
      "counts that reconcile with the raw table") {
    val rows = graft.operators.EventAnalytics
      .queries("events_expectations")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Tables.load(spark, sfDir, "events").count()
    assert(rows("has_user") == 0L,
      "a constraint that never fires must still report zero")
    assert(rows("clean") > 0 && rows("not_error_type") > 0 &&
      rows("value_in_range") > 0)
    // clean + rows violating ANY constraint = total (reasons overlap,
    // so the per-reason sum is an upper bound, not a partition)
    assert(rows("clean") < total)
    assert(rows("clean") + rows("not_error_type") +
      rows("value_in_range") >= total)
  }
}
