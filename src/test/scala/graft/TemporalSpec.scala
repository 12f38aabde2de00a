package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  test("every temporal query runs") {
    Temporal.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() >= 0, s"$name failed")
    }
  }

  test("as-of join: click precedes its purchase, per user") {
    val evts = Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "ts").as[(Long, Long, java.sql.Timestamp)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val rows = Temporal.queries("events_asof_attribution")(spark, sfDir)
      .select("purchase_id", "user_id", "last_click_id", "gap_seconds")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pid = r.getAs[Long]("purchase_id")
      if (!r.isNullAt(r.fieldIndex("last_click_id"))) {
        val cid = r.getAs[Long]("last_click_id")
        val (cu, cts) = evts(cid)
        val (pu, pts) = evts(pid)
        assert(cu == pu, "click user != purchase user")
        assert(!cts.after(pts), "click after purchase")
        assert(r.getAs[Long]("gap_seconds") >= 0)
      }
    }
  }

  test("bucketed range join: same result as nested-loop, equi-join plan") {
    val naive = Temporal.queries("events_value_bands")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val bucketed = Temporal.queries("events_value_bands_bucketed")(
      spark, sfDir).collect().map(_.toSeq).toSeq
    assert(bucketed == naive)
    // the whole point: the fact<->interval join must be an equi (hash)
    // join on bucket, not a nested loop over the range predicate. (The
    // 3-row bands x 1-row bounds cross join is nested-loop by design.)
    val plan = Temporal.queries("events_value_bands_bucketed")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin [bucket"), plan.take(2000))
  }

  test("range join bands partition all events") {
    val n = Temporal.queries("events_value_bands")(spark, sfDir)
      .agg(sum("n")).as[Long].collect()(0)
    assert(n == Tables.load(spark, sfDir, "events")
      .filter(col("value") >= 0).count())
  }

  test("native offset pagination matches the window formulation") {
    val native = Temporal.queries("events_page_native")(spark, sfDir)
      .select("event_id").as[Long].collect().toSeq
    val windowed = graft.operators.EventAnalytics.queries("events_page")(
      spark, sfDir).select("event_id").as[Long].collect().toSeq
    assert(native == windowed)
  }

  test("approx stats within tolerance of exact") {
    val approx = Temporal.queries("events_approx_stats")(spark, sfDir)
      .select("event_type", "approx_users", "approx_median")
      .as[(String, Long, Double)].collect()
      .map { case (t, u, m) => t -> (u, m) }.toMap
    val exact = Tables.load(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("u"),
        expr("percentile(value, 0.5)").as("m"))
      .as[(String, Long, Double)].collect()
    exact.foreach { case (t, u, m) =>
      val (au, am) = approx(t)
      assert(math.abs(au - u).toDouble / u < 0.1,
        s"$t approx distinct $au vs $u")
      assert(math.abs(am - m) / math.max(m, 1.0) < 0.25,
        s"$t approx median $am vs $m")
    }
  }
}
