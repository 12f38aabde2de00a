package graft

import org.apache.spark.sql.functions._
import graft.operators.EventAnalytics

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("every event query runs and has a stable schema") {
    EventAnalytics.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("categorize maps the reference's CASE chain, unknown -> other") {
    val got = Seq("purchase", "signup", "click", "view", "error", "weird")
      .toDF("event_type")
      .select(col("event_type"),
        EventAnalytics.categorize(col("event_type")).as("cat"))
      .as[(String, String)].collect().toMap
    assert(got == Map(
      "purchase" -> "commerce", "signup" -> "account",
      "click" -> "engagement", "view" -> "engagement",
      "error" -> "system", "weird" -> "other"))
  }

  test("dashboard totals: distinct counts bounded by row count") {
    val r = EventAnalytics.queries("events_dashboard_totals")(spark, sfDir)
      .collect()(0)
    val n = r.getAs[Long]("n_events")
    assert(n > 0)
    assert(r.getAs[Long]("n_users") <= n)
    assert(r.getAs[Long]("n_types") <= 5)
  }

  test("pct_by_type sums to 100") {
    val pcts = EventAnalytics.queries("events_pct_by_type")(spark, sfDir)
      .select("pct").as[Double].collect()
    assert(math.abs(pcts.sum - 100.0) < 1e-9)
  }

  test("per-type counts partition the total (property A2 vs A1)") {
    val total = Tables.load(spark, sfDir, "events").count()
    val byType = EventAnalytics.queries("events_by_type")(spark, sfDir)
      .agg(sum("n")).as[Long].collect()(0)
    assert(byType == total)
  }

  test("top_users is a prefix of the full ordered aggregation") {
    val top = EventAnalytics.queries("events_top_users")(spark, sfDir)
      .select("user_id").as[Long].collect()
    assert(top.length == 10)
    assert(top.distinct.length == 10)
  }

  test("page 2 rows 101-200 are disjoint from recent top-20") {
    val page = EventAnalytics.queries("events_page")(spark, sfDir)
      .select("event_id").as[Long].collect().toSet
    val recent = EventAnalytics.queries("events_recent")(spark, sfDir)
      .select("event_id").as[Long].collect().toSet
    assert(page.intersect(recent).isEmpty)
  }

  test("keyed (cursor) pagination returns exactly the window-defined " +
      "page 2, with NO Window and NO global Sort in the plan — every " +
      "step a distributed top-k") {
    val keyed = EventAnalytics.queries("events_page_keyed")(spark, sfDir)
    val viaWindow = EventAnalytics.queries("events_page")(spark, sfDir)
      .select("event_id").as[Long].collect().toSet
    val got = keyed.select("event_id").as[Long].collect().toSet
    assert(got == viaWindow,
      s"cursor page != offset page: ${got.size} vs ${viaWindow.size}")
    val plan = keyed.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"keyed pagination must not use a window:\n${plan.take(1500)}")
    assert(plan.contains("TakeOrderedAndProject"),
      s"page fetch should be a distributed top-k:\n${plan.take(1500)}")
    // the page-2 fetch is a filter + top-k, never a full Sort node
    // (TakeOrderedAndProject heaps per partition, then merges k rows)
    assert(!plan.split('\n').exists(l =>
      l.trim.startsWith("Sort ") || l.trim.startsWith("+- Sort ")),
      s"global sort leaked into keyed pagination:\n${plan.take(1500)}")
  }

  test("sessions: n_sessions between 1 and n_events per user") {
    val rows = EventAnalytics.queries("events_sessions")(spark, sfDir)
      .select("n_events", "n_sessions").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (ne, ns) =>
      assert(ns >= 1 && ns <= ne, s"bad session count ($ne, $ns)")
    }
  }

  test("json extraction pulls k from props for all rows") {
    val n = Tables.load(spark, sfDir, "events")
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .filter(col("k").isNotNull).count()
    assert(n == Tables.load(spark, sfDir, "events").count())
  }

  test("funnel: ordering guard bites — not every viewer converts") {
    val rows = EventAnalytics.queries("events_funnel")(spark, sfDir)
      .select("reached", "n_users").as[(Int, Long)].collect().toMap
    assert(rows.keySet.subsetOf(Set(1, 2, 3)))
    // the windowed fixture must produce drop-off (multiple levels);
    // a single all-reached-3 row would mean the guard never fired
    assert(rows.size >= 2, s"funnel degenerate: $rows")
    // histogram covers exactly the users with a view in the window
    val viewers = Tables.load(spark, sfDir, "events")
      .filter(col("ts") < lit("2024-01-03").cast("timestamp") &&
        col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(rows.values.sum == viewers)
  }

  test("gapfill: complete contiguous hour grid, zeros for empty hours, " +
      "non-zero rows equal the plain hourly counts") {
    val rows = EventAnalytics.queries("events_hourly_gapfill")(spark, sfDir)
      .select("hour", "n").as[(String, Long)].collect()
    val hourly = EventAnalytics.queries("events_hourly")(spark, sfDir)
      .select("hour", "n").as[(String, Long)].collect().toMap
    // every observed hour keeps its count; the rest are exact zeros
    rows.foreach { case (h, n) => assert(n == hourly.getOrElse(h, 0L)) }
    assert(rows.map(_._2).count(_ == 0L) ==
      rows.length - hourly.size, "zero fill mismatch")
    assert(rows.length > hourly.size, "fixture has no empty hours to fill")
    // grid is contiguous: row count == hours between bounds inclusive
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm")
    def t(s: String) = java.time.LocalDateTime.parse(s, fmt)
    val span = java.time.Duration
      .between(t(rows.head._1), t(rows.last._1)).toHours + 1
    assert(rows.length == span)
  }

  test("hourly anomalies: all flagged hours are >= 2 sigma, none missed") {
    val flagged = EventAnalytics.queries("events_hourly_anomalies")(
      spark, sfDir)
      .select("hour", "cnt", "z").as[(String, Long, Double)].collect()
    assert(flagged.nonEmpty, "no anomalous hours in fixture")
    flagged.foreach { case (_, _, z) => assert(math.abs(z) >= 2.0) }
    // independent moment check: recompute mean/std from hourly counts
    val counts = Tables.load(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts"))).count()
      .select("count").as[Long].collect()
    val n = counts.length.toDouble
    val mean = counts.sum / n
    val std = math.sqrt(
      counts.map(c => (c - mean) * (c - mean)).sum / (n - 1))
    val expected = counts.count(c => math.abs((c - mean) / std) >= 2.0)
    assert(flagged.length == expected)
  }

  test("retention cohorts: offsets anchored at 0, activity decays") {
    val rows = EventAnalytics.queries("events_retention_cohorts")(
      spark, sfDir)
      .select("cohort_week", "week_no", "n_active")
      .as[(String, Int, Long)].collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (c, g) =>
      // week 0 is the cohort definition: always present, and no week
      // can exceed it (a user must act in their own first week)
      val w0 = g.find(_._2 == 0)
      assert(w0.isDefined, s"cohort $c missing week 0")
      assert(g.forall(_._3 <= w0.get._3), s"cohort $c grows: $g")
      assert(g.forall(_._2 >= 0))
    }
    // the rare-action metric must actually decay somewhere
    assert(rows.exists { case (c, _, n) =>
      n < byCohort(c).find(_._2 == 0).get._3
    }, s"flat retention: ${rows.toSeq}")
  }
}
