package graft.operators

import graft.{Ql, Tables}
import graft.Ql.Q
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-parity event analytics (SURVEY.md §2.2–§2.4, milestone M1).
  *
  * Re-expresses every batch query of the reference's api/streaming services
  * over the fixture `events` table (`event_id, ts, user_id, event_type,
  * value, props`): global multi-distinct dashboard totals
  * (`services/api-service/data_service.py:127-132`), group-by counts with
  * in-plan percentage-of-total (fixing the reference's driver-side Python
  * math, `data_service.py:296-303`), hourly time-series bucketing
  * (`data_service.py:336-356`), top-k entities with distinct counts and
  * deterministic type sets (`data_service.py:358-406`), filter banks
  * (`streaming-service/api.py:263-276`), JSONPath payload extraction
  * (`streaming-service/event_processor.py:73-81`), the 15-way category
  * CASE (`event_processor.py:94-110`), quality flags (`:112-132`), ordered
  * pagination done in-plan via row_number (`streaming-service/api.py:589-592`
  * slices in Python), and the declared-but-unused stat surface
  * (avg/stddev/percentile, `data_service.py:7-11`).
  *
  * Scale notes (100 TB): every aggregation here is a single hash-aggregate
  * shuffle on its group key with map-side partial aggregation; top-k uses
  * `TakeOrderedAndProject` (per-partition heaps, no global sort); the only
  * intentionally-global window is the pagination query, which at cluster
  * scale would be served by key-range pagination instead (documented on the
  * query). Time filters and projected columns push down to the parquet scan.
  */
object EventAnalytics {
  import Ql.{dec, dsum}

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** P11 time-window cutoff — fixed literal, never current_timestamp(),
    * so the DuckDB oracle sees the identical predicate. */
  private val cutoff = "2024-01-15 00:00:00"

  /** P6: the reference's event-category CASE chain
    * (`event_processor.py:94-110`), mapped onto the fixture event types. */
  def categorize(c: Column): Column =
    when(c === "purchase", "commerce")
      .when(c === "signup", "account")
      .when(c.isin("click", "view"), "engagement")
      .when(c === "error", "system")
      .otherwise("other")

  private val categorizeSql =
    """CASE WHEN event_type = 'purchase' THEN 'commerce'
      |     WHEN event_type = 'signup' THEN 'account'
      |     WHEN event_type IN ('click','view') THEN 'engagement'
      |     WHEN event_type = 'error' THEN 'system'
      |     ELSE 'other' END""".stripMargin

  val queries: Map[String, Q] = Map(
    // A1 + P11: one-pass global multi-distinct dashboard aggregate.
    "events_dashboard_totals" -> ((s, dir) => {
      ev(s, dir)
        .filter(col("ts") >= lit(cutoff).cast("timestamp"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("event_type")).as("n_types"),
          dsum(col("value")).as("sum_value"))
    }),

    // A2: counts by type, ordered with tie-break.
    "events_by_type" -> ((s, dir) => {
      ev(s, dir).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("event_type"))
    }),

    // P6 + A3: category mapping then counts.
    "events_by_category" -> ((s, dir) => {
      ev(s, dir)
        .select(categorize(col("event_type")).as("event_category"))
        .groupBy(col("event_category"))
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("event_category"))
    }),

    // A4 in-plan: percentage-of-total via window over the aggregate (the
    // reference computes this driver-side in Python). Single shuffle for
    // the groupBy; the window input is |distinct types| rows — tiny.
    "events_pct_by_type" -> ((s, dir) => {
      val counts = ev(s, dir).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
      counts
        .withColumn("pct",
          lit(100.0) * col("n") / sum(col("n")).over(Window.partitionBy()))
        .orderBy(desc("n"), asc("event_type"))
    }),

    // A5: hourly tumbling buckets via date_trunc (batch form; streaming
    // analogue lives in graft.streaming). Bucket surfaced as a string so
    // both engines hash identical values (fixture ts is ns-precision,
    // Spark reads µs).
    "events_hourly" -> ((s, dir) => {
      ev(s, dir)
        .groupBy(date_format(date_trunc("hour", col("ts")),
          "yyyy-MM-dd HH:00").as("hour"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(asc("hour"))
    }),

    // A5 sliding variant: 2-hour windows advancing hourly — each event
    // lands in exactly two windows (epoch-aligned, matching the oracle's
    // explicit two-window unnest). Same single-shuffle aggregation shape
    // as the tumbling form.
    "events_sliding_hours" -> ((s, dir) => {
      ev(s, dir)
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:00").as("w_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(asc("w_start"), asc("event_type"))
    }),

    // A6/A7: top-k users with distinct counts + deterministic type set
    // (sorted, comma-joined — the reference dedups in Python, A8).
    // Plans as partial-agg + TakeOrderedAndProject: no global sort.
    "events_top_users" -> ((s, dir) => {
      ev(s, dir).groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"),
          dsum(col("value")).as("sum_value"),
          array_join(sort_array(collect_set(col("event_type"))), ",")
            .as("types"))
        .orderBy(desc("n_events"), asc("user_id"))
        .limit(10)
    }),

    // A9: distinct values for filter dropdowns.
    "events_distinct_types" -> ((s, dir) => {
      ev(s, dir).select(col("event_type")).distinct()
        .orderBy(asc("event_type"))
    }),

    // O2 re-expressed in-plan: page 2 (rows 101–200) of the recency feed
    // via row_number. NOTE single-partition window — correct here, but at
    // cluster scale pagination is served by key-range predicates
    // (ts < last_seen) instead of a global window: see
    // `events_page_keyed` below for the 100 TB shape.
    "events_page" -> ((s, dir) => {
      val w = Window.orderBy(desc("ts"), asc("event_id"))
      ev(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), row_number().over(w).as("rn"))
        .filter(col("rn").between(101, 200))
        .orderBy(asc("rn"))
    }),

    // O2 at cluster scale — KEY-RANGE (cursor) pagination, the answer
    // to the reference's OFFSET pagination (its API pages a recency
    // feed by offset, which a distributed engine can only serve with
    // a global sort or window). Here page 2 is "the 100 rows after
    // the cursor", where the cursor is the last (ts, event_id) of
    // page 1: every step is a distributed top-k
    // (TakeOrderedAndProject) — per-partition heaps, no
    // single-partition Sort, no Window — and the cursor predicate is
    // an ordinary pushable filter, so deep pages cost the same as
    // page 1 instead of sorting rows 1..offset. In a real serving
    // path the client echoes the cursor back; computing it in-plan
    // here keeps the query self-contained AND oracle-checkable.
    "events_page_keyed" -> ((s, dir) => {
      val e = ev(s, dir)
      // the cursor: last row of page 1 under (ts DESC, event_id ASC)
      // = first row of the page-1 set under the REVERSED order
      val cursor = e
        .orderBy(desc("ts"), asc("event_id")).limit(100)
        .orderBy(asc("ts"), desc("event_id")).limit(1)
        .select(col("ts").as("c_ts"), col("event_id").as("c_id"))
      e.crossJoin(broadcast(cursor)) // 1 row: a broadcast constant
        .filter(col("ts") < col("c_ts") ||
          (col("ts") === col("c_ts") && col("event_id") > col("c_id")))
        .orderBy(desc("ts"), asc("event_id"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
        .limit(100)
    }),

    // O1: recent-events feed, deterministic tie-break on event_id.
    "events_recent" -> ((s, dir) => {
      ev(s, dir)
        .orderBy(desc("ts"), asc("event_id"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
        .limit(20)
    }),

    // P10: the reference's optional equality/range filter bank, composed
    // as conjunctive pushed-down predicates.
    "events_filtered" -> ((s, dir) => {
      ev(s, dir)
        .filter(col("event_type") === "purchase" && col("value") > 100.0 &&
          col("ts") >= lit(cutoff).cast("timestamp"))
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy(asc("event_id"))
    }),

    // P1/P4: JSONPath extraction from the props payload (the reference's
    // get_json_object over payload_json), aggregated per extracted key.
    "events_json_extract" -> ((s, dir) => {
      ev(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .filter(col("k").isNotNull)
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy(asc("k_mod"))
    }),

    // P7/P8: data-quality flags + per-type validity counts.
    "events_quality" -> ((s, dir) => {
      val valid = col("event_id").isNotNull && col("user_id").isNotNull &&
        col("ts").isNotNull
      ev(s, dir).groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(valid, 1L).otherwise(0L)).as("n_valid"),
          sum(when(col("props").isNotNull && length(col("props")) > 2, 1L)
            .otherwise(0L)).as("n_with_props"))
        .orderBy(asc("event_type"))
    }),

    // Declared data-quality expectations (operators/Expectations):
    // named constraints gate the feed into clean/quarantine, and the
    // quarantine side reports violations BY REASON — including a
    // constraint that never fires (has_user must report 0, which is
    // what proves the zero-fill join). The oracle recomputes each
    // reason with IS NOT TRUE (NULL = violation, the quarantine gate's
    // semantics) straight from the base table.
    "events_expectations" -> ((s, dir) => {
      import s.implicits._
      val constraints = Seq(
        "has_user" -> col("user_id").isNotNull,
        "not_error_type" -> (col("event_type") =!= "error"),
        "value_in_range" -> (col("value") <= 90.0))
      val (clean, quar) = Expectations.split(ev(s, dir), constraints)
      val perReason = quar
        .select(explode(col("violations")).as("metric"))
        .groupBy("metric").agg(count(lit(1)).as("n"))
      val zeroFilled = constraints.map(_._1).toDF("metric")
        .join(perReason, Seq("metric"), "left")
        .select(col("metric"), coalesce(col("n"), lit(0L)).as("n"))
      clean.agg(count(lit(1)).as("n"))
        .select(lit("clean").as("metric"), col("n"))
        .unionByName(zeroFilled)
        .orderBy(asc("metric"))
    }),

    // A11: the reference's declared-but-never-called stat surface
    // (avg/stddev/min/max/sum), made exact for the oracle: decimal sums,
    // variance from exact moments => bit-identical doubles both engines.
    "events_value_stats" -> ((s, dir) => {
      val n = count(lit(1))
      val sx = sum(dec(col("value"))).cast("double")
      val sxx = sum(dec(col("value")) * dec(col("value"))).cast("double")
      ev(s, dir).groupBy(col("event_type"))
        .agg(
          n.as("n"),
          min(col("value")).as("min_v"),
          max(col("value")).as("max_v"),
          (sx / n).as("avg_v"),
          sqrt((sxx - sx * sx / n) / (n - lit(1))).as("stddev_v"))
        .orderBy(asc("event_type"))
    }),

    // Sessionization (lag window): per-user session count with a 30-min
    // inactivity gap. Window partitioned by user_id — scales out.
    "events_sessions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(asc("ts"), asc("event_id"))
      ev(s, dir)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("new_sess")).as("n_sessions"))
        .orderBy(asc("user_id"))
    }),

    // ORDERED step funnel view → click → purchase: each step's
    // timestamp must come strictly AFTER the previous step's first
    // occurrence (a click before the first view does not count) — the
    // sequential semantics a naive per-type distinct count gets wrong.
    // Scoped to the opening 48 h (the fixture is dense enough that an
    // unbounded window trivially completes every user's funnel —
    // scoping is what makes the ordering guard observable, and is also
    // the realistic shape: funnels are always measured over a window).
    // Three per-user min-aggregations chained by a time guard inside
    // the join filter; t3 ⊆ t2 ⊆ t1 by construction, so reached =
    // 1 + [t2] + [t3]. All comparisons on unix_micros (the engines'
    // shared µs truncation of the nanos fixture). Per-user joins on the
    // aggregated (≤ |users|) frames — every stage is a keyed shuffle
    // that scales out.
    "events_funnel" -> ((s, dir) => {
      val e = ev(s, dir)
        .filter(col("ts") < lit("2024-01-03").cast("timestamp"))
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val t1 = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
      val t2 = e.filter(col("event_type") === "click")
        .join(t1, Seq("user_id"))
        .filter(col("us") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("us")).as("t2"))
      val t3 = e.filter(col("event_type") === "purchase")
        .join(t2, Seq("user_id"))
        .filter(col("us") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
      t1.join(t2, Seq("user_id"), "left")
        .join(t3, Seq("user_id"), "left")
        .selectExpr("user_id",
          "1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END " +
            "+ CASE WHEN t3 IS NULL THEN 0 ELSE 1 END AS reached")
        .groupBy(col("reached"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(asc("reached"))
    }),

    // Gap-filled hourly series (resampling/densification): the hourly
    // counts LEFT-joined onto the complete hour grid between the
    // data's bounds, zeros filled in — time-series consumers
    // (dashboards, anomaly baselines, forecasting) need every bucket
    // present, and a plain GROUP BY silently omits empty hours (the
    // anomaly query above deliberately scores observed hours only;
    // this is the densified complement). The grid derives in-plan from
    // a 1-row bounds aggregate exploded through sequence() — no
    // calendar table needed, and the grid side is broadcast-sized at
    // any data scale.
    "events_hourly_gapfill" -> ((s, dir) => {
      val h = ev(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"))
      val grid = h.agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
        .selectExpr("explode(sequence(lo, hi, interval 1 hour)) AS hr")
      grid.join(h, Seq("hr"), "left")
        .selectExpr("date_format(hr, 'yyyy-MM-dd HH:00') AS hour",
          "coalesce(n, CAST(0 AS BIGINT)) AS n")
        .orderBy(asc("hour"))
    }),

    // MapType round trip: per-user map(event_type → count) built
    // IN-PLAN (map_from_entries over a sorted entry list) and exploded
    // back to rows — the complex-type surface (maps as first-class
    // column values) the rest of the inventory never touches. The
    // round trip is semantically the identity on the underlying
    // groupBy, which is exactly what makes it oracle-able: the DuckDB
    // twin is the plain aggregation, so any entry lost or reordered by
    // the map build/unbuild shows up as a hash mismatch.
    "events_type_map_roundtrip" -> ((s, dir) => {
      ev(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("user_id"))
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("event_type"), col("cnt"))))).as("m"))
        .select(col("user_id"), explode(col("m")))
        .withColumnRenamed("key", "event_type")
        .withColumnRenamed("value", "cnt")
        .orderBy(asc("user_id"), asc("event_type"))
    }),

    // Hourly anomaly detection: hours whose event count sits ≥ 2σ from
    // the corpus mean — the ops-dashboard "traffic spike/outage" query.
    // Variance comes from the INTEGER moment sums (n, Σcnt, Σcnt²), so
    // both engines build z from identical operand bits; the one
    // float-accumulation-order hazard (a naive stddev_samp aggregate)
    // never appears. The moments are one extra 1-row aggregate
    // broadcast over the hourly counts — at any scale the stats side
    // is a scalar, the hourly side one keyed shuffle.
    "events_hourly_anomalies" -> ((s, dir) => {
      val h = ev(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("cnt"))
      val stats = h.agg(count(lit(1)).as("n"), sum(col("cnt")).as("s1"),
        sum(col("cnt") * col("cnt")).as("s2"))
      h.crossJoin(broadcast(stats))
        .selectExpr("date_format(hr, 'yyyy-MM-dd HH:00') AS hour", "cnt",
          "(cnt - CAST(s1 AS DOUBLE)/n) / " +
            "sqrt((s2 - CAST(s1 AS DOUBLE)*s1/n)/(n-1)) AS z")
        .filter(abs(col("z")) >= 2.0)
        .orderBy(asc("hour"))
    }),

    // Retention cohorts over a RARE action (high-value purchases):
    // users grouped by the ISO week of their first such action, counted
    // per activity-week offset — the weekly retention triangle every
    // analytics stack draws. The value filter matters twice: it is what
    // spreads users across cohorts and decays the curve on this dense
    // fixture (first-seen-week of ANY event puts everyone in cohort 0
    // at 100% forever), and it is the realistic metric (retention is
    // measured on a conversion action, not on raw traffic). Week
    // arithmetic stays in integer µs (epoch difference of date_trunc'd
    // weeks ÷ a week of µs), the one formulation both engines compute
    // identically. Two keyed aggregations + one join on user_id.
    "events_retention_cohorts" -> ((s, dir) => {
      val e = ev(s, dir)
        .filter(col("event_type") === "purchase" && col("value") > 95.0)
      val firstSeen = e.groupBy(col("user_id"))
        .agg(min(unix_micros(date_trunc("week", col("ts"))))
          .as("cohort_us"))
      val weekly = e.select(col("user_id"),
        unix_micros(date_trunc("week", col("ts"))).as("wk_us"))
        .distinct()
      weekly.join(firstSeen, Seq("user_id"))
        .selectExpr("user_id",
          "CAST(cohort_us AS BIGINT) AS cohort_us",
          "CAST((wk_us - cohort_us) DIV 604800000000 AS INT) AS week_no")
        .groupBy(col("cohort_us"), col("week_no"))
        .agg(count(lit(1)).as("n_active"))
        .selectExpr(
          "date_format(timestamp_micros(cohort_us), 'yyyy-MM-dd') " +
            "AS cohort_week",
          "week_no", "n_active")
        .orderBy(asc("cohort_week"), asc("week_no"))
    }),

    // Semi-structured props through Spark 4's VariantType: parse_json
    // ONCE into a variant column (an efficient binary encoding that
    // shreds on access), then variant_get typed extraction — the
    // engine-native path for schema-on-read JSON, replacing per-access
    // get_json_object string re-parsing. The aggregate keeps the avg
    // deterministic (exact BIGINT sum, one division).
    "events_props_variant" -> ((s, dir) => {
      ev(s, dir)
        .select(col("event_type"),
          parse_json(col("props")).as("v"))
        .select(col("event_type"),
          expr("variant_get(v, '$.k', 'bigint')").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          (sum(col("k")).cast("double") / count(lit(1))).as("avg_k"),
          max(col("k")).as("max_k"))
        .orderBy(asc("event_type"))
    }))

  val oracleSql: Map[String, String] = Map(
    "events_props_variant" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS DOUBLE)
        |    / count(*) AS avg_k,
        |  max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "events_dashboard_totals" ->
      s"""SELECT count(*) AS n_events,
         |  count(DISTINCT user_id) AS n_users,
         |  count(DISTINCT event_type) AS n_types,
         |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
         |FROM events WHERE ts >= TIMESTAMP '$cutoff'""".stripMargin,
    "events_by_type" ->
      """SELECT event_type, count(*) AS n FROM events
        |GROUP BY event_type ORDER BY n DESC, event_type""".stripMargin,
    "events_by_category" ->
      s"""SELECT $categorizeSql AS event_category, count(*) AS n
         |FROM events GROUP BY 1 ORDER BY n DESC, event_category""".stripMargin,
    "events_pct_by_type" ->
      """SELECT event_type, n, 100.0 * n / sum(n) OVER () AS pct
        |FROM (SELECT event_type, count(*) AS n FROM events GROUP BY 1)
        |ORDER BY n DESC, event_type""".stripMargin,
    "events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY hour""".stripMargin,
    "events_sliding_hours" ->
      """SELECT strftime(ws, '%Y-%m-%d %H:00') AS w_start, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM (SELECT event_type, value,
        |    unnest([date_trunc('hour', ts),
        |            date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws
        |  FROM events)
        |GROUP BY ws, event_type ORDER BY w_start, event_type""".stripMargin,
    "events_top_users" ->
      """SELECT user_id, count(*) AS n_events,
        |  count(DISTINCT event_type) AS n_types,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
        |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
        |FROM events GROUP BY user_id
        |ORDER BY n_events DESC, user_id LIMIT 10""".stripMargin,
    "events_distinct_types" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "events_page" ->
      """SELECT * FROM (
        |  SELECT event_id, user_id, event_type, value,
        |    row_number() OVER (ORDER BY ts DESC, event_id) AS rn
        |  FROM events) WHERE rn BETWEEN 101 AND 200 ORDER BY rn""".stripMargin,
    "events_page_keyed" ->
      """WITH cur AS (
        |  SELECT ts AS c_ts, event_id AS c_id FROM (
        |    SELECT ts, event_id FROM events
        |    ORDER BY ts DESC, event_id LIMIT 100)
        |  ORDER BY ts ASC, event_id DESC LIMIT 1)
        |SELECT event_id, user_id, event_type, value
        |FROM events, cur
        |WHERE ts < c_ts OR (ts = c_ts AND event_id > c_id)
        |ORDER BY ts DESC, event_id LIMIT 100""".stripMargin,
    "events_recent" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |ORDER BY ts DESC, event_id LIMIT 20""".stripMargin,
    "events_filtered" ->
      s"""SELECT event_id, user_id, value FROM events
         |WHERE event_type = 'purchase' AND value > 100.0
         |  AND ts >= TIMESTAMP '$cutoff'
         |ORDER BY event_id""".stripMargin,
    "events_json_extract" ->
      """SELECT k % 10 AS k_mod, count(*) AS n, min(k) AS min_k,
        |  max(k) AS max_k
        |FROM (SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |      FROM events) WHERE k IS NOT NULL
        |GROUP BY 1 ORDER BY k_mod""".stripMargin,
    "events_expectations" ->
      """SELECT 'clean' AS metric, count(*) AS n FROM events
        |  WHERE (user_id IS NOT NULL) IS TRUE
        |    AND (event_type <> 'error') IS TRUE
        |    AND (value <= 90.0) IS TRUE
        |UNION ALL
        |SELECT 'has_user', count(*) FROM events
        |  WHERE (user_id IS NOT NULL) IS NOT TRUE
        |UNION ALL
        |SELECT 'not_error_type', count(*) FROM events
        |  WHERE (event_type <> 'error') IS NOT TRUE
        |UNION ALL
        |SELECT 'value_in_range', count(*) FROM events
        |  WHERE (value <= 90.0) IS NOT TRUE
        |ORDER BY metric""".stripMargin,
    "events_quality" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN event_id IS NOT NULL AND user_id IS NOT NULL
        |           AND ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
        |  CAST(sum(CASE WHEN props IS NOT NULL AND length(props) > 2
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_with_props
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_value_stats" ->
      """SELECT event_type, count(*) AS n, min(value) AS min_v,
        |  max(value) AS max_v,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(*)
        |    AS avg_v,
        |  sqrt((CAST(sum(CAST(value AS DECIMAL(12,2))
        |             * CAST(value AS DECIMAL(12,2))) AS DOUBLE)
        |        - CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
        |          * CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
        |          / count(*)) / (count(*) - 1)) AS stddev_v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_sessions" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(new_sess) AS BIGINT) AS n_sessions
        |FROM (
        |  SELECT user_id,
        |    CASE WHEN prev_us IS NULL
        |         OR epoch_us(ts) - prev_us > 1800 * 1000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM (
        |    SELECT user_id, ts,
        |      lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS prev_us
        |    FROM events))
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "events_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
        |           FROM events
        |           WHERE ts < TIMESTAMP '2024-01-03 00:00:00'),
        |t1 AS (SELECT user_id, min(us) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, min(us) AS t2 FROM e
        |       JOIN t1 ON e.user_id = t1.user_id
        |       WHERE event_type = 'click' AND us > t1
        |       GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, min(us) AS t3 FROM e
        |       JOIN t2 ON e.user_id = t2.user_id
        |       WHERE event_type = 'purchase' AND us > t2
        |       GROUP BY e.user_id)
        |SELECT reached, count(*) AS n_users FROM (
        |  SELECT t1.user_id,
        |    1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
        |      + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END AS reached
        |  FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
        |          LEFT JOIN t3 ON t1.user_id = t3.user_id)
        |GROUP BY reached ORDER BY reached""".stripMargin,
    "events_hourly_gapfill" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS hr, count(*) AS n
        |           FROM events GROUP BY hr),
        |b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM h),
        |g AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
        |        AS hr FROM b)
        |SELECT strftime(g.hr, '%Y-%m-%d %H:00') AS hour,
        |  CAST(coalesce(n, 0) AS BIGINT) AS n
        |FROM g LEFT JOIN h ON g.hr = h.hr
        |ORDER BY hour""".stripMargin,
    // the map build/unbuild is the identity on this aggregation
    "events_type_map_roundtrip" ->
      """SELECT user_id, event_type, count(*) AS cnt
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "events_hourly_anomalies" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS hr, count(*) AS cnt
        |           FROM events GROUP BY hr),
        |s AS (SELECT count(*) AS n, CAST(sum(cnt) AS BIGINT) AS s1,
        |             CAST(sum(cnt*cnt) AS BIGINT) AS s2 FROM h)
        |SELECT strftime(hr, '%Y-%m-%d %H:00') AS hour, cnt,
        |  (cnt - CAST(s1 AS DOUBLE)/n) /
        |    sqrt((s2 - CAST(s1 AS DOUBLE)*s1/n)/(n-1)) AS z
        |FROM h, s
        |WHERE abs((cnt - CAST(s1 AS DOUBLE)/n) /
        |    sqrt((s2 - CAST(s1 AS DOUBLE)*s1/n)/(n-1))) >= 2
        |ORDER BY hour""".stripMargin,
    "events_retention_cohorts" ->
      """WITH hv AS (SELECT user_id, ts FROM events
        |  WHERE event_type = 'purchase' AND value > 95),
        |f AS (SELECT user_id,
        |    min(epoch_us(date_trunc('week', ts))) AS cohort_us
        |  FROM hv GROUP BY user_id),
        |w AS (SELECT DISTINCT user_id,
        |    epoch_us(date_trunc('week', ts)) AS wk_us FROM hv)
        |SELECT strftime(make_timestamp(cohort_us), '%Y-%m-%d')
        |    AS cohort_week,
        |  CAST((wk_us - cohort_us) // 604800000000 AS INT) AS week_no,
        |  count(*) AS n_active
        |FROM w JOIN f ON w.user_id = f.user_id
        |GROUP BY cohort_week, week_no
        |ORDER BY cohort_week, week_no""".stripMargin)
}
