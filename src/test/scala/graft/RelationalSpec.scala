package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("every relational query runs and has a stable schema") {
    Relational.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("flagship star join covers all nations with customers") {
    val df = Relational.queries("star_revenue_by_nation")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length > 0)
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("q1 aggregates: sum_disc_price <= sum_base_price") {
    Relational.queries("q1_pricing_summary")(spark, sfDir).collect()
      .foreach { r =>
        assert(r.getAs[Double]("sum_disc_price") <=
          r.getAs[Double]("sum_base_price"))
        assert(r.getAs[Double]("sum_charge") >=
          r.getAs[Double]("sum_disc_price"))
      }
  }

  test("salted equi-join: identical result set, salt in the join keys") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val plain = li.join(ord, Seq("l_orderkey"))
      .groupBy("o_orderstatus").count()
      .as[(String, Long)].collect().toMap
    val salted = Relational.saltedEquiJoin(
      li, ord, "l_orderkey", "l_partkey", salts = 8)
      .groupBy("o_orderstatus").count()
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
    val plan = Relational.saltedEquiJoin(
      li, ord, "l_orderkey", "l_partkey", salts = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_salt"), plan.take(1500))
  }

  test("semi + anti join partition the customer table (1996 scope)") {
    val all = Tables.load(spark, sfDir, "customer").count()
    val o96 = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val with96 = Tables.load(spark, sfDir, "customer")
      .join(o96, col("c_custkey") === col("o_custkey"), "left_semi").count()
    val without = Relational.queries("anti_customers_inactive")(spark, sfDir)
      .count()
    assert(with96 + without == all)
    assert(without > 0, "anti join must verify non-empty output")
  }

  test("set ops: retained ∪ churned = active-1995") {
    val retained = Relational.queries("setop_retained_customers")(spark, sfDir)
      .as[Long].collect().toSet
    val churned = Relational.queries("setop_churned_customers")(spark, sfDir)
      .as[Long].collect().toSet
    assert(retained.intersect(churned).isEmpty)
    val active95 = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select("o_custkey").distinct().as[Long].collect().toSet
    assert(retained.union(churned) == active95)
  }

  test("window top-3 per customer: rn within bounds, ordered by price") {
    val rows = Relational.queries("window_top_orders_per_cust")(spark, sfDir)
      .select("o_custkey", "rn", "o_totalprice")
      .as[(Long, Int, Double)].collect()
    rows.groupBy(_._1).values.foreach { grp =>
      val sorted = grp.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to grp.length))
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sortBy(-_).toSeq)
    }
  }

  test("running total peaks at the customer's total order value") {
    val rows = Relational.queries("window_running_total")(spark, sfDir)
      .select("o_custkey", "running_total").as[(Long, Double)].collect()
    val totals = Tables.load(spark, sfDir, "orders")
      .groupBy("o_custkey").agg(sum("o_totalprice").as("t"))
      .as[(Long, Double)].collect().toMap
    rows.groupBy(_._1).foreach { case (cust, grp) =>
      assert(grp.forall(_._2 > 0))
      assert(math.abs(grp.map(_._2).max - totals(cust)) < 1e-4,
        s"customer $cust running-total max != order total")
    }
  }

  test("rollup: grand total row equals table count") {
    val df = Relational.queries("rollup_returnflag_status")(spark, sfDir)
    val grand = df.filter(col("gid") === 3).select("n").as[Long].collect()
    assert(grand.length == 1)
    assert(grand(0) == Tables.load(spark, sfDir, "lineitem").count())
  }

  test("cube has all four grouping levels") {
    val gids = Relational.queries("cube_status_priority")(spark, sfDir)
      .select("gid").distinct().as[Long].collect().toSet
    assert(gids == Set(0L, 1L, 2L, 3L))
  }

  test("left outer: every customer preserved incl. zero counts; " +
      "broadcast lands on the non-preserved side") {
    val df = Relational.queries("outer_customer_order_counts")(spark, sfDir)
    val rows = df.collect()
    val all = Tables.load(spark, sfDir, "customer").count()
    assert(rows.length == all, "left outer must preserve every customer")
    assert(rows.exists(_.getAs[Long]("n_orders_1996") == 0L),
      "must include zero-order customers")
    // broadcast is legal for LEFT OUTER only on the right (non-
    // preserved) side — which is the pre-aggregated one we shrank.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftOuter"),
      s"expected broadcast left-outer join:\n${plan.take(2000)}")
  }

  test("q13: join-condition filter preserves customers a WHERE would drop") {
    val rows = Relational.queries("q13_customer_distribution")(spark, sfDir)
      .collect()
    val all = Tables.load(spark, sfDir, "customer").count()
    // the c_count histogram must cover every customer...
    assert(rows.map(_.getAs[Long]("custdist")).sum == all)
    // ...including those whose every order was filtered INSIDE the join
    // condition (count 0) — the semantics a WHERE cannot express. The
    // sf fixture has customers with no orders and ~1/5 of orders
    // URGENT, so the zero bucket is non-empty.
    assert(rows.exists(r => r.getAs[Long]("c_count") == 0L &&
      r.getAs[Long]("custdist") > 0L), "missing the zero-order bucket")
    // and strictly more zero-count customers than a plain WHERE-after-
    // join would leave: compare against the inner-join histogram
    val inner = Tables.load(spark, sfDir, "customer")
      .join(Tables.load(spark, sfDir, "orders"),
        col("c_custkey") === col("o_custkey") &&
          !col("o_orderpriority").like("%URGENT%") &&
          col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      .select("c_custkey").distinct().count()
    val zeroBucket = rows.find(_.getAs[Long]("c_count") == 0L).get
      .getAs[Long]("custdist")
    assert(zeroBucket == all - inner)
  }

  test("q19: side-local residue of the OR-of-ANDs pushes into both scans") {
    val df = Relational.queries("q19_discounted_revenue")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // each scan gets its own disjunctive residue as a pushed filter
    // (Or over brand/size on part; Or over quantity bands on lineitem)
    val pushed = "PushedFilters: \\[[^\\]]*".r.findAllIn(plan).toList
    assert(pushed.exists(f => f.contains("Or(") && f.contains("p_brand")),
      s"no disjunctive pushdown on part:\n${pushed.mkString("\n")}")
    assert(pushed.exists(f => f.contains("Or(") && f.contains("l_quantity")),
      s"no disjunctive pushdown on lineitem:\n${pushed.mkString("\n")}")
    assert(plan.contains("BroadcastHashJoin"))
    // one row, both aggregates non-trivial on the fixture
    val r = df.collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_items") > 0)
    assert(r(0).getAs[Double]("revenue") > 0.0)
  }

  test("except-all surplus equals the per-customer count difference") {
    val rows = Relational.queries("setop_order_decline_except_all")(
      spark, sfDir)
      .select("o_custkey", "n_decline", "n_matched")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    def counts(y: Int): Map[Long, Long] =
      Tables.load(spark, sfDir, "orders")
        .filter(col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp") &&
          col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
        .groupBy("o_custkey").count()
        .as[(Long, Long)].collect().toMap
    val (c95, c96) = (counts(1995), counts(1996))
    // EXACT multiset identity: surplus = c95 - min(c95, c96) where > 0
    val expected = c95.flatMap { case (k, n95) =>
      val m = math.min(n95, c96.getOrElse(k, 0L))
      if (n95 - m > 0) Some(k -> ((n95 - m), m)) else None
    }
    assert(rows.map(r => r._1 -> ((r._2, r._3))).toMap == expected)
  }

  test("null-safe join labels every order incl. the NULL key group; " +
      "plain = would drop them") {
    val rows = Relational.queries("join_null_safe_status")(spark, sfDir)
      .select("label", "n").as[(String, Long)].collect().toMap
    val orders = Tables.load(spark, sfDir, "orders")
    // <=> matches the NULL key: 'open' = the nulled-out 'O' orders
    assert(rows("open") == orders.filter(col("o_orderstatus") === "O").count())
    assert(rows.values.sum == orders.count())
    // the equality-join form drops the whole NULL group
    val dim = spark.sql("SELECT * FROM VALUES " +
      "(CAST(NULL AS STRING), 'open'), ('F', 'final'), ('P', 'pending')" +
      " AS t(k, label)")
    val eqJoin = orders.selectExpr("nullif(o_orderstatus, 'O') AS k")
      .join(dim, "k").count()
    assert(eqJoin == rows.values.sum - rows("open"))
  }

  test("shuffle_hash hint plans as ShuffledHashJoin") {
    val df = Relational.queries("hint_shuffle_hash_revenue")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"hint ignored:\n${plan.take(1500)}")
  }

  test("q22: counts exactly the above-average customers with no orders") {
    val rows = Relational.queries("q22_idle_customers")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty, "no idle high-balance customers in fixture")
    val total = rows.map(_.getAs[Long]("numcust")).sum
    // independent reconstruction: above-decimal-avg balance, anti-join
    val cust = Tables.load(spark, sfDir, "customer")
    val avg = cust.filter(col("c_acctbal") > 0.0)
      .agg(sum(col("c_acctbal").cast("decimal(12,2)")).cast("double")
        / count(lit(1))).head.getDouble(0)
    val expected = cust.filter(col("c_acctbal") > avg)
      .join(Tables.load(spark, sfDir, "orders")
          .filter(col("o_orderdate") >=
            lit("1999-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    assert(total == expected)
  }

  test("right outer: every part preserved; count skips null-extended rows") {
    val rows = Relational.queries("outer_right_parts_sold")(spark, sfDir)
      .collect()
    val parts = Tables.load(spark, sfDir, "part").count()
    assert(rows.length == parts, "right outer must preserve every part")
    val unsold = rows.filter(_.getAs[Long]("n_sold") == 0L)
    assert(unsold.nonEmpty, "fixture must contain unsold parts in the window")
    unsold.foreach(r => assert(r.getAs[Double]("qty_sold") == 0.0))
  }

  test("full outer matrix: activity labels match the null sides; " +
      "plans as sort-merge (broadcast illegal for full outer)") {
    val df = Relational.queries("outer_full_year_matrix")(spark, sfDir)
    val rows = df.collect()
    rows.foreach { r =>
      val act = r.getAs[String]("activity")
      if (r.getAs[Long]("n_1995") == 0L) assert(act == "joined")
      else if (r.getAs[Long]("n_1996") == 0L) assert(act == "churned")
      else assert(act == "retained")
    }
    assert(rows.exists(_.getAs[String]("activity") == "joined"))
    assert(rows.exists(_.getAs[String]("activity") == "churned"))
    // agreement with the EXCEPT formulation of churn
    val churned = Relational.queries("setop_churned_customers")(spark, sfDir)
      .count()
    assert(rows.count(_.getAs[String]("activity") == "churned") == churned)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), s"plan:\n${plan.take(2000)}")
    assert(plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"full outer must not broadcast:\n${plan.take(2000)}")
  }

  test("null battery: <=> is total, = propagates null, coalesce fills") {
    val rows = Relational.queries("null_semantics_battery")(spark, sfDir)
      .collect()
    assert(rows.exists(_.isNullAt(1)), "battery needs null status rows")
    assert(rows.exists(!_.isNullAt(1)), "battery needs non-null status rows")
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("eq_nullsafe")),
        "null-safe equality must never be null")
      if (r.isNullAt(r.fieldIndex("status_n"))) {
        assert(r.isNullAt(r.fieldIndex("eq_plain")),
          "plain = must propagate null")
        assert(r.getAs[Int]("eq_nullsafe") == 0)
        assert(r.getAs[String]("status_filled") == "open")
        assert(r.isNullAt(r.fieldIndex("price_if_closed")))
      }
    }
  }

  test("window tail: quartile bounds, percent_rank range, stable " +
      "first/nth value, positive range-framed spend") {
    val rows = Relational.queries("window_tail_stats")(spark, sfDir).collect()
    rows.groupBy(_.getAs[Long]("o_custkey")).values.foreach { grp =>
      assert(grp.forall { r =>
        val q = r.getAs[Int]("quartile"); q >= 1 && q <= 4
      })
      assert(grp.forall { r =>
        val p = r.getAs[Double]("pct_rank"); p >= 0.0 && p <= 1.0
      })
      assert(grp.map(_.getAs[Long]("first_key")).toSet.size == 1,
        "first_value must be constant within the partition")
      if (grp.length == 1)
        assert(grp.head.isNullAt(grp.head.fieldIndex("second_key")),
          "nth_value(2) must be null for a single-row partition")
      assert(grp.forall(_.getAs[Double]("spend_30d") > 0.0),
        "trailing spend includes the current row, so it is positive")
    }
  }

  test("q7/q10/q14/q15/q16/q17/q20 batch: non-empty at spec scale") {
    Seq("q7_nation_volume", "q10_returned_items", "q14_promo_revenue",
      "q15_top_supplier", "q16_part_supplier_counts",
      "q17_small_qty_revenue", "q20_excess_suppliers").foreach { q =>
      assert(Relational.queries(q)(spark, sfDir).count() > 0, s"$q empty")
    }
  }

  test("q20: both IN subqueries plan as left-semi joins, aggregate " +
      "reduces lineitem before any supplier join") {
    val plan = Relational.queries("q20_excess_suppliers")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val semis = "LeftSemi".r.findAllIn(plan).length
    assert(semis == 2, s"expected 2 semi joins, got $semis:\n$plan")
  }

  test("q16: the NOT IN exclusion plans as a left-anti join") {
    val plan = Relational.queries("q16_part_supplier_counts")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"no anti join:\n$plan")
  }

  test("q15: max-revenue membership keeps every tied supplier") {
    // independent reconstruction at spec scale: compute the per-supplier
    // revenue and its max directly, then compare the key sets
    val rows = Relational.queries("q15_top_supplier")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val rev = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1) - col("l_discount").cast("decimal(12,2)")))
        .cast("double").as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val mx = rev.values.max
    val expected = rev.filter(_._2 == mx).keySet
    assert(rows.map(_.getAs[Long]("s_suppkey")).toSet == expected)
  }

  test("q17: small-quantity threshold is per part, not global") {
    val rows = Relational.queries("q17_small_qty_revenue")(spark, sfDir)
      .collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("n_items") > 0, "fixture has no " +
      "small-quantity lineitems for the brand — broaden the predicate")
  }

  test("q4/q6/q8/q9/q11/q12 batch: non-empty at spec scale — all 22 " +
      "TPC-H shapes covered") {
    Seq("q4_order_priority", "q6_forecast_revenue", "q8_market_share",
      "q9_product_profit", "q11_important_stock",
      "q12_shipping_priority_class").foreach { q =>
      assert(Relational.queries(q)(spark, sfDir).count() > 0, s"$q empty")
    }
  }

  test("q4: cross-table EXISTS plans as one semi join, no distinct") {
    val plan = Relational.queries("q4_order_priority")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"no semi join:\n$plan")
    assert(!plan.contains("Distinct"), s"semi join should dedup:\n$plan")
  }

  test("q6: all three range predicates push into the parquet scan") {
    // toString truncates PushedFilters; the formatted explain prints the
    // full list
    val plan = Relational.queries("q6_forecast_revenue")(spark, sfDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    Seq("GreaterThanOrEqual(l_shipdate",
      "GreaterThanOrEqual(l_discount", "LessThan(l_quantity")
      .foreach(p => assert(plan.contains(p), s"$p not pushed:\n$plan"))
  }

  test("q8: numerator and denominator aggregate in ONE pass (a single " +
      "HashAggregate pair, no self-join)") {
    val plan = Relational.queries("q8_market_share")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val aggs = "HashAggregate".r.findAllIn(plan).length
    assert(aggs == 2, s"expected partial+final aggregate only, got " +
      s"$aggs HashAggregates:\n$plan")
  }

  test("q11: threshold membership matches an independent reconstruction") {
    val rows = Relational.queries("q11_important_stock")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    // independent reconstruction: per-part decimal-exact values over the
    // region-0 suppliers, cutoff = 0.001 * the exact base total
    val region0 = Tables.load(spark, sfDir, "supplier")
      .join(Tables.load(spark, sfDir, "nation")
          .filter(col("n_regionkey") === 0),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val base = Tables.load(spark, sfDir, "lineitem")
      .join(region0, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .select(col("l_partkey"),
        (col("l_extendedprice").cast("decimal(12,2)") *
          col("l_quantity").cast("decimal(12,2)")).as("iv"))
    val perPart = base.groupBy("l_partkey")
      .agg(sum(col("iv")).cast("double").as("v")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val cutoff =
      0.001 * base.agg(sum(col("iv")).cast("double")).head().getDouble(0)
    val expected = perPart.filter(_._2 > cutoff).keySet
    assert(rows.map(_.getAs[Long]("l_partkey")).toSet == expected,
      "threshold membership diverged from the reconstruction")
    val values = rows.map(_.getAs[Double]("value"))
    assert(values.sameElements(values.sortBy(-(_: Double))))
  }

  test("broadcast joins plan as BroadcastHashJoin, no shuffle of dims") {
    val plan = Relational.queries("star_revenue_by_nation")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("q3 top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = Relational.queries("q3_shipping_priority")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }

  test("filter pushdown reaches the parquet scan") {
    val plan = Relational.queries("q1_pricing_summary")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"no pushed filters in:\n$plan")
  }
}
