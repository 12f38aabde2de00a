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
