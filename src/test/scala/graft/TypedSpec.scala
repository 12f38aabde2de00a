package graft

import graft.operators.Typed
import org.apache.spark.sql.functions._

class TypedSpec extends SparkSpec {
  import spark.implicits._

  test("typed aggregator matches the untyped decimal-sum formulation " +
      "and keeps partial aggregation") {
    val typed = Typed.queries("typed_customer_spend")(spark, sfDir)
    val untyped = Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(Ql.dsum(col("o_totalprice")).as("spend"),
        count(lit(1)).as("n_orders"))
      .orderBy(desc("spend"), asc("c_custkey"))
      .limit(10)
    assert(typed.collect().toSeq == untyped.collect().toSeq)
    // the Aggregator must plan as a two-phase hash aggregate (partial
    // + final), not a single global pass
    val plan = typed.queryExecution.executedPlan.toString
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r
      .findAllIn(plan).size >= 2, s"no partial aggregation:\n$plan")
  }

  test("typed dataset round-trips the orders schema") {
    val ds = Typed.orders(spark, sfDir)
    val one = ds.filter(_.o_custkey >= 0).head()
    assert(one.o_orderkey >= 0 && one.o_totalprice > 0)
    assert(ds.count() == Tables.load(spark, sfDir, "orders").count())
  }
}
