package graft.operators

import graft.{Ql, Tables}
import graft.Ql.Q
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed Dataset[T] surface (builder brief: "Use Dataset[T] with
  * case-class Encoders where type safety helps" and "custom
  * Expression / TypedColumn (for scalar/agg functions)").
  *
  * The rest of the inventory is DataFrame-style because its schemas are
  * dynamic; this module is the typed counterpart: a case-class Encoder
  * over the orders table, groupByKey, and a custom
  * [[org.apache.spark.sql.expressions.Aggregator]] — the user-facing
  * TypedColumn aggregation API (the engine-level twin is the
  * TypedImperativeAggregate HLL family in graft.functions).
  *
  * [[DecimalSum]] is the typed form of the Ql.dsum determinism recipe:
  * money doubles are accumulated as exact BigDecimal (order-free), and
  * only the FINISHED sum returns to double — so the typed path is
  * bit-identical to the SQL oracle, which a naive typed
  * `.agg(sum(_.o_totalprice))` over doubles would not be.
  *
  * Reference analogue: the per-customer spend rollups the api-service
  * computes driver-side in Python (`data_service.py`).
  */
object Typed {

  /** Typed view of the orders fixture (column names match parquet). */
  case class Order(o_orderkey: Long, o_custkey: Long,
      o_orderstatus: String, o_totalprice: Double,
      o_orderdate: java.sql.Timestamp, o_orderpriority: String)

  def orders(s: SparkSession, dir: String): Dataset[Order] = {
    implicit val enc: Encoder[Order] = Encoders.product[Order]
    Tables.load(s, dir, "orders").as[Order]
  }

  /** Exact decimal sum of a 2-decimal money double, surfaced as double
    * — associative and commutative over BigDecimal, so partial
    * aggregation and merge order cannot change the result. */
  class DecimalSum(f: Order => Double)
      extends Aggregator[Order, java.math.BigDecimal, Double] {
    override def zero: java.math.BigDecimal = java.math.BigDecimal.ZERO
    override def reduce(b: java.math.BigDecimal, o: Order)
    : java.math.BigDecimal =
      b.add(java.math.BigDecimal.valueOf(f(o))
        .setScale(2, java.math.RoundingMode.HALF_UP))
    override def merge(a: java.math.BigDecimal, b: java.math.BigDecimal)
    : java.math.BigDecimal = a.add(b)
    override def finish(b: java.math.BigDecimal): Double = b.doubleValue
    override def bufferEncoder: Encoder[java.math.BigDecimal] =
      Encoders.DECIMAL
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val queries: Map[String, Q] = Map(
    // Top spenders through the TYPED API end-to-end: case-class rows,
    // groupByKey on a field accessor, a custom Aggregator TypedColumn,
    // and a typed count — then back to a DataFrame only for the final
    // ordered projection. Plans to the same hash-aggregate shape as
    // the untyped form (asserted in TypedSpec): typed does not mean
    // slow here, the Aggregator participates in partial aggregation.
    "typed_customer_spend" -> ((s, dir) => {
      import s.implicits._
      val spend = new DecimalSum(_.o_totalprice).toColumn
      orders(s, dir)
        .groupByKey(_.o_custkey)
        .agg(spend.name("spend"), count(lit(1)).as("n_orders").as[Long])
        .toDF("c_custkey", "spend", "n_orders")
        .orderBy(desc("spend"), asc("c_custkey"))
        .limit(10)
    }))

  val oracleSql: Map[String, String] = Map(
    "typed_customer_spend" ->
      """SELECT o_custkey AS c_custkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |    AS spend,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |ORDER BY spend DESC, c_custkey LIMIT 10""".stripMargin)
}
