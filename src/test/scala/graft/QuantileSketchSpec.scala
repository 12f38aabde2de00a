package graft

import org.apache.spark.sql.functions._

/** Relative-error quantile sketch (graft.functions.QuantileAggregates,
  * the DDSketch family): the guarantees the Scaladoc states, pinned —
  * every quantile estimate within alpha relative error of the exact
  * rank value, bit-determinism under re-partitioning (bucket addition
  * commutes), the union face equal to the direct sketch, and sign
  * handling across negative/zero/positive stores. */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  graft.functions.QuantileFunctions.register(spark)

  private lazy val prices = Tables.load(spark, sfDir, "lineitem")
    .selectExpr("CAST(l_extendedprice AS DOUBLE) AS x")

  private def exactQuantile(sorted: Array[Double], q: Double): Double =
    sorted(math.max(0, math.ceil(q * sorted.length).toInt - 1))

  test("every estimate sits within the declared relative error of the " +
      "exact rank value, at alpha = 1% and 5%") {
    val sorted = prices.as[Double].collect().sorted
    for (alphaPct <- Seq(1, 5); q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75,
        0.9, 0.99, 1.0)) {
      val est = prices
        .agg(expr(s"graft_qsketch_quantile(graft_qsketch(x, $alphaPct), " +
          s"CAST($q AS DOUBLE))"))
        .collect()(0).getDouble(0)
      val exact = exactQuantile(sorted, q)
      val relErr = math.abs(est - exact) / exact
      assert(relErr <= alphaPct / 100.0 + 1e-9,
        s"alpha=$alphaPct% q=$q: est $est vs exact $exact (rel $relErr)")
    }
  }

  test("deterministic under re-partitioning: bucket addition commutes") {
    def sketch(parts: Int): Array[Byte] =
      prices.repartition(parts)
        .agg(expr("graft_qsketch(x, 2)"))
        .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(sketch(3), sketch(17)),
      "sketch bytes must be partition-invariant")
  }

  test("union of per-group sketches is bit-equal to the direct global " +
      "sketch — the day-rollup mergeability face") {
    val withFlag = Tables.load(spark, sfDir, "lineitem")
      .selectExpr("l_returnflag", "CAST(l_extendedprice AS DOUBLE) AS x")
    val unioned = withFlag
      .groupBy("l_returnflag").agg(expr("graft_qsketch(x, 1)").as("sk"))
      .agg(expr("graft_qsketch_union(sk)"))
      .collect()(0).getAs[Array[Byte]](0)
    val direct = withFlag.agg(expr("graft_qsketch(x, 1)"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(unioned, direct),
      "two-level union must equal the one-pass sketch, byte for byte")
  }

  test("negative, zero and positive values estimate with correct sign " +
      "and relative error on |x|") {
    val xs = Seq(-1000.0, -100.0, -10.0, 0.0, 0.0, 10.0, 100.0, 1000.0,
      10000.0)
    val df = xs.toDF("x")
    def est(q: Double): Double = df
      .agg(expr(s"graft_qsketch_quantile(graft_qsketch(x, 1), " +
        s"CAST($q AS DOUBLE))"))
      .collect()(0).getDouble(0)
    // ranks (ceil(q*9)): q=.12→2nd (-100), q=.5→5th (0), q=1→9th (10000)
    assert(math.abs(est(0.12) - (-100.0)) <= 1.0 + 1e-9)
    assert(est(0.5) == 0.0)
    assert(math.abs(est(1.0) - 10000.0) <= 100.0 + 1e-9)
    // empty input: NaN, not a crash
    val empty = df.filter(col("x") > 1e9)
      .agg(expr("graft_qsketch_quantile(graft_qsketch(x, 1), " +
        "CAST(0.5 AS DOUBLE))"))
      .collect()(0).getDouble(0)
    assert(empty.isNaN)
  }

  test("the sketch_price_quantiles query returns a full profile: every " +
      "return flag plus the unioned ALL row, p50 <= p90 <= p99") {
    val rows = graft.operators.Relational
      .queries("sketch_price_quantiles")(spark, sfDir)
      .select("l_returnflag", "n", "p50", "p90", "p99")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).contains("ALL"))
    assert(rows.length >= 3)
    rows.foreach { case (flag, n, p50, p90, p99) =>
      assert(n > 0 && p50 <= p90 && p90 <= p99,
        s"$flag: n=$n p50=$p50 p90=$p90 p99=$p99")
    }
    val all = rows.find(_._1 == "ALL").get
    assert(all._2 == rows.filterNot(_._1 == "ALL").map(_._2).sum,
      "ALL row must count every flag's rows")
  }
}
