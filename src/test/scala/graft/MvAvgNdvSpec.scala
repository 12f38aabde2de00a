package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{MaterializedView, SnapshotTable}

/** AVG and NDV columns in [[MaterializedView.IncrementalView]]:
  *  - `avgCols` — avg served EXACT as the derived quotient of the
  *    maintained (decimal sum, non-null count) pair, bit-equal to a
  *    from-scratch computation through append AND delete ticks;
  *  - `ndvCols` — approximate count(DISTINCT) as a mergeable HLL
  *    register column: insert-only groups union registers, delete-
  *    touched groups take the bounded exact recompute, and the final
  *    registers are BIT-EQUAL to a from-scratch rollup (register max
  *    is set-semantics: what was inserted, not how it arrived), with
  *    the estimate inside the HLL error envelope of the exact
  *    distinct count. */
class MvAvgNdvSpec extends SparkSpec {

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-avgndv").toString + "/t"

  private def src: DataFrame =
    Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))

  private def mkView(): MaterializedView.IncrementalView = {
    val base = tmpRoot()
    MaterializedView.IncrementalView(base + "_src", base + "_view",
      keys = Seq("o_orderstatus"), sumCols = Nil,
      avgCols = Seq("o_totalprice"), ndvCols = Seq("o_custkey"))
  }

  /** avg/sum/cnt surface, canonical strings (bit-compare). */
  private def canonAvg(df: DataFrame): Seq[String] =
    df.select(col("o_orderstatus"), col("n"),
        col("sum_o_totalprice").cast("decimal(20,2)"),
        col("cnt_o_totalprice"), col("avg_o_totalprice"))
      .collect().map(_.mkString("|")).sorted.toSeq

  private def expectedAvg(v: MaterializedView.IncrementalView)
  : Seq[String] =
    canonAvg(SnapshotTable.read(spark, v.sourceRoot)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(20,2)"))
          .as("sum_o_totalprice"),
        count(col("o_totalprice")).as("cnt_o_totalprice"))
      .withColumn("avg_o_totalprice",
        col("sum_o_totalprice").cast("double") /
          col("cnt_o_totalprice")))

  test("avg maintenance is served exact (bit-equal to the quotient " +
      "of a from-scratch sum/cnt) through bootstrap, an append tick " +
      "and a MOR-delete tick") {
    val v = mkView()
    SnapshotTable.commit(spark, v.sourceRoot, src.filter(
      col("o_orderkey") % 3 =!= 0), clusterKey = Some("o_orderstatus"))
    MaterializedView.refreshIncremental(spark, v)
    assert(canonAvg(MaterializedView.read(spark, v)) == expectedAvg(v),
      "bootstrap")
    // append tick: pure delta merge re-derives the quotient
    SnapshotTable.append(spark, v.sourceRoot,
      src.filter(col("o_orderkey") % 3 === 0))
    MaterializedView.refreshIncremental(spark, v)
    assert(canonAvg(MaterializedView.read(spark, v)) == expectedAvg(v),
      "append tick")
    // delete tick: retractions flow through the signed delta; the
    // derived avg must follow the shrunken sum/cnt exactly
    SnapshotTable.deleteKeysOnRead(spark, v.sourceRoot,
      src.filter(col("o_orderkey") % 7 === 0).select("o_orderkey"),
      "o_orderkey")
    MaterializedView.refreshIncremental(spark, v)
    assert(canonAvg(MaterializedView.read(spark, v)) == expectedAvg(v),
      "delete tick")
  }

  test("ndv maintenance: insert ticks union registers, a delete tick " +
      "recomputes its groups exactly — final registers BIT-EQUAL a " +
      "from-scratch rollup, estimate within the HLL envelope of the " +
      "exact distinct count") {
    val v = mkView()
    SnapshotTable.commit(spark, v.sourceRoot, src.filter(
      col("o_orderkey") % 3 =!= 0), clusterKey = Some("o_orderstatus"))
    MaterializedView.refreshIncremental(spark, v)
    SnapshotTable.append(spark, v.sourceRoot,
      src.filter(col("o_orderkey") % 3 === 0))
    MaterializedView.refreshIncremental(spark, v)
    SnapshotTable.deleteKeysOnRead(spark, v.sourceRoot,
      src.filter(col("o_orderkey") % 7 === 0).select("o_orderkey"),
      "o_orderkey")
    MaterializedView.refreshIncremental(spark, v)

    def canonNdv(df: DataFrame): Seq[String] =
      df.selectExpr("o_orderstatus", "n", "base64(hll_o_custkey)",
          "ndv_o_custkey")
        .collect().map(_.mkString("|")).sorted.toSeq
    // the registers (and so the estimate) must not depend on HOW the
    // rows arrived — three ticks vs one shot land identical sketches
    val fresh = tmpRoot()
    SnapshotTable.commit(spark, fresh,
      SnapshotTable.read(spark, v.sourceRoot))
    val freshView = MaterializedView.IncrementalView(fresh,
      fresh + "_v", v.keys, v.sumCols, avgCols = v.avgCols,
      ndvCols = v.ndvCols)
    MaterializedView.refreshIncremental(spark, freshView)
    assert(canonNdv(MaterializedView.read(spark, v)) ==
      canonNdv(MaterializedView.read(spark, freshView)),
      "incremental registers diverged from a from-scratch rollup")
    // estimate inside the error envelope of the exact distinct count
    // (p=12 -> ~1.6% relative error; allow 5%)
    val exact = SnapshotTable.read(spark, v.sourceRoot)
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    MaterializedView.read(spark, v)
      .select("o_orderstatus", "ndv_o_custkey")
      .collect().foreach { r =>
        val (k, est) = (r.getString(0), r.getLong(1))
        val ex = exact(k).toDouble
        assert(math.abs(est - ex) / ex <= 0.05,
          s"group $k: ndv $est vs exact $ex")
      }
  }

  test("an all-NULL aggregate column serves NULL avg and ndv 0 (the " +
      "counting trick carried through the derivation)") {
    import spark.implicits._
    val base = tmpRoot()
    val v = MaterializedView.IncrementalView(base + "_src",
      base + "_view", keys = Seq("k"), sumCols = Nil,
      avgCols = Seq("x"), ndvCols = Seq("x"))
    SnapshotTable.commit(spark, v.sourceRoot,
      Seq(("a", Some(1.0)), ("a", Some(3.0)), ("b", None), ("b", None))
        .toDF("k", "x"))
    MaterializedView.refreshIncremental(spark, v)
    val rows = MaterializedView.read(spark, v)
      .selectExpr("k", "avg_x", "ndv_x")
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getDouble(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows(0) == (("a", 2.0, 2L)), s"got ${rows(0)}")
    assert(rows(1)._2 == null && rows(1)._3 == 0L, s"got ${rows(1)}")
  }
}
