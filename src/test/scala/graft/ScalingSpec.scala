package graft

/** Plan-shape stability at 10× scale (see SCALING.md for the measured
  * wall-clock runs). These tests PLAN against the ScaleGen 10× fixture
  * (no execution — strategy selection is what's under test) and cancel
  * via assume() when the fixture hasn't been generated on this box. */
class ScalingSpec extends SparkSpec {
  private val bigDir =
    sys.env.getOrElse("GRAFT_SCALE_DIR", "/tmp/graft_sf10x")
  private val baseDir = "/root/testdata/sf0.1"

  private val joinKinds = Seq("BroadcastHashJoin", "SortMergeJoin",
    "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct")

  private def joinProfile(plan: String): Map[String, Int] =
    joinKinds.map(k => k -> k.r.findAllMatchIn(plan).length).toMap

  private def planOf(name: String, dir: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  test("10x fixture: join strategies identical to sf0.1 — no " +
      "broadcast->BNLJ flips, no cartesian, no new shuffle joins") {
    assume(new java.io.File(bigDir).isDirectory,
      s"$bigDir absent; generate with: runMain graft.tools.ScaleGen")
    // the round-6 TPC-H batch joins the stability set: semi/anti
    // chains (q20/q16), the single-pass ratio (q8), the decorrelated
    // join-backs (q17) — plus the original star + LSH pair
    Seq("star_revenue_by_nation", "dedup_minhash_lsh",
      "q7_nation_volume", "q8_market_share", "q16_part_supplier_counts",
      "q17_small_qty_revenue", "q20_excess_suppliers").foreach { q =>
      val small = joinProfile(planOf(q, baseDir))
      val big = joinProfile(planOf(q, bigDir))
      assert(big("CartesianProduct") == 0,
        s"$q: cartesian product at 10x: $big")
      assert(big == small, s"$q: strategy drift sf0.1 -> 10x: " +
        s"$small -> $big")
    }
  }

  test("10x star join: all joins hash-based, lineitem never a build side") {
    assume(new java.io.File(bigDir).isDirectory,
      s"$bigDir absent; generate with: runMain graft.tools.ScaleGen")
    val plan = planOf("star_revenue_by_nation", bigDir)
    val p = joinProfile(plan)
    // the three hinted dims broadcast at any scale; the fourth join
    // (lineitem⋈orders) may legally be EITHER a shuffle join or a
    // broadcast of orders' pruned 2-column projection (column pruning
    // shrinks its size estimate under the threshold — and it flips to
    // SMJ on its own once the pruned columns outgrow it). What must
    // NEVER happen: a nested-loop/cartesian, or the 6M-row lineitem
    // side being chosen as a broadcast build side.
    assert(p("BroadcastHashJoin") >= 3, s"lost a hinted dim broadcast: $p")
    assert(p("BroadcastHashJoin") + p("SortMergeJoin") +
      p("ShuffledHashJoin") == 4, s"expected 4 hash-based joins: $p")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"degenerate join: $p")
    // lineitem is the streamed side everywhere: no BroadcastExchange
    // subtree may scan the lineitem files
    val bcScans = "BroadcastExchange[\\s\\S]*?FileScan parquet [^\\n]*".r
      .findAllIn(plan).mkString
    assert(!bcScans.contains("lineitem"),
      "lineitem landed on a broadcast build side")
  }
}
