package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{MaterializedView, SnapshotTable}

/** The incremental-view-maintenance scale claim, measured: a join-MV
  * refresh is DELTA-bound, not table-bound. Same fixed-size delta
  * (1,000 appended fact rows + 100 MOR-updated dim rows) applied to a
  * 1x and a 10x fact/dim pair; the incremental refresh time must stay
  * ~flat while a full recompute scales with the table.
  *
  * Usage: runMain graft.tools.MvScaleProof <sfDir> <sf10xDir>
  * (generate the 10x fixture with graft.tools.ScaleGen first).
  * Prints one JSON line per scale. */
object MvScaleProof {
  def main(args: Array[String]): Unit = {
    val Array(sf1, sf10) = args
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    def run(tag: String, dir: String): Unit = {
      val base = java.nio.file.Files
        .createTempDirectory(s"graft-mvscale-$tag").toString
      val fact = graft.Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"),
          col("l_extendedprice"))
      val dim = graft.Tables.load(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))
      val jv = MaterializedView.JoinView(
        base + "/fact", base + "/dim", base + "/view",
        factKey = "l_partkey", dimKey = "p_partkey",
        keys = Seq("p_brand"), sumCols = Seq("l_extendedprice"))
      SnapshotTable.commit(s, jv.factRoot, fact,
        clusterKey = Some("l_partkey"), files = 32)
      SnapshotTable.commit(s, jv.dimRoot, dim,
        clusterKey = Some("p_partkey"), files = 8)
      def t(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val boot = t(MaterializedView.refreshJoinIncremental(s, jv))
      // the FIXED delta, independent of table size
      SnapshotTable.append(s, jv.factRoot,
        fact.limit(1000).select(
          (col("l_orderkey") + 900000000L).as("l_orderkey"),
          col("l_partkey"), col("l_extendedprice")))
      SnapshotTable.mergeOnRead(s, jv.dimRoot,
        dim.orderBy("p_partkey").limit(100)
          .withColumn("p_brand", lit("SCALEMOVED")),
        "p_partkey")
      // warm + measured reps of the incremental refresh; each rep
      // re-dirties the source with the same fixed-size delta
      var times = Seq.empty[Double]
      for (i <- 1 to 3) {
        times :+= t(MaterializedView.refreshJoinIncremental(s, jv))
        SnapshotTable.append(s, jv.factRoot,
          fact.limit(1000).select(
            (col("l_orderkey") + (900000000L + i * 1000000L))
              .as("l_orderkey"),
            col("l_partkey"), col("l_extendedprice")))
        SnapshotTable.mergeOnRead(s, jv.dimRoot,
          dim.orderBy("p_partkey").limit(100)
            .withColumn("p_brand", lit(s"SCALEMOVED$i")),
          "p_partkey")
      }
      val full = t(MaterializedView.refreshJoin(s, jv))
      println(s"""{"tag":"$tag","fact_rows":${fact.count()},""" +
        s""""bootstrap_sec":${boot.formatted("%.2f")},""" +
        s""""incr_refresh_sec":[${times.map(_.formatted("%.2f"))
          .mkString(",")}],""" +
        s""""full_recompute_sec":${full.formatted("%.2f")}}""")
    }
    run("1x", sf1)
    run("10x", sf10)
    s.stop()
  }
}
