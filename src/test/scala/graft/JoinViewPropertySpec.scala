package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{MaterializedView, SnapshotTable}

/** Randomized differential test of the star-MV maintenance algebra:
  * seeded random histories of appends / MOR-deletes / MOR-updates
  * across the fact and BOTH dims, with incremental refreshes (and
  * readFresh probes) interleaved at random — after every refresh the
  * served view must be bit-equal to a from-scratch rollup of the
  * current snapshots. A wrong sign, a dropped cross term, a stale
  * version pin, or a marker mix-up shows up as a mismatch within a
  * few steps. */
class JoinViewPropertySpec extends SparkSpec {

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-jvp").toString + "/t"

  test("random op sequences: incremental star maintenance equals a " +
      "from-scratch recompute after every refresh (3 seeded histories)") {
    val li0 = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"))
    val part0 = Tables.load(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_brand"))
    val supp0 = Tables.load(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))

    for (seed <- Seq(7L, 41L, 1301L)) {
      val rnd = new scala.util.Random(seed)
      val base = tmpRoot()
      val sv = MaterializedView.StarView(
        factRoot = base + "_f", viewRoot = base + "_v",
        dims = Seq(
          MaterializedView.StarDim(base + "_p", "l_partkey", "p_partkey"),
          MaterializedView.StarDim(base + "_s", "l_suppkey", "s_suppkey")),
        keys = Seq("p_brand", "s_nationkey"),
        sumCols = Seq("l_extendedprice"))
      SnapshotTable.commit(spark, sv.factRoot, li0,
        clusterKey = Some("l_partkey"), files = 6)
      SnapshotTable.commit(spark, sv.dims(0).root, part0,
        clusterKey = Some("p_partkey"), files = 3)
      SnapshotTable.commit(spark, sv.dims(1).root, supp0,
        clusterKey = Some("s_suppkey"), files = 2)
      MaterializedView.refreshStarIncremental(spark, sv)

      def canon(df: DataFrame): Seq[String] =
        df.select(col("p_brand"), col("s_nationkey"), col("n"),
            col("sum_l_extendedprice").cast("decimal(20,2)"),
            col("cnt_l_extendedprice"))
          .collect().map(_.mkString("|")).sorted.toSeq
      def want(): Seq[String] = {
        val f = SnapshotTable.read(spark, sv.factRoot)
        val p = SnapshotTable.read(spark, sv.dims(0).root)
        val s = SnapshotTable.read(spark, sv.dims(1).root)
        canon(f.join(p, f("l_partkey") === p("p_partkey"))
          .join(s, f("l_suppkey") === s("s_suppkey"))
          .groupBy("p_brand", "s_nationkey")
          .agg(count(lit(1)).as("n"),
            sum(col("l_extendedprice").cast("decimal(20,2)"))
              .as("sum_l_extendedprice"),
            count(col("l_extendedprice")).as("cnt_l_extendedprice")))
      }

      var appended = 0
      def randomOp(step: Int): String = rnd.nextInt(6) match {
        case 0 | 1 => // fact append (sometimes referencing moved dims)
          appended += 1
          val m = 5 + rnd.nextInt(25)
          SnapshotTable.append(spark, sv.factRoot,
            li0.filter(col("l_orderkey") % m === 0).limit(200).select(
              (col("l_orderkey") + (appended * 10000000L))
                .as("l_orderkey"),
              col("l_partkey"), col("l_suppkey"),
              (col("l_extendedprice") * (1 + rnd.nextInt(3)))
                .as("l_extendedprice")))
          s"append(%$m)"
        case 2 => // fact MOR delete by order
          val m = 7 + rnd.nextInt(30)
          SnapshotTable.deleteKeysOnRead(spark, sv.factRoot,
            SnapshotTable.read(spark, sv.factRoot)
              .filter(col("l_orderkey") % m === 0)
              .select("l_orderkey").limit(500).distinct(),
            "l_orderkey")
          s"factDelete(%$m)"
        case 3 | 4 => // part brand reassignment (group-key churn)
          val m = 3 + rnd.nextInt(20)
          SnapshotTable.mergeOnRead(spark, sv.dims(0).root,
            part0.filter(col("p_partkey") % m === 0)
              .withColumn("p_brand", lit(s"Brand#R$step")),
            "p_partkey")
          s"partMove(%$m)"
        case 5 => // supplier nation churn
          val m = 2 + rnd.nextInt(9)
          SnapshotTable.mergeOnRead(spark, sv.dims(1).root,
            supp0.filter(col("s_suppkey") % m === 0)
              .withColumn("s_nationkey",
                lit(-(step + 1)).cast("int")),
            "s_suppkey")
          s"suppMove(%$m)"
      }

      var history = Vector.empty[String]
      for (step <- 1 to 6) {
        // 1-2 ops per refresh window, so single-source and multi-
        // source deltas both occur
        history :+= randomOp(step)
        if (rnd.nextBoolean()) history :+= randomOp(step + 100)
        if (rnd.nextBoolean()) {
          // read-time merge over the pending window first
          assert(canon(MaterializedView.readFresh(spark, sv)) == want(),
            s"seed=$seed step=$step readFresh after " +
              history.mkString(", "))
        }
        MaterializedView.refreshStarIncremental(spark, sv)
        assert(canon(MaterializedView.read(spark, sv)) == want(),
          s"seed=$seed step=$step after ${history.mkString(", ")}")
      }
    }
  }
}
