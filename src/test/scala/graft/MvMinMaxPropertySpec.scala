package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{MaterializedView, SnapshotTable}

/** Randomized differential test of the MIN/MAX maintenance split
  * (monotone merge vs bounded delete-group recompute): seeded random
  * histories of appends and MOR deletes — including deletes AIMED at
  * current group extrema — with refreshes and readFresh probes
  * interleaved; after every step the view must bit-equal a
  * from-scratch rollup. A group mis-routed to the monotone merge
  * after a delete shows up as a stale extremum immediately. */
class MvMinMaxPropertySpec extends SparkSpec {

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-mmp").toString + "/t"

  test("random append/delete histories: min/max views equal a " +
      "recompute after every refresh (2 seeded histories)") {
    val o0 = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"))

    for (seed <- Seq(11L, 404L)) {
      val rnd = new scala.util.Random(seed)
      val base = tmpRoot()
      val v = MaterializedView.IncrementalView(base + "_s",
        base + "_v", keys = Seq("o_orderstatus"),
        sumCols = Seq("o_totalprice"),
        minMaxCols = Seq("o_totalprice", "o_orderkey"))
      SnapshotTable.commit(spark, v.sourceRoot, o0,
        clusterKey = Some("o_orderstatus"),
        bloomKey = Some("o_orderkey"))
      MaterializedView.refreshIncremental(spark, v)

      def canon(df: DataFrame): Seq[String] =
        df.select(col("o_orderstatus"), col("n"),
            col("sum_o_totalprice").cast("decimal(20,2)"),
            col("cnt_o_totalprice"),
            col("min_o_totalprice"), col("max_o_totalprice"),
            col("min_o_orderkey"), col("max_o_orderkey"))
          .collect().map(_.mkString("|")).sorted.toSeq
      def want(): Seq[String] =
        canon(SnapshotTable.read(spark, v.sourceRoot)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(20,2)"))
              .as("sum_o_totalprice"),
            count(col("o_totalprice")).as("cnt_o_totalprice"),
            min(col("o_totalprice")).as("min_o_totalprice"),
            max(col("o_totalprice")).as("max_o_totalprice"),
            min(col("o_orderkey")).as("min_o_orderkey"),
            max(col("o_orderkey")).as("max_o_orderkey")))

      var appended = 0
      def op(step: Int): String = rnd.nextInt(4) match {
        case 0 => // append, sometimes pushing a new global extremum
          appended += 1
          val scale = Seq(0.001, 1.0, 500.0)(rnd.nextInt(3))
          SnapshotTable.append(spark, v.sourceRoot,
            o0.limit(20 + rnd.nextInt(80)).select(
              (col("o_orderkey") + appended * 10000000L)
                .as("o_orderkey"),
              col("o_orderstatus"),
              (col("o_totalprice") * scale).as("o_totalprice")))
          s"append(x$scale)"
        case 1 => // random-slice delete
          val m = 5 + rnd.nextInt(40)
          SnapshotTable.deleteKeysOnRead(spark, v.sourceRoot,
            SnapshotTable.read(spark, v.sourceRoot)
              .filter(col("o_orderkey") % m === 0)
              .select("o_orderkey").limit(400).distinct(),
            "o_orderkey")
          s"delete(%$m)"
        case 2 => // delete AIMED at each group's current minima
          import org.apache.spark.sql.expressions.Window
          val k = 1 + rnd.nextInt(3)
          val mins = SnapshotTable.read(spark, v.sourceRoot)
            .withColumn("rk", row_number().over(
              Window.partitionBy("o_orderstatus")
                .orderBy(col("o_totalprice").asc,
                  col("o_orderkey").asc)))
            .filter(col("rk") <= k).select("o_orderkey")
          SnapshotTable.deleteKeysOnRead(spark, v.sourceRoot, mins,
            "o_orderkey")
          s"deleteMinima($k)"
        case 3 => // delete AIMED at each group's current maxima
          import org.apache.spark.sql.expressions.Window
          val k = 1 + rnd.nextInt(3)
          val maxs = SnapshotTable.read(spark, v.sourceRoot)
            .withColumn("rk", row_number().over(
              Window.partitionBy("o_orderstatus")
                .orderBy(col("o_totalprice").desc,
                  col("o_orderkey").desc)))
            .filter(col("rk") <= k).select("o_orderkey")
          SnapshotTable.deleteKeysOnRead(spark, v.sourceRoot, maxs,
            "o_orderkey")
          s"deleteMaxima($k)"
      }

      var history = Vector.empty[String]
      for (step <- 1 to 5) {
        history :+= op(step)
        if (rnd.nextBoolean()) history :+= op(step + 100)
        if (rnd.nextBoolean()) {
          assert(canon(MaterializedView.readFresh(spark, v)) == want(),
            s"seed=$seed step=$step readFresh after " +
              history.mkString(", "))
        }
        MaterializedView.refreshIncremental(spark, v)
        assert(canon(MaterializedView.read(spark, v)) == want(),
          s"seed=$seed step=$step after ${history.mkString(", ")}")
      }
    }
  }
}
