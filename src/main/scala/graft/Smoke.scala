package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke main: runs the flagship `SparkEntry.entry` exactly like the
  * driver's t1 check (rows > 0) and prints the formatted physical plan —
  * the fast feedback loop for plan-shape work (.explain review per the
  * build rules). Optional arg: a query name to explain instead. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-smoke")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // sanity-check the extension-injected functions (fresh JVM => the
    // withExtensions path is genuinely exercised here)
    val ext = spark.sql(
      "SELECT graft_cosine(array(3.0D, 4.0D), array(3.0D, 4.0D)) AS c," +
        " graft_simhash(array('a','b')) AS s").collect()(0)
    require(math.abs(ext.getDouble(0) - 1.0) < 1e-12, "extensions broken")
    println(s"EXTENSIONS ok cosine=${ext.getDouble(0)} simhash=${ext.getLong(1)}")
    val df = args.headOption match {
      case Some(name) =>
        SparkEntry.queries(name)(spark,
          sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
      case None => SparkEntry.entry(spark)
    }
    df.explain("formatted")
    val rows = df.count()
    println(s"SMOKE rows=$rows")
    df.show(10, truncate = false)
    spark.stop()
  }
}
