package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized rollup over a [[SnapshotTable]] — the dashboard pattern
  * the reference serves by RE-RUNNING every aggregation per page load
  * (`api-service/data_service.py`): compute once, serve many, refresh
  * on data change.
  *
  * The view is itself a SnapshotTable, so every property composes for
  * free: refresh is an atomic commit (readers of the old rollup never
  * see a half-written one), history is time travel, and `diff` shows
  * what a refresh changed. Freshness is tracked by recording WHICH
  * source version a refresh consumed — `isStale` is then one metadata
  * comparison, no data read.
  *
  * Scale: refresh cost is the rollup query itself (typically one keyed
  * aggregation over the source snapshot); serving cost is a scan of the
  * (small) materialized result. The refresh-vs-reread tradeoff is the
  * same one the reference's per-request recomputation gets wrong at any
  * scale past a demo.
  */
object MaterializedView {

  /** `transform` must be a pure function of the source snapshot. */
  final case class View(sourceRoot: String, viewRoot: String,
      transform: DataFrame => DataFrame)

  private def freshnessPath(viewRoot: String) =
    new org.apache.hadoop.fs.Path(viewRoot, "_source_version")

  /** The source version the last refresh consumed; 0 = never refreshed. */
  def refreshedAgainst(spark: SparkSession, v: View): Long = {
    val f = new org.apache.hadoop.fs.Path(v.viewRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = freshnessPath(v.viewRoot)
    if (!f.exists(p)) 0L
    else {
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in).mkString.trim.toLong
      finally in.close()
    }
  }

  /** Stale iff the source has committed past the version the view last
    * consumed. Metadata-only: two tiny listings, no data read. */
  def isStale(spark: SparkSession, v: View): Boolean =
    SnapshotTable.currentVersion(spark, v.sourceRoot) >
      refreshedAgainst(spark, v)

  /** Recompute the rollup from the CURRENT source snapshot and commit it
    * as a new view version. Resolves the source version FIRST, so a
    * source commit racing the refresh leaves the view stale (and
    * `isStale` says so) rather than recording a version it never read.
    * Returns the new view version. */
  def refresh(spark: SparkSession, v: View): Long = {
    val sourceV = SnapshotTable.currentVersion(spark, v.sourceRoot)
    val result = v.transform(
      SnapshotTable.readVersion(spark, v.sourceRoot, sourceV))
    val viewV = SnapshotTable.commit(spark, v.viewRoot, result)
    val f = new org.apache.hadoop.fs.Path(v.viewRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(v.viewRoot,
      s"_source_version.tmp-$viewV")
    val out = f.create(tmp, true)
    try out.write(sourceV.toString.getBytes("UTF-8")) finally out.close()
    // last-writer-wins is correct here: refreshes of the same view are
    // idempotent recomputations, and the freshness marker is advisory
    f.delete(freshnessPath(v.viewRoot), false)
    require(f.rename(tmp, freshnessPath(v.viewRoot)),
      s"freshness marker swap failed at ${v.viewRoot}")
    viewV
  }

  /** Serve the materialized result (current view snapshot). */
  def read(spark: SparkSession, v: View): DataFrame =
    SnapshotTable.read(spark, v.viewRoot)
}
