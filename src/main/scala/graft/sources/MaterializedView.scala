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
    // last-writer-wins is correct here: refreshes of the same view are
    // idempotent recomputations, and the freshness marker is advisory
    writeFreshness(spark, v.viewRoot, sourceV, viewV)
    viewV
  }

  /** Serve the materialized result (current view snapshot). */
  def read(spark: SparkSession, v: View): DataFrame =
    SnapshotTable.read(spark, v.viewRoot)

  // ---- incremental refresh ----

  /** A view restricted to keyed COUNT + SUM aggregates — exactly the
    * class where applying a row-level delta is algebraically exact, so
    * an incremental refresh costs O(changed rows), not O(source).
    * `sumCols` are summed as DECIMAL(20,2): decimal addition is
    * associative/commutative (unlike float), which is what makes
    * delta-application BIT-IDENTICAL to a full recompute — the spec
    * asserts that equality, not an epsilon. */
  final case class IncrementalView(sourceRoot: String, viewRoot: String,
      keys: Seq[String], sumCols: Seq[String])

  private def rollup(df: DataFrame, v: IncrementalView): DataFrame = {
    import org.apache.spark.sql.functions._
    df.groupBy(v.keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        v.sumCols.map(c =>
          sum(col(c).cast("decimal(20,2)")).as(s"sum_$c")): _*)
  }

  private def asView(v: IncrementalView): View =
    View(v.sourceRoot, v.viewRoot, df => rollup(df, v))

  def isStale(spark: SparkSession, v: IncrementalView): Boolean =
    isStale(spark, asView(v))

  def read(spark: SparkSession, v: IncrementalView): DataFrame =
    SnapshotTable.read(spark, v.viewRoot)

  /** Refresh by DELTA when possible: aggregate only the rows
    * `SnapshotTable.diff` reports changed since the last consumed
    * source version (insertions count +1, deletions -1), join the
    * signed delta onto the materialized rollup, and commit the merged
    * result. Falls back to a full recompute on first refresh or when
    * the previously-consumed source version has been expired. Groups
    * whose count reaches zero are dropped — a group the source no
    * longer contains must not linger in the view. */
  def refreshIncremental(spark: SparkSession, v: IncrementalView): Long = {
    import org.apache.spark.sql.functions._
    val lastV = refreshedAgainst(spark, v.viewRoot)
    val curV = SnapshotTable.currentVersion(spark, v.sourceRoot)
    val canDelta = lastV > 0 && lastV < curV &&
      SnapshotTable.versions(spark, v.sourceRoot).contains(lastV)
    if (!canDelta) return refresh(spark, asView(v))

    val delta = SnapshotTable.diff(spark, v.sourceRoot, lastV, curV)
      .withColumn("__sign",
        when(col("change_type") === "inserted", lit(1L)).otherwise(lit(-1L)))
    val deltaAgg = delta.groupBy(v.keys.map(col): _*)
      .agg(sum(col("__sign")).as("dn"),
        v.sumCols.map(c =>
          sum(col(c).cast("decimal(20,2)") * col("__sign"))
            .as(s"dsum_$c")): _*)
    val old = SnapshotTable.read(spark, v.viewRoot)
    val merged = old.join(deltaAgg, v.keys, "full_outer")
      .select((v.keys.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n")) ++
        v.sumCols.map(c =>
          (coalesce(col(s"sum_$c"), lit(0).cast("decimal(20,2)")) +
            coalesce(col(s"dsum_$c"), lit(0).cast("decimal(20,2)")))
            .cast("decimal(20,2)").as(s"sum_$c"))): _*)
      .filter(col("n") > 0)
    val viewV = SnapshotTable.commit(spark, v.viewRoot, merged)
    writeFreshness(spark, v.viewRoot, curV, viewV)
    viewV
  }

  private def refreshedAgainst(spark: SparkSession, viewRoot: String)
  : Long = refreshedAgainst(spark, View("", viewRoot, identity))

  private def writeFreshness(spark: SparkSession, viewRoot: String,
      sourceV: Long, viewV: Long): Unit = {
    val f = new org.apache.hadoop.fs.Path(viewRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(viewRoot,
      s"_source_version.tmp-$viewV")
    val out = f.create(tmp, true)
    try out.write(sourceV.toString.getBytes("UTF-8")) finally out.close()
    f.delete(freshnessPath(viewRoot), false)
    require(f.rename(tmp, freshnessPath(viewRoot)),
      s"freshness marker swap failed at $viewRoot")
  }
}
