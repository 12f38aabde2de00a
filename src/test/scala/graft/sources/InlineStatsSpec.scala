package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The r17 single-pass commit staging (per-file stats computed by the
  * write tasks) must record EXACTLY the manifest the two-pass
  * write-then-read-back path recorded: same file count, same rendered
  * [lo, hi] ranges, same null counts, same bloom bytes, same NDV
  * registers, same row counts — file names and physical byte lengths
  * are the only fields allowed to differ (names carry task ids; byte
  * lengths differ by committer metadata). Pinned over the type zoo the
  * stats rendering is sensitive to: strings, ints, doubles, decimals,
  * timestamps, NULLs. */
class InlineStatsSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-inline-spec").toString

  /** Commit `df` twice — inline on / off — and return both manifests. */
  private def both(df: org.apache.spark.sql.DataFrame,
      commit: (String, org.apache.spark.sql.DataFrame) => Unit)
  : (Seq[SnapshotTable.FileEntry], Seq[SnapshotTable.FileEntry]) = {
    val base = tmp()
    spark.conf.set("spark.graft.commit.inlineStats", "true")
    commit(base + "/on", df)
    spark.conf.set("spark.graft.commit.inlineStats", "false")
    try commit(base + "/off", df)
    finally spark.conf.unset("spark.graft.commit.inlineStats")
    def entriesOf(root: String) = {
      val v = SnapshotTable.currentVersion(spark, root)
      SnapshotTable.manifest(spark, root, v)
    }
    (entriesOf(base + "/on"), entriesOf(base + "/off"))
  }

  /** The comparable projection of an entry: everything except the
    * file name and byte length. */
  private def key(e: SnapshotTable.FileEntry) =
    (e.statsKey, e.lo, e.hi, e.kind, e.bloomKey,
      e.bloom.map(_.toSeq), e.statsKey2, e.lo2, e.hi2, e.rows,
      e.statsNulls, e.extraStats.filterNot(_._1.startsWith("__txn")),
      e.ndv.map { case (c, b) => (c, b.toSeq) }, e.colNulls)

  private def assertSameStats(on: Seq[SnapshotTable.FileEntry],
      off: Seq[SnapshotTable.FileEntry]): Unit = {
    assert(on.size == off.size,
      s"file count differs: inline=${on.size} two-pass=${off.size}")
    assert(on.forall(_.bytes.exists(_ > 0)), "inline entry without bytes")
    assert(on.map(key).sortBy(_.toString()) ==
      off.map(key).sortBy(_.toString()))
  }

  private def zoo = {
    import spark.implicits._
    spark.range(0, 1000).select(
      col("id"),
      (col("id") % 97).as("k"),
      when(col("id") % 13 === 0, lit(null))
        .otherwise(concat(lit("s"), col("id") % 37)).as("s"),
      (col("id") * 1.5 - 200).as("d"),
      col("id").cast("decimal(12,2)").as("m"),
      timestamp_seconds(col("id") * 3600).as("ts"))
  }

  test("clustered commit: inline stats == read-back stats") {
    val (on, off) = both(zoo, (root, df) =>
      SnapshotTable.commit(spark, root, df, clusterKey = Some("k")))
    assertSameStats(on, off)
    assert(on.forall(e => e.lo.isDefined && e.ndv.nonEmpty &&
      e.rows.isDefined))
  }

  test("clustered commit on each stat-sensitive type") {
    Seq("s", "d", "m", "ts").foreach { c =>
      val (on, off) = both(zoo, (root, df) =>
        SnapshotTable.commit(spark, root, df, clusterKey = Some(c),
          files = 4))
      assertSameStats(on, off)
    }
  }

  test("bloom + cluster commit: identical filter bytes") {
    val (on, off) = both(zoo, (root, df) =>
      SnapshotTable.commit(spark, root, df, clusterKey = Some("k"),
        bloomKey = Some("s")))
    assertSameStats(on, off)
    assert(on.forall(_.bloom.isDefined))
  }

  test("z-ordered commit: both curve columns' boxes match") {
    val (on, off) = both(zoo, (root, df) =>
      SnapshotTable.commitZOrdered(spark, root, df, "k", "d"))
    assertSameStats(on, off)
    assert(on.forall(e => e.lo2.isDefined && e.hi2.isDefined))
  }

  test("plain commit (no stats columns): entries carry rows + bytes") {
    val (on, off) = both(zoo,
      (root, df) => SnapshotTable.commit(spark, root, df))
    assertSameStats(on, off)
    assert(on.forall(e => e.lo.isEmpty && e.ndv.isEmpty))
  }

  test("bucketed grid commit: per-cell files, ranges, NDV match") {
    val (on, off) = both(zoo, (root, df) =>
      SnapshotTable.commitBucketedOn(spark, root, df,
        Seq(("k", 4), ("s", 3))): Unit)
    // old path orders by __b=N directory path, inline by file name —
    // compare as multisets (assertSameStats already sorts)
    assertSameStats(on, off)
    assert(on.forall(_.statsFor("__bucket").isDefined))
  }

  test("identity-partitioned commit: value-pure files match") {
    val df = zoo.withColumn("day",
      concat(lit("d"), col("id") % 5)).filter(col("s").isNotNull)
    val (on, off) = both(df, (root, d) =>
      SnapshotTable.commitPartitionedOn(spark, root, d,
        Seq("day", "s")): Unit)
    assertSameStats(on, off)
    assert(on.forall(e => e.lo == e.hi && e.colNulls.contains("s" -> 0L)))
  }

  test("empty batch stages a readable empty segment") {
    val root = tmp() + "/empty"
    SnapshotTable.commit(spark, root, zoo.filter(lit(false)),
      clusterKey = Some("k"))
    val out = SnapshotTable.read(spark, root)
    assert(out.count() == 0L && out.schema.fieldNames.contains("ts"))
  }
}
