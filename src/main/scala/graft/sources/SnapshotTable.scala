package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot table over plain Parquet — the engine's answer to
  * the reference's Iceberg usage (`streaming-service/api.py:205-241`:
  * snapshot isolation, atomic commit, time travel), re-expressed with
  * nothing but a filesystem that has atomic rename/exclusive-create.
  *
  * Layout:
  * {{{
  *   <root>/v=1/          parquet data of snapshot 1 (immutable)
  *   <root>/v=2/          ...
  *   <root>/_commits/1    commit record: its EXISTENCE is the commit
  *   <root>/_commits/2    (one file per committed version, never rewritten)
  * }}}
  *
  * Commit protocol (per committer):
  *  1. stage data into `v.staging-<uuid>` — invisible to everyone.
  *  2. claim a version: N = max(committed, on-disk dir) + 1;
  *     `rename(staging, v=N)` — atomic, FAILS if a racing committer took
  *     N first, in which case re-read and go again (bounded retries).
  *  3. publish: exclusively create `_commits/N`. The commit log is
  *     append-only, one immutable file per version — there is NO shared
  *     mutable pointer, so no interleaving of writers can lose an update
  *     (the round-trip that a single rewritten pointer file cannot
  *     survive: slower committer A overwriting faster B's pointer).
  *
  * Why this shape scales / is safe:
  *  - Snapshots are immutable directories: a commit never touches data a
  *    reader might be scanning. A reader that resolved version N keeps
  *    scanning `v=N` regardless of later commits — snapshot isolation by
  *    immutability, no locks.
  *  - A crash between claim and publish leaves an orphan `v=N` directory
  *    with no commit record: invisible to readers, skipped (not
  *    resurrected) by later committers, reclaimable by `vacuum`.
  *  - All protocol steps are O(1) metadata ops (a listing of tiny files,
  *    two renames); data volume only affects step 1's parquet write.
  *  - Requires atomic rename + exclusive create (POSIX, HDFS). Object
  *    stores without them need a real catalog CAS — that is exactly the
  *    piece Iceberg's catalog adds, documented here as the limit rather
  *    than hidden.
  */
object SnapshotTable {

  final case class CommitConflict(msg: String) extends RuntimeException(msg)

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitsDir(root: String) = new Path(root, "_commits")

  private def versionDir(root: String, v: Long) = new Path(root, s"v=$v")

  /** Committed versions, ascending; empty for a fresh/absent table. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val cd = commitsDir(root)
    if (!f.exists(cd)) Seq.empty
    else f.listStatus(cd).toSeq.map(_.getPath.getName)
      .collect { case s if s.forall(_.isDigit) => s.toLong }.sorted
  }

  /** Latest committed version; 0 if the table has none. */
  def currentVersion(spark: SparkSession, root: String): Long =
    versions(spark, root).lastOption.getOrElse(0L)

  /** Highest `v=N` directory on disk (claimed, committed or orphaned) —
    * the claim floor, so orphans are skipped instead of fought over. */
  private def maxDirVersion(f: FileSystem, root: String): Long = {
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) 0L
    else f.listStatus(rootPath).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("v=") &&
        s.stripPrefix("v=").forall(_.isDigit) => s.stripPrefix("v=").toLong }
      .foldLeft(0L)(math.max)
  }

  /** Commit `df` as the next snapshot; returns the committed version. */
  def commit(spark: SparkSession, root: String, df: DataFrame,
      maxRetries: Int = 5): Long = {
    val f = fs(spark, root)
    val staging = new Path(root,
      s"v.staging-${java.util.UUID.randomUUID().toString.take(8)}")
    df.write.mode("overwrite").parquet(staging.toString)
    f.mkdirs(commitsDir(root))
    var attempt = 0
    while (attempt <= maxRetries) {
      val next = math.max(currentVersion(spark, root),
        maxDirVersion(f, root)) + 1
      // the claim: atomic rename fails iff a racing committer took `next`
      if (f.rename(staging, versionDir(root, next))) {
        publish(f, root, next)
        spark.catalog.refreshByPath(root)
        return next
      }
      attempt += 1
    }
    f.delete(staging, true)
    throw CommitConflict(s"lost the version claim $maxRetries times at $root")
  }

  /** Exclusive create of the commit record — its existence IS the commit. */
  private def publish(f: FileSystem, root: String, v: Long): Unit = {
    val rec = new Path(commitsDir(root), v.toString)
    val out = f.create(rec, false) // overwrite=false: exclusive
    try out.write(Array.emptyByteArray) finally out.close()
  }

  /** Read the current snapshot. */
  def read(spark: SparkSession, root: String): DataFrame =
    readVersion(spark, root, currentVersion(spark, root))

  /** Time travel: read snapshot `v` as of its commit. */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame = {
    require(versions(spark, root).contains(v),
      s"version $v is not committed at $root")
    spark.read.parquet(versionDir(root, v).toString)
  }

  /** Drop all snapshots older than the newest `keep`. Returns the
    * versions deleted. Record first, then data: a reader can never
    * resolve a version whose data is already gone. Expiry is the ONLY
    * operation that can invalidate an in-flight reader (one still
    * scanning the expired directory), which is why retention is a policy
    * knob and not automatic. */
  def expireSnapshots(spark: SparkSession, root: String, keep: Int)
  : Seq[Long] = {
    require(keep >= 1, "must keep at least the current snapshot")
    val f = fs(spark, root)
    val doomed = versions(spark, root).dropRight(keep)
    doomed.foreach { v =>
      f.delete(new Path(commitsDir(root), v.toString), false)
      f.delete(versionDir(root, v), true)
    }
    doomed
  }

  /** Remove orphan directories (claimed but never published — crashed
    * commits) and stale staging dirs. Safe at any time: neither is
    * reachable by readers. Returns the paths removed. */
  def vacuum(spark: SparkSession, root: String): Seq[String] = {
    val f = fs(spark, root)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) return Seq.empty
    val committed = versions(spark, root).toSet
    val doomed = f.listStatus(rootPath).toSeq.map(_.getPath).filter { p =>
      val n = p.getName
      n.startsWith("v.staging-") ||
        (n.startsWith("v=") && n.stripPrefix("v=").forall(_.isDigit) &&
          !committed(n.stripPrefix("v=").toLong))
    }
    doomed.foreach(f.delete(_, true))
    doomed.map(_.toString)
  }
}
