package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** The CHANGELOG streaming source (`changes=true` on graft-snapshot):
  * micro-batches deliver row-level change events — inserts from added
  * data files, deletes from added merge-on-read tombstones — each
  * stamped `_change_type` / `_commit_version`, exactly-once across
  * restarts, with rewrites (compaction / COW) refused loudly. The
  * streaming twin of the catalog's `t.changes` / `t.delete_keys`. */
class ChangesStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-cdc").toString +
      "/t"

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-cdc-out").toString

  test("appends stream as inserts exactly once; a MOR update streams " +
      "as delete(key) + insert(new row) under one commit version; a " +
      "restart resumes without replay; compaction refuses loudly") {
    val root = tmpRoot()
    val outDir = tmpDir()
    val cp = tmpDir()
    SnapshotTable.commit(spark, root,
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v"))   // v1
    def startStream() = spark.readStream.format("graft-snapshot")
      .option("path", root).option("changes", "true").load()
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", cp).start()
    def events(): Seq[(Long, String, Long)] = spark.read.parquet(outDir)
      .select(col("k"), col("_change_type"), col("_commit_version"))
      .as[(Long, String, Long)].collect().sorted.toSeq

    val q = startStream()
    try {
      q.processAllAvailable()
      val first = events()
      assert(first.size == 100 && first.forall { case (_, t, v) =>
        t == "insert" && v == 1L }, s"v1 events: ${first.take(5)}")

      // append → inserts stamped v2
      SnapshotTable.append(spark, root,
        (101 to 120).map(i => (i.toLong, s"v$i")).toDF("k", "v")) // v2
      q.processAllAvailable()
      val v2 = events().filter(_._3 == 2L)
      assert(v2.map(_._1) == (101L to 120L) &&
        v2.forall(_._2 == "insert"), s"v2 events: $v2")

      // MOR update of keys 1..10 → delete(key) + insert(new) at v3
      SnapshotTable.mergeOnRead(spark, root,
        (1 to 10).map(i => (i.toLong, "upd")).toDF("k", "v"), "k") // v3
      q.processAllAvailable()
      val v3 = events().filter(_._3 == 3L)
      val (dels, ins) = v3.partition(_._2 == "delete")
      assert(dels.map(_._1) == (1L to 10L), s"deletes: $dels")
      assert(ins.map(_._1) == (1L to 10L) &&
        ins.forall(_._2 == "insert"), s"inserts: $ins")
      // delete events carry the key; data columns are NULL
      val delRows = spark.read.parquet(outDir)
        .filter(col("_change_type") === "delete")
      assert(delRows.filter(col("v").isNotNull).count() == 0,
        "delete events must not fabricate data columns")
    } finally q.stop()

    // restart on the same checkpoint: only the new commit flows
    SnapshotTable.append(spark, root,
      Seq((200L, "v200")).toDF("k", "v"))                       // v4
    val q2 = startStream()
    try {
      q2.processAllAvailable()
      assert(events().count(_._3 == 1L) == 100,
        "restart replayed version 1")
      val v4 = events().filter(_._3 == 4L)
      assert(v4 == Seq((200L, "insert", 4L)), s"v4 events: $v4")

      // compaction rewrites files: the changelog must refuse
      SnapshotTable.compact(spark, root, targetBytes = 1L << 30)
      SnapshotTable.append(spark, root,
        Seq((201L, "v201")).toDF("k", "v"))
      val failed = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] {
        q2.processAllAvailable()
      }
      val msg = failed.getMessage +
        Option(failed.getCause).flatMap(c =>
          Option(c.getMessage)).getOrElse("")
      assert(msg.contains("rewrote") || msg.contains("changelog"),
        s"expected the rewrite refusal, got: $failed")
    } finally q2.stop()
  }

  test("startingVersion composes with changes: 'N' begins at commit " +
      "N's events, 'latest' sees only post-start commits; batch " +
      "reads of the changes scan are refused with the pointer") {
    val root = tmpRoot()
    SnapshotTable.commit(spark, root,
      (1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "v"))    // v1
    SnapshotTable.append(spark, root,
      (51 to 60).map(i => (i.toLong, s"v$i")).toDF("k", "v"))   // v2

    val outDir = tmpDir()
    val q = spark.readStream.format("graft-snapshot")
      .option("path", root).option("changes", "true")
      .option("startingVersion", "2").load()
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", tmpDir()).start()
    try {
      q.processAllAvailable()
      val got = spark.read.parquet(outDir)
        .select(col("k"), col("_commit_version"))
        .as[(Long, Long)].collect().sorted.toSeq
      assert(got == (51L to 60L).map(_ -> 2L),
        s"startingVersion=2 must begin at v2's events: $got")
    } finally q.stop()

    // batch read refused (the batch surface is t.changes)
    val e = intercept[Exception] {
      spark.read.format("graft-snapshot").option("path", root)
        .option("changes", "true").load().collect()
    }
    assert(e.getMessage.contains("STREAMING") ||
      e.getMessage.contains("t.changes"), e.getMessage)
  }

  test("initial defaults apply to streamed change rows: files that " +
      "predate an ADD COLUMNS ... DEFAULT stream the declared " +
      "literal, exactly like batch reads of the same rows") {
    val warehouse = tmpDir()
    val root = s"$warehouse/db/t"
    SnapshotTable.commit(spark, root,
      (1 to 20).map(i => (i.toLong, s"v$i")).toDF("k", "v"))     // v1
    spark.conf.set("spark.sql.catalog.graftcdcd",
      classOf[graft.sources.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcdcd.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcdcd.db")
    spark.sql(
      "ALTER TABLE graftcdcd.db.t ADD COLUMNS (w DOUBLE DEFAULT 2.5)")
    SnapshotTable.append(spark, root,
      Seq((21L, "v21", 9.0)).toDF("k", "v", "w"))                // v3
    val outDir = tmpDir()
    val q = spark.readStream.format("graft-snapshot")
      .option("path", root).option("changes", "true").load()
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", tmpDir()).start()
    try {
      q.processAllAvailable()
      val ev = spark.read.parquet(outDir)
        .select(col("k"), col("w")).as[(Long, Double)]
        .collect().sorted.toSeq
      assert(ev == (1L to 20L).map(_ -> 2.5) :+ (21L -> 9.0),
        s"streamed defaults: $ev")
    } finally q.stop()
    // the plain append stream fills the same way
    val outDir2 = tmpDir()
    val q2 = spark.readStream.format("graft-snapshot")
      .option("path", root).load()
      .writeStream.format("parquet").option("path", outDir2)
      .option("checkpointLocation", tmpDir()).start()
    try {
      q2.processAllAvailable()
      assert(spark.read.parquet(outDir2)
        .filter(col("w").isNull).count() == 0,
        "append stream must fill initial defaults, not NULL")
    } finally q2.stop()
    spark.conf.unset("spark.sql.catalog.graftcdcd")
    spark.conf.unset("spark.sql.catalog.graftcdcd.warehouse")
  }

  test("preImages=true: delete events carry the FULL deleted rows " +
      "(stats-pruned read of the killed files), and a key deleted " +
      "twice pre-images each deletion with the right vintage") {
    val root = tmpRoot()
    SnapshotTable.commit(spark, root,
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v"),
      clusterKey = Some("k"))                                   // v1
    SnapshotTable.mergeOnRead(spark, root,
      (1 to 10).map(i => (i.toLong, "upd")).toDF("k", "v"), "k") // v2
    SnapshotTable.mergeOnRead(spark, root,
      (1 to 5).map(i => (i.toLong, "upd2")).toDF("k", "v"), "k") // v3
    val outDir = tmpDir()
    val q = spark.readStream.format("graft-snapshot")
      .option("path", root).option("changes", "true")
      .option("preImages", "true").load()
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", tmpDir()).start()
    try {
      q.processAllAvailable()
      val ev = spark.read.parquet(outDir)
        .select(col("k"), col("v"), col("_change_type"),
          col("_commit_version"))
        .as[(Long, String, String, Long)].collect().toSeq
      // v2's deletes carry the ORIGINAL rows...
      val d2 = ev.filter(e => e._3 == "delete" && e._4 == 2L).sorted
      assert(d2 == (1L to 10L).map(i => (i, s"v$i", "delete", 2L)),
        s"v2 deletes: $d2")
      // ...and v3's deletes carry v2's replacement rows, NOT the
      // originals (already dead before v3 — suppressed exactly)
      val d3 = ev.filter(e => e._3 == "delete" && e._4 == 3L).sorted
      assert(d3 == (1L to 5L).map(i => (i, "upd", "delete", 3L)),
        s"v3 deletes: $d3")
      // inserts unchanged: 100 + 10 + 5
      assert(ev.count(_._3 == "insert") == 115)
    } finally q.stop()
  }

  test("a changelog stream that began before a RENAME serves every " +
      "event kind under its run-start names: post-rename insert " +
      "files AND post-rename tombstones translate new-physical -> " +
      "old-logical") {
    val root = tmpRoot()
    SnapshotTable.commit(spark, root,
      (1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "v"),
      clusterKey = Some("k"))                                   // v1
    // schema pinned NOW, under the pre-rename names (k, v)
    val df = spark.readStream.format("graft-snapshot")
      .option("path", root).option("changes", "true").load()
    SnapshotTable.renameColumn(spark, root, "k", "id")          // v2
    SnapshotTable.append(spark, root,
      Seq((51L, "v51")).toDF("id", "v"))                        // v3
    SnapshotTable.mergeOnRead(spark, root,
      Seq((7L, "dead7")).toDF("id", "v"), "id")                 // v4
    val outDir = tmpDir()
    val q = df.writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", tmpDir()).start()
    try q.processAllAvailable() finally q.stop()
    val ev = spark.read.parquet(outDir)
      .select(col("k"), col("v"), col("_change_type"),
        col("_commit_version"))
      .as[(Option[Long], Option[String], String, Long)]
      .collect().toSeq
    // post-rename INSERT files surface their keys under 'k'
    assert(ev.filter(e => e._3 == "insert" && e._4 == 3L) ==
      Seq((Some(51L), Some("v51"), "insert", 3L)))
    assert(ev.filter(e => e._3 == "insert" && e._4 == 4L) ==
      Seq((Some(7L), Some("dead7"), "insert", 4L)))
    // the post-rename TOMBSTONE (key-only delete event, read from
    // the tombstone file itself) surfaces its key under 'k' too —
    // not as a silent NULL
    assert(ev.filter(_._3 == "delete") ==
      Seq((Some(7L), None, "delete", 4L)))
    // and the pre-rename backfill is untouched
    assert(ev.count(e => e._3 == "insert" && e._4 == 1L) == 50)
    assert(ev.forall(_._1.nonEmpty))
  }

  test("preImages across a KEY-COLUMN rename: a stream that began " +
      "before the rename resolves the tombstone's post-rename key " +
      "name through the epochs — delete events carry full rows " +
      "under the run-start names, stats intersection runs in each " +
      "file's own coordinate system") {
    val root = tmpRoot()
    SnapshotTable.commit(spark, root,
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v"),
      clusterKey = Some("k"))                                   // v1
    val df = spark.readStream.format("graft-snapshot")
      .option("path", root).option("changes", "true")
      .option("preImages", "true").load()        // names: (k, v)
    SnapshotTable.renameColumn(spark, root, "k", "id")          // v2
    // tombstones committed AFTER the rename store their key column
    // (and record their key-range stats) under 'id'
    SnapshotTable.mergeOnRead(spark, root,
      (1 to 5).map(i => (i.toLong, "upd")).toDF("id", "v"), "id") // v3
    val outDir = tmpDir()
    val q = df.writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", tmpDir()).start()
    try q.processAllAvailable() finally q.stop()
    val ev = spark.read.parquet(outDir)
      .select(col("k"), col("v"), col("_change_type"),
        col("_commit_version"))
      .as[(Long, String, String, Long)].collect().toSeq
    // full pre-image rows, original values, run-start column names
    val d = ev.filter(_._3 == "delete").sorted
    assert(d == (1L to 5L).map(i => (i, s"v$i", "delete", 3L)),
      s"pre-images across the key rename: $d")
    assert(ev.count(_._3 == "insert") == 105)
  }

  test("branch option: a changelog stream tails a BRANCH's commits " +
      "while the main stream stays at main's head; fast-forward then " +
      "delivers the merged commits to the main stream exactly once") {
    val root = tmpRoot()
    SnapshotTable.commit(spark, root,
      (1 to 10).map(i => (i.toLong, s"v$i")).toDF("k", "v"))    // v1
    SnapshotTable.createBranch(spark, root, "dev")
    SnapshotTable.append(spark, root,
      (11 to 15).map(i => (i.toLong, s"v$i")).toDF("k", "v"),
      branch = "dev")                                           // v2
    // the branch stream sees the base + the branch commit
    val devOut = tmpDir()
    val qDev = spark.readStream.format("graft-snapshot")
      .option("path", root).option("changes", "true")
      .option("branch", "dev").load()
      .writeStream.format("parquet").option("path", devOut)
      .option("checkpointLocation", tmpDir()).start()
    try {
      qDev.processAllAvailable()
      val dev = spark.read.parquet(devOut)
        .select(col("k"), col("_commit_version"))
        .as[(Long, Long)].collect().sorted.toSeq
      assert(dev == (1L to 10L).map(_ -> 1L) ++
        (11L to 15L).map(_ -> 2L), s"dev events: $dev")
    } finally qDev.stop()
    // the main stream sees only main's view...
    val mainOut = tmpDir()
    def mainStream() = spark.readStream.format("graft-snapshot")
      .option("path", root).option("changes", "true").load()
      .writeStream.format("parquet").option("path", mainOut)
      .option("checkpointLocation", s"$mainOut-cp").start()
    val qMain = mainStream()
    try {
      qMain.processAllAvailable()
      assert(spark.read.parquet(mainOut).count() == 10,
        "main stream must not see unmerged branch commits")
      // ...until the fast-forward, which delivers them exactly once
      SnapshotTable.fastForward(spark, root, "dev")
      qMain.processAllAvailable()
      val main = spark.read.parquet(mainOut)
        .select(col("k"), col("_commit_version"))
        .as[(Long, Long)].collect().sorted.toSeq
      assert(main == (1L to 10L).map(_ -> 1L) ++
        (11L to 15L).map(_ -> 2L), s"main events: $main")
    } finally qMain.stop()
    // the branch option also pins BATCH reads to the branch head
    assert(spark.read.format("graft-snapshot").option("path", root)
      .option("branch", "dev").load().count() == 15)
  }

  test("admission caps on a changelog stream clamp to whole-version " +
      "boundaries: no micro-batch ever splits a source version, the " +
      "cap still throttles across versions") {
    val root = tmpRoot()
    // three commits of 5 files each — a maxFilesPerTrigger far below
    // a version's file count would split versions on an append stream
    SnapshotTable.commit(spark, root,
      (1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "v")
        .repartition(5))                                        // v1
    SnapshotTable.append(spark, root,
      (51 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
        .repartition(5))                                        // v2
    SnapshotTable.append(spark, root,
      (101 to 150).map(i => (i.toLong, s"v$i")).toDF("k", "v")
        .repartition(5))                                        // v3
    val batches =
      scala.collection.mutable.ArrayBuffer.empty[Map[Long, Long]]
    val q = spark.readStream.format("graft-snapshot")
      .option("path", root).option("changes", "true")
      .option("maxFilesPerTrigger", "2")
      .load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val m = b.groupBy("_commit_version").count()
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        if (m.nonEmpty) batches.synchronized { batches += m }
        ()
      }
      .option("checkpointLocation", tmpDir()).start()
    try q.processAllAvailable() finally q.stop()
    val got = batches.synchronized { batches.toList }
    // the cap DID throttle: 15 files / cap 2 with version-boundary
    // rounding = one whole version per trigger, never all three at once
    assert(got.size >= 3, s"cap did not throttle: $got")
    // no version is split across batches...
    val owners = got.flatMap(_.keys)
    assert(owners.distinct.size == owners.size,
      s"a version appeared in two micro-batches: $got")
    // ...and every version arrived WHOLE, with all 50 of its rows
    val perVersion = got.flatten.toMap
    assert(perVersion == Map(1L -> 50L, 2L -> 50L, 3L -> 50L),
      s"per-version rows: $perVersion")
  }
}
