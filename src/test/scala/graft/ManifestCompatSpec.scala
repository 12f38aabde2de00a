package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** Manifest format compatibility: the line format is tab-separated
  * with trailing fields added over time (NDV sketches = field 15,
  * per-column null counts = field 16). A reader must parse manifests
  * written by OLDER code (fewer fields → empty stats, never an
  * error), and the full current field set must round-trip. */
class ManifestCompatSpec extends SparkSpec {
  import spark.implicits._

  test("a pre-stats manifest (14 fields) still reads: entries parse " +
      "with empty NDV/null stats and the data reads bit-equal") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-compat").toString + "/t"
    SnapshotTable.commit(spark, root,
      (1 to 500).map(i => (i.toLong, s"s$i")).toDF("k", "s"),
      clusterKey = Some("k"))
    val v = SnapshotTable.currentVersion(spark, root)
    val before = SnapshotTable.manifest(spark, root, v)
    assert(before.forall(_.ndv.nonEmpty), "auto mode should sketch k")
    val want = SnapshotTable.read(spark, root).collect().toSet

    // rewrite the manifest as the pre-round-10 format would have
    // written it: strip every field past the extra-stats slot
    val p = java.nio.file.Paths.get(s"$root/_manifests/$v")
    val old = java.nio.file.Files.readString(p).split('\n').map { l =>
      if (l.isEmpty || l.startsWith("#") || !l.contains('\t') ||
        l.count(_ == '\t') < 5) l
      else l.split('\t').take(14).mkString("\t")
    }.mkString("\n")
    java.nio.file.Files.writeString(p, old)
    // hadoop's LocalFileSystem keeps a checksum sidecar; the rewrite
    // invalidates it (test-only surgery — real readers never edit)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$root/_manifests/.$v.crc"))
    spark.catalog.refreshByPath(root)

    val after = SnapshotTable.manifest(spark, root, v)
    assert(after.map(_.path) == before.map(_.path))
    assert(after.forall(e => e.ndv.isEmpty && e.colNulls.isEmpty),
      "stripped fields must parse as empty, not fail")
    assert(after.map(e => (e.statsKey, e.lo, e.hi, e.rows)) ==
      before.map(e => (e.statsKey, e.lo, e.hi, e.rows)),
      "pre-existing fields must survive the truncation")
    assert(SnapshotTable.read(spark, root).collect().toSet == want)
    assert(SnapshotTable.ndvEstimates(after).isEmpty)
    // ...and analyze backfills the missing stats incrementally
    val (_, cols, n) = SnapshotTable.analyze(spark, root)
    assert(cols == Seq("k", "s") && n == after.count(_.kind == "d"))
    assert(SnapshotTable.ndvEstimates(SnapshotTable.manifest(spark,
      root, SnapshotTable.currentVersion(spark, root)))
      .contains("k"))
  }

  test("the current full field set round-trips through a manifest " +
      "write/read (ndv registers byte-equal, null counts intact)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-compat2").toString + "/t"
    SnapshotTable.commit(spark, root,
      (1 to 300).map(i => (i.toLong, i % 7, s"s$i"))
        .toDF("k", "m", "s"), clusterKey = Some("k"))
    SnapshotTable.analyze(spark, root)
    val v = SnapshotTable.currentVersion(spark, root)
    val entries = SnapshotTable.manifest(spark, root, v)
    entries.filter(_.kind == "d").foreach { e =>
      assert(e.ndv.map(_._1).toSet == Set("k", "m", "s"), e.path)
      e.ndv.foreach { case (_, regs) =>
        assert(regs.length == 512, s"register width ${regs.length}") }
      assert(e.colNulls.map(_._1).toSet == Set("k", "m", "s"))
      assert(e.colNulls.forall(_._2 == 0L))
      // analyze recorded numeric ranges for the non-key numeric col
      assert(e.statsFor("m").isDefined, s"no range for m on ${e.path}")
    }
    // byte lengths are stamped at commit and round-trip exactly
    val f = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    entries.foreach { e =>
      assert(e.bytes.contains(f.getFileStatus(
        new org.apache.hadoop.fs.Path(root, e.path)).getLen),
        s"bytes not stamped for ${e.path}: ${e.bytes}")
    }
  }

  private def manifestTag(root: String, v: Long): String =
    java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$root/_manifests/$v")).get(0)

  private def manifestLineCount(root: String, v: Long): Long =
    java.nio.file.Files.lines(
      java.nio.file.Paths.get(s"$root/_manifests/$v")).count()

  test("appends write DELTA manifests: O(batch) lines per commit " +
      "(v3 tag + #base), resolution reproduces the full entry set " +
      "byte-for-byte, chains survive expiry of interior versions, " +
      "and compaction resets the chain with a full manifest") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-delta").toString + "/t"
    SnapshotTable.commit(spark, root,
      (1 to 2000).map(i => (i.toLong, s"s$i")).toDF("k", "s"),
      clusterKey = Some("k"), files = 8)
    assert(manifestTag(root, 1L) == "graft-manifest-v2")
    val fullLines = manifestLineCount(root, 1L)
    // five 1-file appends: each manifest must carry the DELTA only
    (1 to 5).foreach { i =>
      SnapshotTable.append(spark, root,
        Seq((10000L + i, s"a$i")).toDF("k", "s"))
    }
    (2L to 6L).foreach { v =>
      assert(manifestTag(root, v) == "graft-manifest-v3",
        s"append v$v should be a delta")
      assert(manifestLineCount(root, v) <= 4,
        s"delta v$v should be O(batch): ${manifestLineCount(root, v)} " +
          s"lines vs full $fullLines")
    }
    // resolution: the delta chain reads exactly the accumulated table
    assert(SnapshotTable.read(spark, root).count() == 2005)
    val entries = SnapshotTable.manifest(spark, root, 6L)
    assert(entries.count(_.kind == "d") == 13, // 8 + 5 appends
      entries.map(_.path).mkString(","))
    assert(entries.forall(_.bytes.isDefined),
      "delta-resolved entries must keep their stamped stats")
    // time travel through the chain still works at every version
    (1L to 6L).foreach { v =>
      assert(SnapshotTable.readVersion(spark, root, v).count() ==
        2000 + (v - 1), s"version $v")
    }
    // EXPIRE interior versions: survivors chain through them, so
    // their manifest FILES must remain as resolution bases even
    // though the versions become unreachable
    val gone = SnapshotTable.expireSnapshots(spark, root, keep = 2)
    assert(gone == Seq(1L, 2L, 3L, 4L))
    assert(SnapshotTable.read(spark, root).count() == 2005,
      "current read must survive expiry of its delta bases")
    assert(SnapshotTable.manifest(spark, root, 6L)
      .count(_.kind == "d") == 13)
    intercept[Exception](SnapshotTable.readVersion(spark, root, 3L))
    // vacuum must not reap the kept base manifests either
    SnapshotTable.vacuum(spark, root, minAgeMs = 0L)
    assert(SnapshotTable.read(spark, root).count() == 2005,
      "vacuum reaped a manifest a survivor resolves through")
    // compaction rewrites everything -> full manifest, chain reset
    SnapshotTable.compact(spark, root, clusterKey = Some("k"))
    val cur = SnapshotTable.currentVersion(spark, root)
    assert(manifestTag(root, cur) == "graft-manifest-v2",
      "compaction must reset the delta chain with a full manifest")
    assert(SnapshotTable.read(spark, root).count() == 2005)
  }

  test("the delta-chain depth is CAPPED: a long run of appends " +
      "periodically writes a full manifest so a cold read never " +
      "walks an unbounded chain") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-deltacap").toString + "/t"
    SnapshotTable.commit(spark, root,
      Seq((0L, "s0")).toDF("k", "s"))
    (1 to 40).foreach { i =>
      SnapshotTable.append(spark, root,
        Seq((i.toLong, s"s$i")).toDF("k", "s"))
    }
    val tags = (1L to 41L).map(v => manifestTag(root, v))
    assert(tags.count(_ == "graft-manifest-v2") >= 2,
      s"40 appends must include a mid-chain full rewrite: $tags")
    assert(SnapshotTable.read(spark, root).count() == 41)
  }

  test("a pre-bytes manifest (16 fields) parses with bytes=None and " +
      "analyze backfills the lengths METADATA-ONLY: zero data files " +
      "re-read, every entry stamped with its true size") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-compat3").toString + "/t"
    SnapshotTable.commit(spark, root,
      (1 to 400).map(i => (i.toLong, s"s$i")).toDF("k", "s"),
      clusterKey = Some("k"))
    SnapshotTable.analyze(spark, root) // sketches complete
    val v = SnapshotTable.currentVersion(spark, root)
    val p = java.nio.file.Paths.get(s"$root/_manifests/$v")
    val old = java.nio.file.Files.readString(p).split('\n').map { l =>
      if (l.isEmpty || l.startsWith("#") || !l.contains('\t') ||
        l.count(_ == '\t') < 5) l
      else l.split('\t').take(16).mkString("\t")
    }.mkString("\n")
    java.nio.file.Files.writeString(p, old)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$root/_manifests/.$v.crc"))
    spark.catalog.refreshByPath(root)
    val stripped = SnapshotTable.manifest(spark, root, v)
    assert(stripped.forall(_.bytes.isEmpty),
      "field-16 truncation must parse as no-bytes")
    assert(stripped.forall(_.ndv.nonEmpty), "ndv must survive")
    // backfill: the sketches are complete, so analyze must touch no
    // data — n == 0 files read — yet still commit stamped bytes
    val (v2, _, n) = SnapshotTable.analyze(spark, root)
    assert(n == 0L, s"bytes backfill re-read $n data files")
    assert(v2 > v, "backfill must land as a new metadata version")
    val f = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    SnapshotTable.manifest(spark, root, v2).foreach { e =>
      assert(e.bytes.contains(f.getFileStatus(
        new org.apache.hadoop.fs.Path(root, e.path)).getLen),
        s"backfill missed ${e.path}")
    }
  }
}
