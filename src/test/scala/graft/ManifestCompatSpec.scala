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
