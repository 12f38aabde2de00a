package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** TableCatalog over snapshot roots
  * (sources/connector/GraftCatalog): SQL names snapshot tables
  * directly — CREATE / CTAS / INSERT INTO / INSERT OVERWRITE /
  * VERSION AS OF / TIMESTAMP AS OF / ALTER TABLE ADD COLUMNS / DROP —
  * every data path still landing through the claim/publish protocol
  * and reading through the pruning connector scan. */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse =
    java.nio.file.Files.createTempDirectory("graft-cat").toString

  // register the catalog once, before any test body runs
  locally {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
  }

  test("CREATE TABLE + INSERT INTO + SELECT: DDL mints version 1 " +
      "(schema only), the insert CAS-appends version 2, and SQL " +
      "reads through the connector scan") {
    spark.sql("CREATE TABLE graft.db.pts (k BIGINT, tag STRING)")
    val root = s"$warehouse/db/pts"
    assert(SnapshotTable.currentVersion(spark, root) == 1L)
    assert(spark.sql("SELECT * FROM graft.db.pts").count() == 0)

    spark.sql(
      "INSERT INTO graft.db.pts VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    assert(SnapshotTable.currentVersion(spark, root) == 2L)
    assert(spark.sql(
      "SELECT tag FROM graft.db.pts ORDER BY k")
      .collect().map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    // the native API sees exactly what SQL wrote
    assert(SnapshotTable.read(spark, root).count() == 3)
  }

  test("CTAS from a testdata table, then SHOW TABLES lists it and a " +
      "filtered SQL read prunes files through the connector scan") {
    val orders = Tables.load(spark, sfDir, "orders")
    orders.createOrReplaceTempView("orders_src")
    // CTAS through the catalog: create + append in one statement
    spark.sql(
      """CREATE TABLE graft.db.orders_ctas AS
        |SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        |FROM orders_src""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM graft.db.orders_ctas")
      .collect()(0).getLong(0) == orders.count())
    val listed = spark.sql("SHOW TABLES IN graft.db").collect()
      .map(_.getString(1))
    assert(listed.contains("orders_ctas"), listed.mkString(","))
  }

  test("VERSION AS OF and TIMESTAMP AS OF resolve through the commit " +
      "log in SQL") {
    spark.sql("CREATE TABLE graft.db.tt (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.db.tt VALUES (1, 'first')")   // v2
    val root = s"$warehouse/db/tt"
    val t2 = SnapshotTable.commitTime(spark, root, 2L)
    Thread.sleep(1100) // commit-time resolution is second-granular
    spark.sql("INSERT INTO graft.db.tt VALUES (2, 'second')")  // v3

    assert(spark.sql("SELECT * FROM graft.db.tt").count() == 2)
    assert(spark.sql("SELECT * FROM graft.db.tt VERSION AS OF 2")
      .count() == 1)
    val tsLit = new java.sql.Timestamp(t2).toString
    assert(spark.sql(
      s"SELECT * FROM graft.db.tt TIMESTAMP AS OF '$tsLit'")
      .count() == 1)
  }

  test("INSERT OVERWRITE truncate-replaces; prior version stays " +
      "readable") {
    spark.sql("CREATE TABLE graft.db.ow (k BIGINT)")
    spark.sql("INSERT INTO graft.db.ow VALUES (1), (2), (3)")
    spark.sql("INSERT OVERWRITE graft.db.ow VALUES (9)")
    assert(spark.sql("SELECT * FROM graft.db.ow").collect()
      .map(_.getLong(0)).toSeq == Seq(9L))
    assert(spark.sql("SELECT * FROM graft.db.ow VERSION AS OF 2")
      .count() == 3)
  }

  test("ALTER TABLE ADD COLUMNS is a metadata-only commit: zero data " +
      "moved, old rows read NULL, and the next insert fills the " +
      "column") {
    spark.sql("CREATE TABLE graft.db.ev (k BIGINT)")
    spark.sql("INSERT INTO graft.db.ev VALUES (1), (2)")
    val root = s"$warehouse/db/ev"
    val filesBefore = SnapshotTable.manifest(spark, root, 2L)
      .map(_.path).toSet

    spark.sql("ALTER TABLE graft.db.ev ADD COLUMNS (note STRING)")
    assert(SnapshotTable.currentVersion(spark, root) == 3L)
    assert(SnapshotTable.manifest(spark, root, 3L).map(_.path).toSet ==
      filesBefore, "ADD COLUMNS must not touch data files")

    spark.sql("INSERT INTO graft.db.ev VALUES (3, 'filled')")
    val rows = spark.sql(
      "SELECT k, note FROM graft.db.ev ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0),
      Option(r.getString(1)))).toSeq ==
      Seq((1L, None), (2L, None), (3L, Some("filled"))))
  }

  test("writeTo append lands through the catalog; DROP TABLE removes " +
      "it; rename moves the root") {
    spark.sql("CREATE TABLE graft.db.wt (k BIGINT, v DOUBLE)")
    (1 to 50).map(i => (i.toLong, i / 2.0)).toDF("k", "v")
      .writeTo("graft.db.wt").append()
    assert(spark.table("graft.db.wt").count() == 50)

    // the rename target resolves INSIDE the catalog: name it db.wt2
    spark.sql("ALTER TABLE graft.db.wt RENAME TO db.wt2")
    assert(spark.table("graft.db.wt2").count() == 50)
    assert(!spark.catalog.tableExists("graft.db.wt"))

    spark.sql("DROP TABLE graft.db.wt2")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$warehouse/db/wt2")))
  }

  test("SQL DELETE FROM removes exactly the matching rows through " +
      "the file-pruned delete; prior versions still time-travel, and " +
      "a stats-clustered range delete stays metadata-only") {
    spark.sql("CREATE TABLE graft.db.del (k BIGINT, v DOUBLE)")
    val root = s"$warehouse/db/del"
    // cluster through the native API so files carry stats: a range
    // DELETE can then drop whole files without opening them
    SnapshotTable.append(spark, root,
      (1 to 8000).map(i => (i.toLong, i / 2.0)).toDF("k", "v"),
      clusterKey = Some("k"), files = 8)
    val before = SnapshotTable.manifest(spark, root, 2L)
    val mtimes = before.map { e =>
      e.path -> java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(s"$root/${e.path}")).toMillis
    }.toMap
    val hi0 = before.map(_.hi.get.toLong).min
    spark.sql(s"DELETE FROM graft.db.del WHERE k <= $hi0")
    assert(spark.table("graft.db.del").count() == 8000 - hi0)
    assert(spark.sql(s"SELECT count(*) FROM graft.db.del WHERE k <= $hi0")
      .collect()(0).getLong(0) == 0)
    // the wholly-covered file left by manifest edit; every survivor
    // carries over untouched (path+mtime identity = zero data IO)
    val after = SnapshotTable.manifest(spark, root, 3L)
    assert(after.size == before.size - 1,
      s"expected one dropped file: ${before.size} -> ${after.size}")
    after.foreach { e =>
      assert(mtimes.get(e.path).exists(_ ==
        java.nio.file.Files.getLastModifiedTime(
          java.nio.file.Paths.get(s"$root/${e.path}")).toMillis),
        s"SQL DELETE rewrote carried file ${e.path}")
    }
    // time travel still reads the pre-delete state
    assert(spark.sql(
      "SELECT count(*) FROM graft.db.del VERSION AS OF 2")
      .collect()(0).getLong(0) == 8000)
  }

  test("SQL DELETE with an untranslatable predicate routes to the " +
      "group-based copy-on-write path (it used to be refused) and " +
      "deletes exactly the matching rows") {
    spark.sql("CREATE TABLE graft.db.delref (k BIGINT)")
    spark.sql("INSERT INTO graft.db.delref VALUES (1), (2), (3), (4)")
    // `k % 2 = 0` has no sources.Filter translation, so canDeleteWhere
    // refuses the metadata path — with SupportsRowLevelOperations the
    // statement now executes as a group rewrite instead of erroring
    spark.sql("DELETE FROM graft.db.delref WHERE k % 2 = 0")
    assert(spark.table("graft.db.delref").collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L, 3L))
    // and the translatable path is unaffected: still metadata-tier
    spark.sql("DELETE FROM graft.db.delref WHERE k = 3")
    assert(spark.table("graft.db.delref").collect().map(_.getLong(0))
      .toSeq == Seq(1L))
  }

  test("SQL metadata tables: t.history walks the commit log, t.files " +
      "lists the current manifest with stats, t.properties shows " +
      "TBLPROPERTIES — all driver-side, zero data IO") {
    spark.sql(
      """CREATE TABLE graft.db.meta (k BIGINT, v DOUBLE)
        |TBLPROPERTIES ('write.merge.key'='k')""".stripMargin)
    val root = s"$warehouse/db/meta"
    SnapshotTable.append(spark, root,
      (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("k", "v"),
      clusterKey = Some("k"), files = 2)                       // v2
    spark.sql("INSERT INTO graft.db.meta VALUES (101, 101.0)")  // v3

    val hist = spark.sql("SELECT * FROM graft.db.meta.history").collect()
    assert(hist.length == 3, s"expected 3 versions, got ${hist.length}")

    val files = spark.sql(
      "SELECT path, kind, rows FROM graft.db.meta.files").collect()
    assert(files.count(_.getString(1) == "d") == 3) // 2 clustered + 1
    assert(files.map(_.getLong(2)).sum == 101)

    val props = spark.sql(
      "SELECT * FROM graft.db.meta.properties").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("write.merge.key") == "k")

    // t.manifests: chain observability — the CREATE and the first
    // append are full manifests (no parent / empty parent), the
    // catalog INSERT appends as a delta on v2
    val mans = spark.sql(
      "SELECT version, form, base, depth FROM graft.db.meta.manifests " +
        "ORDER BY version").collect()
    assert(mans.length == 3)
    assert(mans(0).getString(1) == "full" && mans(0).getInt(3) == 0)
    assert(mans(2).getString(1) == "delta" &&
      mans(2).getLong(2) == 2L && mans(2).getInt(3) >= 1,
      s"INSERT should land as a delta on v2: ${mans.mkString(",")}")

    // a REAL table named like a metadata kind shadows it
    spark.sql("CREATE TABLE graft.db.history (x BIGINT)")
    spark.sql("INSERT INTO graft.db.history VALUES (7)")
    assert(spark.sql("SELECT * FROM graft.db.history")
      .head().getLong(0) == 7)
  }

  test("t.partitions: one zero-IO row per CURRENT-spec tuple from " +
      "per-file purity facts — rows/files/bytes match the data, an " +
      "unpartitioned table is one NULL-partition row, pre-evolution " +
      "files aggregate under NULL, MOR tombstones flip `stale`, and " +
      "the table pins to VERSION AS OF") {
    spark.sql("CREATE TABLE graft.db.ptab (id BIGINT, day STRING, " +
      "tenant STRING, v DOUBLE) PARTITIONED BY (day, tenant) " +
      "TBLPROPERTIES ('write.merge.key'='id', " +
      "'write.delete.mode'='merge-on-read')")
    val src = (1 to 6000).map(i =>
      (i.toLong, s"d${i % 3}", s"t${i % 2}", i * 1.0))
      .toDF("id", "day", "tenant", "v")
    src.createOrReplaceTempView("ptab_src")
    spark.sql("INSERT INTO graft.db.ptab SELECT * FROM ptab_src")

    val got = spark.sql(
      "SELECT partition['day'] AS day, partition['tenant'] AS tenant, " +
        "rows, files, bytes, stale FROM graft.db.ptab.partitions " +
        "ORDER BY day, tenant").collect()
    val want = src.groupBy("day", "tenant").count()
      .orderBy("day", "tenant")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.length == 6)
    assert(got.map(r => (r.getString(0), r.getString(1),
      r.getLong(2))).toSeq == want.toSeq)
    assert(got.forall(r => r.getLong(3) >= 1 && r.getLong(4) > 0 &&
      !r.getBoolean(5)))

    // the pinned PRE-insert manifest has no data files at all
    assert(spark.sql(
      "SELECT * FROM graft.db.ptab.partitions VERSION AS OF 1")
      .count() == 0)

    // unpartitioned table: the whole manifest is one NULL-tuple row
    spark.sql("CREATE TABLE graft.db.punp (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.db.punp VALUES (1, 1.0), (2, 2.0)")
    val unp = spark.sql(
      "SELECT partition, rows FROM graft.db.punp.partitions").collect()
    assert(unp.length == 1 && unp.head.isNullAt(0) &&
      unp.head.getLong(1) == 2)

    // spec evolution: files from the (day)-era are not pure on the
    // new (day, tenant) tuple — they aggregate under partition NULL
    // while the new era reports its tuples
    spark.sql("CREATE TABLE graft.db.pevo (id BIGINT, day STRING, " +
      "tenant STRING) PARTITIONED BY (day)")
    spark.sql("INSERT INTO graft.db.pevo VALUES " +
      "(1, 'd0', 'ta'), (2, 'd0', 'tb'), (3, 'd1', 'ta')")
    spark.sql("ALTER TABLE graft.db.pevo SET TBLPROPERTIES " +
      "('graft.partition.key'='day,tenant')")
    spark.sql("INSERT INTO graft.db.pevo VALUES (4, 'd2', 'tc')")
    val evo = spark.sql(
      "SELECT partition, rows FROM graft.db.pevo.partitions").collect()
    val (legacy, tupled) = evo.partition(_.isNullAt(0))
    assert(legacy.map(_.getLong(1)).sum == 3,
      s"old-era rows misattributed: ${evo.mkString(",")}")
    assert(tupled.length == 1 &&
      tupled.head.getMap[String, String](0).toMap ==
        Map("day" -> "d2", "tenant" -> "tc") &&
      tupled.head.getLong(1) == 1)

    // a MOR delete leaves footer counts over-counting: stale flips,
    // the physical numbers stay the recorded ones
    spark.sql("DELETE FROM graft.db.ptab WHERE id = 17")
    val afterDel = spark.sql(
      "SELECT rows, stale FROM graft.db.ptab.partitions").collect()
    assert(afterDel.forall(_.getBoolean(1)),
      "tombstones present but stale not flagged")
    assert(afterDel.map(_.getLong(0)).sum == 6000)
  }

  test("PARTITIONED BY + TBLPROPERTIES together keep BOTH: the " +
      "layout declaration survives the property persistence (it was " +
      "once wiped by a non-merging set) and the first INSERT lands " +
      "inside the declared layout") {
    spark.sql("CREATE TABLE graft.db.lay_b (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, k)) " +
      "TBLPROPERTIES ('write.merge.key'='k')")
    val broot = s"$warehouse/db/lay_b"
    val bprops = SnapshotTable.tableProperties(spark, broot)
    assert(bprops.get("graft.bucket.key").contains("k") &&
      bprops.get("write.merge.key").contains("k"),
      s"layout or property lost: $bprops")
    spark.sql("INSERT INTO graft.db.lay_b " +
      "SELECT id, id * 1.0 FROM range(1, 200)")
    val bman = SnapshotTable.manifest(spark, broot,
      SnapshotTable.currentVersion(spark, broot))
    assert(bman.filter(_.kind == "d").forall(
      _.statsFor("__bucket").isDefined),
      "INSERT landed outside the declared bucket grid")
  }

  test("metadata tables pin to VERSION AS OF: t.files lists the OLD " +
      "manifest, t.history stops at the pinned commit, and " +
      "properties (unversioned side file) refuses the pin") {
    spark.sql("CREATE TABLE graft.db.metav (k BIGINT, v DOUBLE)")
    val root = s"$warehouse/db/metav"
    SnapshotTable.append(spark, root,
      (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("k", "v"),
      clusterKey = Some("k"), files = 2)                       // v2
    Thread.sleep(20) // distinct commit mtimes for the TIMESTAMP pin
    spark.sql("INSERT INTO graft.db.metav VALUES (101, 101.0)") // v3

    // v2's manifest: exactly the 2 clustered files, 100 rows
    val filesV2 = spark.sql(
      "SELECT path, rows FROM graft.db.metav.files VERSION AS OF 2")
      .collect()
    assert(filesV2.length == 2, s"v2 had 2 files, got ${filesV2.length}")
    assert(filesV2.map(_.getLong(1)).sum == 100)
    // current manifest still shows all 3
    assert(spark.sql("SELECT * FROM graft.db.metav.files")
      .count() == 3)
    // history pinned at 2 excludes the later commit
    val histV2 = spark.sql(
      "SELECT version FROM graft.db.metav.history VERSION AS OF 2")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(histV2 == Seq(1L, 2L))
    // TIMESTAMP AS OF resolves metadata tables too: pinned at v2's
    // commit instant, files lists v2's manifest
    val t2 = SnapshotTable.commitTime(spark, root, 2L)
    val tsLit = new java.sql.Timestamp(t2).toString
    assert(spark.sql(
      s"SELECT count(*) FROM graft.db.metav.files " +
        s"TIMESTAMP AS OF '$tsLit'").head().getLong(0) == 2L)
    // an uncommitted pin is refused
    val badPin = intercept[Exception](spark.sql(
      "SELECT * FROM graft.db.metav.files VERSION AS OF 99").collect())
    assert(badPin.getMessage.contains("not committed"))
    // properties cannot time-travel — the side file is unversioned
    val badProps = intercept[Exception](spark.sql(
      "SELECT * FROM graft.db.metav.properties VERSION AS OF 2")
      .collect())
    assert(badProps.getMessage.contains("side file"))
  }

  test("tags: VERSION AS OF '<name>' resolves a named snapshot, " +
      "expiry refuses to reap tagged versions, t.refs lists them, " +
      "CALL tag/drop_tag manage them") {
    spark.sql("CREATE TABLE graft.db.tags (k BIGINT)")        // v1
    val root = s"$warehouse/db/tags"
    spark.sql("INSERT INTO graft.db.tags VALUES (1), (2)")    // v2
    spark.sql("INSERT INTO graft.db.tags VALUES (3)")         // v3
    spark.sql("INSERT INTO graft.db.tags VALUES (4)")         // v4

    val tagged = spark.sql(
      "CALL graft.system.tag('db.tags', 'baseline', 2)").head()
    assert(tagged.getString(0) == "baseline" && tagged.getLong(1) == 2L)
    // the name reads the pinned snapshot
    assert(spark.sql(
      "SELECT count(*) FROM graft.db.tags VERSION AS OF 'baseline'")
      .head().getLong(0) == 2L)
    // and lists in refs
    val refs = spark.sql("SELECT * FROM graft.db.tags.refs").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(refs == Map("baseline" -> 2L))
    // a metadata table pinned BY TAG resolves through the same name
    assert(spark.sql(
      "SELECT count(*) FROM graft.db.tags.files VERSION AS OF " +
        "'baseline'").head().getLong(0) ==
      SnapshotTable.manifest(spark, root, 2L).size.toLong)
    // numeric names are refused (they would shadow version numbers)
    val bad = intercept[Exception](
      SnapshotTable.tag(spark, root, "123", 2L))
    assert(bad.getMessage.contains("bad tag name"))
    // expiry keeps the tagged version alive and reaps the rest
    spark.sql("CALL graft.system.expire_snapshots('db.tags', 1)")
    assert(SnapshotTable.versions(spark, root) == Seq(2L, 4L),
      SnapshotTable.versions(spark, root).toString)
    assert(spark.sql(
      "SELECT count(*) FROM graft.db.tags VERSION AS OF 'baseline'")
      .head().getLong(0) == 2L)
    // unknown tags error with the available names
    val unknown = intercept[Exception](spark.sql(
      "SELECT * FROM graft.db.tags VERSION AS OF 'nope'").collect())
    assert(unknown.getMessage.contains("neither a version number, " +
      "a tag nor a branch"), unknown.getMessage)
    // drop_tag releases the pin: the next expiry reaps v2
    assert(spark.sql(
      "CALL graft.system.drop_tag('db.tags', 'baseline')")
      .head().getBoolean(0))
    spark.sql("CALL graft.system.expire_snapshots('db.tags', 1)")
    assert(SnapshotTable.versions(spark, root) == Seq(4L))
  }

  test("ENFORCED CHECK constraints: declared at CREATE TABLE, " +
      "enforced on INSERT and UPDATE (violating writes abort with no " +
      "partial state), managed via ALTER TABLE ADD/DROP CONSTRAINT") {
    spark.sql(
      """CREATE TABLE graft.db.chk (k BIGINT, v DOUBLE,
        |CONSTRAINT pos_k CHECK (k > 0))""".stripMargin)
    val root = s"$warehouse/db/chk"
    spark.sql("INSERT INTO graft.db.chk VALUES (1, 1.0), (2, 2.0)")
    assert(spark.table("graft.db.chk").count() == 2)
    // a violating INSERT fails the WRITE...
    val e = intercept[Exception](spark.sql(
      "INSERT INTO graft.db.chk VALUES (3, 3.0), (-1, 9.0)"))
    assert((e.getMessage + Option(e.getCause).fold("")(_.getMessage))
      .toLowerCase.contains("pos_k"), e.getMessage)
    // ...atomically: no partial state, no version minted
    assert(spark.table("graft.db.chk").count() == 2)
    val vAfterFail = SnapshotTable.currentVersion(spark, root)
    // a violating UPDATE (row-level write path) fails too
    val e2 = intercept[Exception](spark.sql(
      "UPDATE graft.db.chk SET k = -5 WHERE k = 1"))
    assert((e2.getMessage + Option(e2.getCause).fold("")(_.getMessage))
      .toLowerCase.contains("pos_k"), e2.getMessage)
    assert(spark.sql(
      "SELECT count(*) FROM graft.db.chk WHERE k < 0")
      .head().getLong(0) == 0)
    assert(SnapshotTable.currentVersion(spark, root) == vAfterFail)
    // ALTER TABLE ADD CONSTRAINT gates writes from now on
    spark.sql(
      "ALTER TABLE graft.db.chk ADD CONSTRAINT v_pos CHECK (v >= 0)")
    val e3 = intercept[Exception](spark.sql(
      "INSERT INTO graft.db.chk VALUES (4, -1.0)"))
    assert((e3.getMessage + Option(e3.getCause).fold("")(_.getMessage))
      .toLowerCase.contains("v_pos"), e3.getMessage)
    // DROP CONSTRAINT releases it
    spark.sql("ALTER TABLE graft.db.chk DROP CONSTRAINT v_pos")
    spark.sql("INSERT INTO graft.db.chk VALUES (4, -1.0)")
    assert(spark.table("graft.db.chk").count() == 3)
    // the surviving constraint still shows in DESCRIBE/properties
    assert(SnapshotTable.tableProperties(spark, root)
      .get("graft.check.pos_k").contains("k > 0"))
  }

  test("commit operation metadata: t.history reports what KIND of " +
      "commit each version was (create/append/rewrite/delta/compact/" +
      "add-columns), recorded atomically by the record's creator") {
    spark.sql(
      """CREATE TABLE graft.db.ops (k BIGINT, v DOUBLE)
        |TBLPROPERTIES ('write.merge.key'='k')""".stripMargin)  // v1
    val root = s"$warehouse/db/ops"
    spark.sql("INSERT INTO graft.db.ops VALUES (1, 1.0), (2, 2.0)") // v2
    spark.sql("UPDATE graft.db.ops SET v = -1.0 WHERE k % 2 = 1")   // v3
    SnapshotTable.mergeOnRead(spark, root,
      Seq((2L, 9.0)).toDF("k", "v"), "k")                           // v4
    SnapshotTable.compact(spark, root)                              // v5
    spark.sql("ALTER TABLE graft.db.ops ADD COLUMNS (w DOUBLE)")    // v6
    val ops = spark.sql(
      "SELECT version, operation FROM graft.db.ops.history")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ops == Map(1L -> "create", 2L -> "append", 3L -> "rewrite",
      4L -> "merge", 5L -> "compact", 6L -> "add-columns"), ops)
  }

  test("age-based expiry: versions committed at or before the cutoff " +
      "expire (current + tagged survive), matching what versionAsOf " +
      "can still time-travel to") {
    spark.sql("CREATE TABLE graft.db.aged (k BIGINT)")          // v1
    val root = s"$warehouse/db/aged"
    spark.sql("INSERT INTO graft.db.aged VALUES (1)")           // v2
    Thread.sleep(20)
    spark.sql("INSERT INTO graft.db.aged VALUES (2)")           // v3
    Thread.sleep(20)
    spark.sql("INSERT INTO graft.db.aged VALUES (3)")           // v4
    val cutoff = SnapshotTable.commitTime(spark, root, 2L)
    val gone = spark.sql(
      s"CALL graft.system.expire_older_than('db.aged', $cutoff)")
      .head().getLong(0)
    assert(gone == 2L, s"expected v1+v2 expired, got $gone")
    assert(SnapshotTable.versions(spark, root) == Seq(3L, 4L))
    assert(spark.table("graft.db.aged").count() == 3)
    // a tagged old version survives any age cutoff
    SnapshotTable.tag(spark, root, "keepme", 3L)
    assert(SnapshotTable.expireSnapshotsOlderThan(spark, root,
      System.currentTimeMillis() + 60000).isEmpty)
    assert(SnapshotTable.versions(spark, root) == Seq(3L, 4L))
  }

  test("column DEFAULTs: INSERT fills omitted columns, DEFAULT " +
      "keyword works, ALTER COLUMN SET/DROP DEFAULT manages it, and " +
      "non-foldable defaults are refused at declaration") {
    spark.sql(
      """CREATE TABLE graft.db.dflt (k BIGINT,
        |v DOUBLE DEFAULT 1.5, tag STRING DEFAULT 'none')""".stripMargin)
    spark.sql("INSERT INTO graft.db.dflt (k) VALUES (1), (2)")
    spark.sql("INSERT INTO graft.db.dflt VALUES (3, 9.0, 'x')")
    spark.sql("INSERT INTO graft.db.dflt (k, v) VALUES (4, DEFAULT)")
    val rows = spark.table("graft.db.dflt").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(rows.toSeq == Seq((1L, 1.5, "none"), (2L, 1.5, "none"),
      (3L, 9.0, "x"), (4L, 1.5, "none")), rows.mkString(","))
    // SET DEFAULT affects future inserts only
    spark.sql(
      "ALTER TABLE graft.db.dflt ALTER COLUMN v SET DEFAULT 2.5")
    spark.sql("INSERT INTO graft.db.dflt (k) VALUES (5)")
    assert(spark.sql("SELECT v FROM graft.db.dflt WHERE k = 5")
      .head().getDouble(0) == 2.5)
    assert(spark.sql("SELECT v FROM graft.db.dflt WHERE k = 1")
      .head().getDouble(0) == 1.5, "SET DEFAULT rewrote old rows")
    // DROP DEFAULT: omitted column reverts to NULL
    spark.sql("ALTER TABLE graft.db.dflt ALTER COLUMN v DROP DEFAULT")
    spark.sql("INSERT INTO graft.db.dflt (k) VALUES (6)")
    assert(spark.sql("SELECT v FROM graft.db.dflt WHERE k = 6")
      .head().isNullAt(0))
    // non-foldable defaults are refused at declaration
    val e2 = intercept[Exception](spark.sql(
      "ALTER TABLE graft.db.dflt ALTER COLUMN tag " +
        "SET DEFAULT CAST(rand() AS STRING)"))
    assert(e2.getMessage.toLowerCase.contains("foldable") ||
      e2.getMessage.toLowerCase.contains("default"), e2.getMessage)
  }

  test("DEFAULT NULL is refused with the DROP DEFAULT remedy and " +
      "DEFAULT '' round-trips — neither bricks the table") {
    spark.sql(
      """CREATE TABLE graft.db.dfltedge (k BIGINT,
        |v DOUBLE DEFAULT 1.5, tag STRING DEFAULT '')""".stripMargin)
    // empty-string default survives a catalog round trip (re-load) and
    // fills '' — not 'null', not a MatchError on loadTable
    spark.sql("INSERT INTO graft.db.dfltedge (k) VALUES (1)")
    val r = spark.table("graft.db.dfltedge").head()
    assert(r.getString(2) == "", s"DEFAULT '' filled '${r.getString(2)}'")
    // SET DEFAULT NULL on a numeric column: refused (would otherwise
    // store the string "null" and poison every subsequent loadTable)
    val eN = intercept[Exception](spark.sql(
      "ALTER TABLE graft.db.dfltedge ALTER COLUMN v SET DEFAULT NULL"))
    assert(eN.getMessage.contains("DROP DEFAULT"), eN.getMessage)
    // ...and on a string column: same refusal, no silent 'null' fill
    val eS = intercept[Exception](spark.sql(
      "ALTER TABLE graft.db.dfltedge ALTER COLUMN tag SET DEFAULT NULL"))
    assert(eS.getMessage.contains("DROP DEFAULT"), eS.getMessage)
    // CREATE TABLE with DEFAULT NULL is refused the same way
    val eC = intercept[Exception](spark.sql(
      "CREATE TABLE graft.db.dfltnull (k BIGINT, v DOUBLE DEFAULT NULL)"))
    assert(eC.getMessage.contains("DROP DEFAULT") ||
      eC.getMessage.toLowerCase.contains("null"), eC.getMessage)
    // the table stayed usable throughout: loadTable + insert still work
    spark.sql("INSERT INTO graft.db.dfltedge (k) VALUES (2)")
    assert(spark.table("graft.db.dfltedge").count() == 2)
  }

  test("ADD COLUMNS with DEFAULT is an initial default: pre-evolution " +
      "rows surface the literal (not NULL) through the connector scan, " +
      "the native read, a case-mismatched projection, and after a COW " +
      "rewrite; time travel to before the evolution has no such column") {
    spark.sql("CREATE TABLE graft.db.initd (k BIGINT, v DOUBLE)")   // v1
    val root = s"$warehouse/db/initd"
    spark.sql(
      "INSERT INTO graft.db.initd VALUES (1, 10.0), (2, 20.0)")     // v2
    val preEvolution = SnapshotTable.currentVersion(spark, root)
    spark.sql(
      "ALTER TABLE graft.db.initd ADD COLUMNS (w DOUBLE DEFAULT 3.0)")
    // connector scan: files that predate w read 3.0, never NULL
    val viaCatalog = spark.table("graft.db.initd").orderBy("k")
      .collect().map(r => r.getLong(0) -> r.getDouble(2))
    assert(viaCatalog.toSeq == Seq(1L -> 3.0, 2L -> 3.0),
      viaCatalog.mkString(","))
    // a case-mismatched projection fills the same constant (the
    // row-based reader keys fills case-insensitively, like columnar)
    val caseMix = spark.sql("SELECT W FROM graft.db.initd")
      .collect().map(_.getDouble(0))
    assert(caseMix.forall(_ == 3.0), caseMix.mkString(","))
    // native SnapshotTable read agrees
    val native = SnapshotTable.read(spark, root).orderBy("k").collect()
      .map(r => r.getLong(r.fieldIndex("k")) ->
        r.getDouble(r.fieldIndex("w")))
    assert(native.toSeq == Seq(1L -> 3.0, 2L -> 3.0),
      native.mkString(","))
    // the initial default doubles as the CURRENT default: an INSERT
    // omitting w fills 3.0; an explicit value is stored as given
    spark.sql("INSERT INTO graft.db.initd (k, v) VALUES (3, 30.0)")
    spark.sql("INSERT INTO graft.db.initd VALUES (4, 40.0, 7.5)")
    val all = spark.table("graft.db.initd").orderBy("k").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toSeq
    assert(all == Seq(1L -> 3.0, 2L -> 3.0, 3L -> 3.0, 4L -> 7.5),
      all.mkString(","))
    // time travel to before the evolution: the column doesn't exist
    // there — pre-evolution readers see the pre-evolution schema
    val old = spark.sql(
      s"SELECT * FROM graft.db.initd VERSION AS OF $preEvolution")
    assert(!old.columns.exists(_.equalsIgnoreCase("w")),
      old.columns.mkString(","))
    assert(old.count() == 2)
    // a COW rewrite of a pre-evolution row keeps the fill: the
    // rewritten file stores (or re-fills) 3.0, never NULL
    spark.sql("UPDATE graft.db.initd SET v = 11.0 WHERE k = 1")
    val after = spark.table("graft.db.initd").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(after == Seq((1L, 11.0, 3.0), (2L, 20.0, 3.0),
      (3L, 30.0, 3.0), (4L, 40.0, 7.5)), after.mkString(","))
  }

  test("zero-copy clone: a writable branch shares the source's files " +
      "by reference (no data copied), diverges independently, " +
      "carries MOR state, and neither side's retention can delete " +
      "the other's data") {
    spark.sql(
      """CREATE TABLE graft.db.clsrc (k BIGINT, v DOUBLE)
        |TBLPROPERTIES ('write.mode'='merge-on-read',
        |  'write.merge.key'='k')""".stripMargin)
    val srcRoot = s"$warehouse/db/clsrc"
    val dstRoot = s"$warehouse/db/clbr"
    SnapshotTable.append(spark, srcRoot,
      (1 to 1000).map(i => (i.toLong, i.toDouble)).toDF("k", "v"),
      clusterKey = Some("k"), files = 4)                       // v2
    SnapshotTable.mergeOnRead(spark, srcRoot,
      (1 to 50).map(i => (i.toLong, -1.0)).toDF("k", "v"), "k") // v3

    val res = spark.sql(
      "CALL graft.system.clone('db.clsrc', 'db.clbr', 0)").head()
    assert(res.getLong(0) == 3L)
    // bit-equal reads, zero data files under the clone's root
    assert(spark.table("graft.db.clbr").collect().toSet ==
      spark.table("graft.db.clsrc").collect().toSet)
    val cloneData = new java.io.File(s"$dstRoot/_data")
    assert(!cloneData.exists() ||
      cloneData.listFiles().forall(!_.isDirectory),
      "clone copied data")
    // carried merge-on-read state: updated keys read the new value
    assert(spark.sql(
      "SELECT v FROM graft.db.clbr WHERE k = 7").head().getDouble(0)
      == -1.0)
    // divergence: each side's writes are invisible to the other
    spark.sql("INSERT INTO graft.db.clbr VALUES (2001, 1.0)")   // bv4
    spark.sql("INSERT INTO graft.db.clsrc VALUES (3001, 3.0)")
    assert(spark.table("graft.db.clbr").count() == 1001)
    assert(spark.table("graft.db.clsrc").count() == 1001)
    assert(spark.sql(
      "SELECT count(*) FROM graft.db.clbr WHERE k = 3001")
      .head().getLong(0) == 0)
    assert(spark.sql(
      "SELECT count(*) FROM graft.db.clsrc WHERE k = 2001")
      .head().getLong(0) == 0)
    // the clone source version is auto-tagged on the source
    val cloneTags = SnapshotTable.tags(spark, srcRoot)
      .filter(_._1.startsWith("clone-"))
    assert(cloneTags.values.toSeq == Seq(3L), cloneTags.toString)
    // compact the clone (localizes every file), then expire its whole
    // shared history: the foreign-file guard must leave the source's
    // data untouched
    spark.sql("CALL graft.system.compact('db.clbr')")
    spark.sql("CALL graft.system.expire_snapshots('db.clbr', 1)")
    assert(spark.table("graft.db.clbr").count() == 1001)
    assert(spark.table("graft.db.clsrc").count() == 1001,
      "clone expiry deleted source files")
    // source retention keeps the tagged (shared) version alive
    spark.sql("CALL graft.system.expire_snapshots('db.clsrc', 1)")
    assert(SnapshotTable.versions(spark, srcRoot).contains(3L),
      "source expiry reaped the clone-pinned version")
  }

  test("clone of a clone: already-absolute entries carry verbatim, " +
      "all three tables read independently, and the middle table's " +
      "retention cannot strand the grandchild (auto-tag chain)") {
    spark.sql("CREATE TABLE graft.db.cc_a (k BIGINT)")
    val (aRoot, bRoot, cRoot) = (s"$warehouse/db/cc_a",
      s"$warehouse/db/cc_b", s"$warehouse/db/cc_c")
    spark.sql("INSERT INTO graft.db.cc_a VALUES (1), (2), (3)") // a:v2
    spark.sql("CALL graft.system.clone('db.cc_a', 'db.cc_b', 0)")
    spark.sql("INSERT INTO graft.db.cc_b VALUES (4)")           // b:v3
    spark.sql("CALL graft.system.clone('db.cc_b', 'db.cc_c', 0)")
    // grandchild = child at clone time; all reads independent
    assert(spark.table("graft.db.cc_c").collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    spark.sql("INSERT INTO graft.db.cc_c VALUES (5)")
    assert(spark.table("graft.db.cc_c").count() == 5)
    assert(spark.table("graft.db.cc_b").count() == 4)
    assert(spark.table("graft.db.cc_a").count() == 3)
    // c's manifest holds ONLY absolute foreign refs + its own file;
    // the a-file refs carried VERBATIM (not re-prefixed through b)
    val cm = SnapshotTable.manifest(spark, cRoot,
      SnapshotTable.currentVersion(spark, cRoot))
    val aAbs = cm.map(_.path).filter(_.startsWith("/"))
      .filter(_.contains("/cc_a/"))
    assert(aAbs.nonEmpty, "a-paths must carry verbatim through b")
    assert(!aAbs.exists(_.contains("/cc_b/")),
      "a clone-of-a-clone must not nest prefixes")
    // b's own expiry (after localizing) leaves c readable: the b
    // version c cloned is auto-tagged on b, so it survives
    spark.sql("CALL graft.system.compact('db.cc_b')")
    spark.sql("CALL graft.system.expire_snapshots('db.cc_b', 1)")
    assert(spark.table("graft.db.cc_c").count() == 5,
      "b's retention deleted files c references")
    // tag chain: a pinned by b's clone, b pinned by c's clone
    assert(SnapshotTable.tags(spark, bRoot)
      .keys.exists(_.startsWith("clone-")))
    // ...AND the grandchild pins the ORIGINAL directly: c carries a's
    // files by absolute path, so a must hold c's pin too — otherwise
    // releasing b's pin (the documented explicit release of b) would
    // let a's retention delete files c still reads
    val aClonePins = SnapshotTable.tags(spark, aRoot)
      .filter(_._1.startsWith("clone-"))
    assert(aClonePins.size == 2,
      s"a must carry b's AND c's pins, got $aClonePins")
    // release b's pin on a, advance a, expire a's history: the version
    // c reads survives on c's own pin
    val cPin = s"clone-${java.security.MessageDigest.getInstance("MD5")
      .digest(cRoot.getBytes("UTF-8")).map("%02x".format(_))
      .mkString.take(10)}"
    assert(aClonePins.contains(cPin), s"$aClonePins missing $cPin")
    (aClonePins.keySet - cPin).foreach(t =>
      SnapshotTable.dropTag(spark, aRoot, t))
    spark.sql("INSERT INTO graft.db.cc_a VALUES (9)")
    spark.sql("CALL graft.system.expire_snapshots('db.cc_a', 1)")
    assert(spark.table("graft.db.cc_c").count() == 5,
      "a's retention deleted files c references after b's release")
    // dropTag of an unknown name reports false, deletes nothing
    assert(!SnapshotTable.dropTag(spark, aRoot, "no-such-tag"))
  }

  test("aborted clone leaves no retention pin on the source") {
    spark.sql("CREATE TABLE graft.db.abrt_src (k BIGINT)")
    spark.sql("INSERT INTO graft.db.abrt_src VALUES (1), (2)")
    val srcRoot = s"$warehouse/db/abrt_src"
    // target path is an existing plain FILE: the clone tags first
    // (pin before a reader exists), then fails claiming the target —
    // the abort must release the just-created pin
    val dstRoot = s"$warehouse/db/abrt_dst"
    java.nio.file.Files.write(java.nio.file.Paths.get(dstRoot),
      "not a table".getBytes("UTF-8"))
    intercept[Exception](
      SnapshotTable.cloneTable(spark, srcRoot, dstRoot))
    assert(!SnapshotTable.tags(spark, srcRoot)
      .keys.exists(_.startsWith("clone-")),
      "failed clone left a permanent clone pin on the source")
    // and a clean retry to a valid target still works
    java.nio.file.Files.delete(java.nio.file.Paths.get(dstRoot))
    SnapshotTable.cloneTable(spark, srcRoot, dstRoot)
    assert(SnapshotTable.read(spark, dstRoot).count() == 2)
  }

  test("expireSnapshotsOlderThan keys off each commit's mtime, not " +
      "version order: a backdated middle version expires while an " +
      "older-numbered fresh version survives") {
    spark.sql("CREATE TABLE graft.db.skew (k BIGINT)")        // v1
    spark.sql("INSERT INTO graft.db.skew VALUES (1)")         // v2
    spark.sql("INSERT INTO graft.db.skew VALUES (2)")         // v3
    spark.sql("INSERT INTO graft.db.skew VALUES (3)")         // v4
    val root = s"$warehouse/db/skew"
    assert(SnapshotTable.versions(spark, root) == Seq(1L, 2L, 3L, 4L))
    // cross-writer clock skew: version 3's record carries an OLD
    // mtime while versions 1-2 are fresh
    val cutoff = System.currentTimeMillis() - 60 * 60 * 1000L
    assert(new java.io.File(s"$root/_commits/3")
      .setLastModified(cutoff - 60000L))
    val expired = SnapshotTable.expireSnapshotsOlderThan(
      spark, root, cutoff)
    assert(expired == Seq(3L),
      s"must expire exactly the aged version, got $expired")
    assert(SnapshotTable.versions(spark, root) == Seq(1L, 2L, 4L))
    // survivors still read (reference counting kept their files)
    assert(spark.table("graft.db.skew").count() == 3)
    assert(spark.sql(
      "SELECT count(*) FROM graft.db.skew VERSION AS OF 2")
      .head().getLong(0) == 1)
  }

  test("changelog tables: t.changes reads exactly the rows a commit " +
      "added (O(delta) files, not the table), t.delete_keys its " +
      "tombstoned keys, and a non-accretive commit is refused") {
    spark.sql(
      """CREATE TABLE graft.db.chg (k BIGINT, v DOUBLE)
        |TBLPROPERTIES ('write.mode'='merge-on-read',
        |  'write.merge.key'='k')""".stripMargin)
    val root = s"$warehouse/db/chg"
    SnapshotTable.append(spark, root,
      (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("k", "v"),
      clusterKey = Some("k"), files = 2)                       // v2
    // v3: MOR update of keys 1..5 (adds data + tombstone)
    SnapshotTable.mergeOnRead(spark, root,
      (1 to 5).map(i => (i.toLong, -1.0)).toDF("k", "v"), "k")  // v3

    // changes of v2: the appended batch, nothing else
    val c2 = spark.sql(
      "SELECT k, v FROM graft.db.chg.changes VERSION AS OF 2")
    assert(c2.count() == 100)
    assert(c2.agg(sum("v")).head().getDouble(0) == (1 to 100).sum)
    // changes of v3: exactly the 5 replacement rows
    val c3 = spark.sql(
      "SELECT k, v FROM graft.db.chg.changes VERSION AS OF 3")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(c3 == (1 to 5).map(i => i.toLong -> -1.0).toMap, s"$c3")
    // unpinned = changes of the CURRENT commit
    assert(spark.sql("SELECT * FROM graft.db.chg.changes")
      .count() == 5)
    // delete_keys of v3: the tombstoned keys
    val d3 = spark.sql(
      "SELECT k FROM graft.db.chg.delete_keys VERSION AS OF 3")
      .collect().map(_.getLong(0)).toSet
    assert(d3 == (1 to 5).map(_.toLong).toSet, s"$d3")
    // delete_keys of the plain append: no tombstones, empty, right
    // schema (the declared merge key)
    assert(spark.sql(
      "SELECT k FROM graft.db.chg.delete_keys VERSION AS OF 2")
      .count() == 0)
    // the changes scan plans O(delta) files: exactly the data files
    // commit 3 stamped, never the older manifest entries
    val deltaFiles = SnapshotTable.manifest(spark, root, 3L)
      .count(e => e.kind == "d" && e.seq == 3L)
    val totalFiles = SnapshotTable.manifest(spark, root, 3L)
      .count(_.kind == "d")
    assert(deltaFiles < totalFiles, "fixture lost its delta shape")
    val planned = spark.sql(
      "SELECT * FROM graft.db.chg.changes VERSION AS OF 3")
      .queryExecution.executedPlan.toString
    assert(planned.contains(s"files=$deltaFiles/$deltaFiles"),
      s"changes scan read more than the commit's delta " +
        s"($deltaFiles files):\n$planned")
    // a compaction commit rewrites files — the file-delta changelog
    // must refuse it rather than answer wrong
    SnapshotTable.compact(spark, root)                          // v4
    val refused = intercept[Exception](spark.sql(
      "SELECT * FROM graft.db.chg.changes").collect())
    assert(refused.getMessage.contains("not accretive"),
      refused.getMessage)
    // pinned pre-compaction versions still answer
    assert(spark.sql(
      "SELECT * FROM graft.db.chg.changes VERSION AS OF 3")
      .count() == 5)
  }

  test("CALL procedures: compact merges files and clears tombstones, " +
      "expire_snapshots prunes history, vacuum reaps unreferenced " +
      "segments — each returning a one-row summary") {
    spark.sql("CREATE TABLE graft.db.proc (k BIGINT, v DOUBLE)")
    val root = s"$warehouse/db/proc"
    SnapshotTable.append(spark, root,
      (1 to 4000).map(i => (i.toLong, i.toDouble)).toDF("k", "v"),
      clusterKey = Some("k"), files = 8)                       // v2
    SnapshotTable.deleteKeysOnRead(spark, root,
      (1 to 10).map(_.toLong).toDF("k"), "k")                  // v3

    val c = spark.sql("CALL graft.system.compact('db.proc')").head()
    assert(c.getLong(0) > c.getLong(1),
      s"compact did not reduce files: $c")
    assert(spark.table("graft.db.proc").count() == 3990)

    val e = spark.sql(
      "CALL graft.system.expire_snapshots('db.proc', 1)").head()
    assert(e.getLong(0) >= 2, s"expected >=2 expired versions, got $e")

    // expire now reclaims expired segments WHOLE (single-pass staging
    // leaves no _SUCCESS residue to keep the emptied directory alive),
    // so vacuum's reap contract is demonstrated on what vacuum is FOR:
    // an orphaned staging segment no manifest ever referenced (the
    // crashed-committer leftover)
    val fsys = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphan = new org.apache.hadoop.fs.Path(root,
      "_data/seg-orphan-crashed/part-00000-0.snappy.parquet")
    val out = fsys.create(orphan, false)
    out.write(Array[Byte](1, 2, 3)); out.close()

    val g = spark.sql("CALL graft.system.vacuum('db.proc', 0)").head()
    assert(g.getLong(0) >= 1, s"vacuum reaped nothing: $g")
    assert(!fsys.exists(orphan.getParent),
      "vacuum left the orphaned segment behind")
    // the table still reads exactly after the full maintenance pass
    assert(spark.table("graft.db.proc").count() == 3990)
  }

  test("a catalog read keeps the connector's pushdown: a range " +
      "predicate shows PushedFilters and prunes manifest files") {
    spark.sql("CREATE TABLE graft.db.pr (k BIGINT, x DOUBLE)")
    // cluster through the native API so files carry stats, then read
    // the same table BY NAME
    val root = s"$warehouse/db/pr"
    SnapshotTable.append(spark, root,
      (1 to 20000).map(i => (i.toLong, i * 2.0)).toDF("k", "x"),
      clusterKey = Some("k"))
    val q = spark.sql(
      "SELECT sum(x) AS s FROM graft.db.pr WHERE k BETWEEN 100 AND 200")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), s"pushdown missing:\n$plan")
    val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(plan).get
    assert(m.group(1).toInt < m.group(2).toInt, s"no pruning: $plan")
    assert(q.collect()(0).getDouble(0) == (100 to 200).map(_ * 2.0).sum)
  }

  test("multi-change ALTER is atomic in refusal: a statement that " +
      "would fail at change 3 of its commit sequence leaves the " +
      "table byte-identical — validated up front, before any CAS " +
      "commit") {
    import org.apache.spark.sql.connector.catalog.{Identifier,
      TableCatalog, TableChange}
    import org.apache.spark.sql.types.{IntegerType, LongType,
      StringType}
    spark.sql(
      "CREATE TABLE graft.db.atomic (k BIGINT, a INT, b STRING)")
    spark.sql("INSERT INTO graft.db.atomic VALUES (1, 10, 'x')")
    val root = s"$warehouse/db/atomic"
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[TableCatalog]
    val ident = Identifier.of(Array("db"), "atomic")
    def snapshotState() = (
      SnapshotTable.currentVersion(spark, root),
      SnapshotTable.read(spark, root).schema.json,
      SnapshotTable.tableProperties(spark, root))
    val before = snapshotState()

    // the catalog commits drops, then renames, then retypes — the
    // illegal narrow (BIGINT -> INT) is change 3 in COMMIT order.
    // Without up-front validation the drop and rename would land as
    // their own versions before the retype throws, half-altering the
    // table; with it, nothing commits.
    val e1 = intercept[IllegalArgumentException](cat.alterTable(ident,
      TableChange.deleteColumn(Array("b"), false),
      TableChange.renameColumn(Array("a"), "a2"),
      TableChange.updateColumnType(Array("k"), IntegerType)))
    assert(e1.getMessage.contains("lossless widenings"),
      e1.getMessage)
    assert(snapshotState() == before,
      "a refused multi-change ALTER must leave the table untouched")

    // ADD of a name dropped IN THE SAME statement: the simulation
    // carries the statement's own ghost marker, so the collision is
    // caught before the drop ever commits
    val e2 = intercept[IllegalArgumentException](cat.alterTable(ident,
      TableChange.deleteColumn(Array("a"), false),
      TableChange.addColumn(Array("a"), IntegerType)))
    assert(e2.getMessage.contains("compact"), e2.getMessage)
    assert(snapshotState() == before,
      "same-statement drop+re-add must refuse before committing")

    // an unknown/unsupported change anywhere in the statement is
    // caught up front too (it would otherwise throw AFTER the drops
    // and renames committed)
    val e3 = intercept[UnsupportedOperationException](
      cat.alterTable(ident,
        TableChange.deleteColumn(Array("b"), false),
        TableChange.updateColumnNullability(Array("a"), false)))
    assert(e3.getMessage.contains("nullable"), e3.getMessage)
    assert(snapshotState() == before)

    // and the green path still applies the full sequence: drop,
    // rename, widen (the simulation tracks the rename so the retype
    // finds 'a2'), add — one statement, four metadata commits
    cat.alterTable(ident,
      TableChange.deleteColumn(Array("b"), false),
      TableChange.renameColumn(Array("a"), "a2"),
      TableChange.updateColumnType(Array("a2"), LongType),
      TableChange.addColumn(Array("c"), StringType))
    val evolved = SnapshotTable.read(spark, root).schema
    assert(evolved.fieldNames.toSeq == Seq("k", "a2", "c"),
      evolved.fieldNames.mkString(","))
    assert(evolved("a2").dataType == LongType)
    assert(spark.sql(
      "SELECT k, a2, c FROM graft.db.atomic").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.isNullAt(2))) ==
      Seq((1L, 10L, true)))
  }

  test("create_mv / refresh_mv procedures: the definition persists as " +
      "view properties, refresh-by-name runs the incremental path, " +
      "and a non-MV table is refused") {
    spark.sql("CREATE TABLE graft.db.mvsrc (k STRING, v DOUBLE)")
    spark.sql("INSERT INTO graft.db.mvsrc VALUES " +
      "('a', 1.0), ('a', 2.0), ('b', 5.0)")
    val v1 = spark.sql("CALL graft.system.create_mv(" +
      "'db.mvagg', 'db.mvsrc', 'k', 'v', '')").head().getLong(0)
    assert(v1 == 1L)
    def served() = spark.sql(
      "SELECT k, n, CAST(sum_v * 100 AS BIGINT) FROM graft.db.mvagg " +
        "ORDER BY k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(served() == Seq(("a", 2L, 300L), ("b", 1L, 500L)))
    // land more source data, refresh BY NAME — the delta merges
    spark.sql("INSERT INTO graft.db.mvsrc VALUES ('b', 7.0), ('c', 9.0)")
    spark.sql("CALL graft.system.refresh_mv('db.mvagg')")
    assert(served() ==
      Seq(("a", 2L, 300L), ("b", 2L, 1200L), ("c", 1L, 900L)))
    // refresh when fresh: no new view version
    val cur = SnapshotTable.currentVersion(spark, s"$warehouse/db/mvagg")
    spark.sql("CALL graft.system.refresh_mv('db.mvagg')")
    assert(SnapshotTable.currentVersion(spark,
      s"$warehouse/db/mvagg") == cur, "fresh refresh_mv committed")
    // a plain table is not a refreshable view
    val e = intercept[Exception] {
      spark.sql("CALL graft.system.refresh_mv('db.mvsrc')").collect()
    }
    assert(e.getMessage.contains("not a materialized view"),
      s"wrong refusal: ${e.getMessage}")
  }

  test("create_join_mv / refresh_mv: the JoinView maintenance paths " +
      "(fact delete, dim MOR update, fact append) run through the " +
      "procedure surface and match a from-scratch recompute") {
    val fact = (1L to 200L).map(k => (k, k % 20, (k % 7).toDouble))
      .toDF("o_id", "c_id", "price")
    val dim = (0L until 20L).map(c => (c, s"seg${c % 4}"))
      .toDF("c_id2", "seg")
    fact.createOrReplaceTempView("jmv_fact_src")
    dim.createOrReplaceTempView("jmv_dim_src")
    spark.sql("CREATE TABLE graft.db.jmvf AS SELECT * FROM jmv_fact_src")
    spark.sql("CREATE TABLE graft.db.jmvd AS SELECT * FROM jmv_dim_src")
    spark.sql("CALL graft.system.create_join_mv('db.jmvv', " +
      "'db.jmvf', 'db.jmvd', 'c_id', 'c_id2', 'seg', 'price')")
    def served() = spark.sql(
      "SELECT seg, n, CAST(sum_price * 100 AS BIGINT), cnt_price " +
        "FROM graft.db.jmvv ORDER BY seg").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    def expected() = spark.sql(
      """SELECT seg, count(*) AS n,
        |  CAST(sum(CAST(price AS DECIMAL(20,2))) * 100 AS BIGINT),
        |  count(price)
        |FROM graft.db.jmvf JOIN graft.db.jmvd ON c_id = c_id2
        |GROUP BY seg ORDER BY seg""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(served() == expected(), "bootstrap diverged")
    // ΔF: SQL row-level delete, then refresh by name
    spark.sql("DELETE FROM graft.db.jmvf WHERE o_id % 13 = 0")
    spark.sql("CALL graft.system.refresh_mv('db.jmvv')")
    assert(served() == expected(), "after fact delete")
    // ΔD: dim update through MERGE, then refresh by name
    spark.sql(
      """MERGE INTO graft.db.jmvd t
        |USING (SELECT c_id2, 'MOVED' AS seg FROM jmv_dim_src
        |       WHERE c_id2 % 5 = 0) s
        |ON t.c_id2 = s.c_id2
        |WHEN MATCHED THEN UPDATE SET seg = s.seg""".stripMargin)
    spark.sql("CALL graft.system.refresh_mv('db.jmvv')")
    assert(served() == expected(), "after dim update")
    // ΔF append
    spark.sql("INSERT INTO graft.db.jmvf " +
      "SELECT o_id + 1000, c_id, price * 2 FROM jmv_fact_src " +
      "WHERE o_id % 17 = 0")
    spark.sql("CALL graft.system.refresh_mv('db.jmvv')")
    assert(served() == expected(), "after fact append")
  }

  test("create_text_index / search_text procedures: the index builds " +
      "from a catalog table, the query string is tokenized by the " +
      "recorded analyzer, all three modes answer, and an unknown " +
      "mode is refused") {
    val docs = Seq(
      (1L, "Spark streams JOIN the batch; spark joins the stream!"),
      (2L, "batch spark merge"),
      (3L, "the stream joins spark"),
      (4L, "spark alone"),
      (5L, "joins spark, the stream"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("txi_src")
    spark.sql("CREATE TABLE graft.db.txidocs AS SELECT * FROM txi_src")
    spark.sql("CALL graft.system.create_text_index(" +
      "'db.txix', 'db.txidocs', 8, 'simple')")
    // the postings root is itself a SELECTable catalog table
    assert(spark.sql("SELECT count(*) FROM graft.db.txix").head()
      .getLong(0) > 0, "postings not selectable")
    def ids(q: String, mode: String): Seq[Long] = spark.sql(
      s"CALL graft.system.search_text('db.txix', '$q', 10, '$mode')")
      .collect().map(_.getLong(0)).toSeq
    // OR: any doc holding any term ('Spark!' case-folds/strips)
    assert(ids("spark stream", "or").toSet == Set(1L, 2L, 3L, 4L, 5L))
    // AND: both terms required
    assert(ids("spark stream", "and").toSet == Set(1L, 3L, 5L))
    // PHRASE: consecutive under the simple analyzer — 'the stream'
    // appears in 1 ('...joins the stream!'), 3 and 5, but doc 2/4
    // (AND-failing) and any non-adjacent holders are out
    assert(ids("the stream", "phrase").toSet == Set(1L, 3L, 5L),
      s"phrase got ${ids("the stream", "phrase")}")
    val e = intercept[Exception] {
      spark.sql("CALL graft.system.search_text(" +
        "'db.txix', 'spark', 5, 'fuzzy')").collect()
    }
    assert(e.getMessage.contains("unknown search mode"),
      s"wrong refusal: ${e.getMessage}")
  }

  test("mv_status: reports kind/consumed/current/stale for both MV " +
      "kinds, flips on a source commit, clears on refresh_mv") {
    spark.sql("CREATE TABLE graft.db.stsrc (k STRING, v DOUBLE)")
    spark.sql("INSERT INTO graft.db.stsrc VALUES ('a', 1.0)")
    spark.sql("CALL graft.system.create_mv(" +
      "'db.stagg', 'db.stsrc', 'k', 'v', '')")
    def status() = spark.sql(
      "CALL graft.system.mv_status('db.stagg')").head()
    assert(status().getString(0) == "incremental")
    assert(!status().getBoolean(5), "fresh view reported stale")
    spark.sql("INSERT INTO graft.db.stsrc VALUES ('b', 2.0)")
    val st = status()
    assert(st.getBoolean(5), "post-commit view reported fresh")
    assert(st.getLong(4) > st.getLong(3),
      "source_version must lead consumed after a commit")
    spark.sql("CALL graft.system.refresh_mv('db.stagg')")
    assert(!status().getBoolean(5), "refreshed view reported stale")
    // join kind: stale on a DIM-side commit too (the version vector)
    assert(spark.sql("CALL graft.system.mv_status('db.jmvv')").head()
      .getString(0) == "join")
    spark.sql("INSERT INTO graft.db.jmvd VALUES (999, 'segX')")
    assert(spark.sql("CALL graft.system.mv_status('db.jmvv')").head()
      .getBoolean(5), "dim commit must flip join-MV staleness")
    spark.sql("CALL graft.system.refresh_mv('db.jmvv')")
    assert(!spark.sql("CALL graft.system.mv_status('db.jmvv')").head()
      .getBoolean(5))
  }

  test("create_vector_index / search_vectors procedures: ANN top-k " +
      "by name over catalog tables, probes prune") {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").limit(400)
    emb.createOrReplaceTempView("vix_src")
    spark.sql("CREATE TABLE graft.db.vixemb AS SELECT * FROM vix_src")
    spark.sql("CALL graft.system.create_vector_index(" +
      "'db.vix', 'db.vixemb', 8)")
    // assignments are a SELECTable table, value-pure per cell
    assert(spark.sql("SELECT count(DISTINCT cell) FROM graft.db.vix")
      .head().getLong(0) > 1)
    emb.filter(col("vec_id") < 3)
      .selectExpr("vec_id AS q_id", "embedding")
      .createOrReplaceTempView("vix_q_src")
    spark.sql("CREATE TABLE graft.db.vixq AS SELECT * FROM vix_q_src")
    val res = spark.sql("CALL graft.system.search_vectors(" +
      "'db.vix', 'db.vixq', 3, 3)").collect()
    assert(res.length == 9, s"expected 3 queries x k=3, got " +
      s"${res.length}")
    // each query's rank-1 neighbor at cosine <= 1, self excluded
    assert(res.filter(_.getInt(1) == 1).forall(r =>
      r.getDouble(3) <= 1.0 && r.getLong(2) != r.getLong(0)))
    // the SQ8 codec through SQL (the optional 4th param; the 3-arg
    // form above stays raw): same probe contract, coded cells
    spark.sql("CALL graft.system.create_vector_index(" +
      "'db.vix8', 'db.vixemb', 8, 'sq8')")
    val res8 = spark.sql("CALL graft.system.search_vectors(" +
      "'db.vix8', 'db.vixq', 3, 8)").collect()
    assert(res8.length == 9)
    assert(res8.filter(_.getInt(1) == 1).forall(r =>
      r.getDouble(3) <= 1.0 && r.getLong(2) != r.getLong(0)))
    // coded cells really are codes, not vectors
    assert(spark.sql("SELECT * FROM graft.db.vix8").schema("code")
      .dataType == org.apache.spark.sql.types.BinaryType)
  }

  test("create_mv aggregate specs: ':avg' serves the exact derived " +
      "quotient, ':ndv' an HLL distinct; EXACT ':distinct' is " +
      "refused loudly with the ndv pointer") {
    val emb = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    emb.createOrReplaceTempView("mvspec_src")
    spark.sql("CREATE TABLE graft.db.mvspecsrc AS " +
      "SELECT * FROM mvspec_src")
    spark.sql("CALL graft.system.create_mv('db.mvspecv', " +
      "'db.mvspecsrc', 'o_orderstatus', " +
      "'o_totalprice:avg,o_custkey:ndv', '')")
    val got = spark.sql(
      "SELECT o_orderstatus, avg_o_totalprice, ndv_o_custkey " +
        "FROM graft.db.mvspecv ORDER BY o_orderstatus")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val exp = spark.sql(
      """SELECT o_orderstatus,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE)
        |    / count(o_totalprice) AS a,
        |  count(DISTINCT o_custkey) AS d
        |FROM mvspec_src GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    got.zip(exp).foreach { case ((k, a, nd), (ek, ea, ed)) =>
      assert(k == ek && a == ea, s"avg mismatch: $a vs $ea at $k")
      assert(math.abs(nd - ed).toDouble / ed <= 0.05,
        s"ndv $nd vs exact $ed at $k")
    }
    val e = intercept[Exception] {
      spark.sql("CALL graft.system.create_mv('db.mvspecv2', " +
        "'db.mvspecsrc', 'o_orderstatus', 'o_custkey:distinct', '')")
    }
    assert(e.getMessage.contains("ndv"), e.getMessage)
    // join MVs accept :avg (same derived quotient through the
    // telescoping refresh) but refuse :ndv — no bounded
    // delete-recompute path over a joined frame
    Tables.load(spark, sfDir, "customer")
      .select("c_custkey", "c_mktsegment")
      .createOrReplaceTempView("mvspec_dim")
    spark.sql("CREATE TABLE graft.db.mvspecdim AS " +
      "SELECT * FROM mvspec_dim")
    spark.sql("CALL graft.system.create_join_mv('db.mvspecjv', " +
      "'db.mvspecsrc', 'db.mvspecdim', 'o_custkey', 'c_custkey', " +
      "'c_mktsegment', 'o_totalprice:avg')")
    val jGot = spark.sql(
      "SELECT c_mktsegment, avg_o_totalprice FROM graft.db.mvspecjv " +
        "ORDER BY c_mktsegment")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val jExp = spark.sql(
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE)
        |    / count(o_totalprice) AS a
        |FROM mvspec_src JOIN mvspec_dim ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(jGot.toSeq == jExp.toSeq)
    val e2 = intercept[Exception] {
      spark.sql("CALL graft.system.create_join_mv('db.mvspecjv2', " +
        "'db.mvspecsrc', 'db.mvspecdim', 'o_custkey', 'c_custkey', " +
        "'c_mktsegment', 'o_custkey:ndv')")
    }
    assert(e2.getMessage.contains("single-table"), e2.getMessage)
  }

  test("search_hybrid: RRF fusion of the text and vector legs by " +
      "name — agrees with hand-fused search_text + search_vectors, " +
      "refuses multi-row query tables; index_status reports both " +
      "index kinds metadata-only and refuses non-indexes") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").limit(400)
    docs.createOrReplaceTempView("hyb_docs_src")
    spark.sql("CREATE TABLE graft.db.hybdocs AS " +
      "SELECT * FROM hyb_docs_src")
    spark.sql("CALL graft.system.create_text_index(" +
      "'db.hybtix', 'db.hybdocs', 16, 'whitespace')")
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").limit(400)
    emb.createOrReplaceTempView("hyb_emb_src")
    spark.sql("CREATE TABLE graft.db.hybemb AS " +
      "SELECT * FROM hyb_emb_src")
    spark.sql("CALL graft.system.create_vector_index(" +
      "'db.hybvix', 'db.hybemb', 8, 'sq8')")
    spark.sql("CREATE TABLE graft.db.hybq AS " +
      "SELECT vec_id AS q_id, embedding FROM hyb_emb_src " +
      "WHERE vec_id = 0")
    val fused = spark.sql("CALL graft.system.search_hybrid(" +
      "'db.hybtix', 'db.hybvix', 'stream vector merge', 'db.hybq', " +
      "10, 8)").collect()
    assert(fused.nonEmpty)
    // hand-fuse the two leg procedures and compare exactly
    val lex = spark.sql("CALL graft.system.search_text(" +
      "'db.hybtix', 'stream vector merge', 10, 'or')").collect()
      .zipWithIndex.map { case (r, i) => r.getLong(0) -> (i + 1) }.toMap
    val sem = spark.sql("CALL graft.system.search_vectors(" +
      "'db.hybvix', 'db.hybq', 10, 8)").collect()
      .map(r => r.getLong(2) -> r.getInt(1)).toMap
    val expect = (lex.keySet ++ sem.keySet).toSeq.map { id =>
      val rrf = lex.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        sem.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (id, BigDecimal(rrf).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, rrf) => (-rrf, id) }
    assert(fused.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      expect, "procedure fusion diverged from hand fusion")
    // ranks surface and are consistent with the legs
    fused.foreach { r =>
      val id = r.getLong(0)
      assert((if (r.isNullAt(2)) None else Some(r.getInt(2))) ==
        lex.get(id))
      assert((if (r.isNullAt(3)) None else Some(r.getInt(3))) ==
        sem.get(id))
    }
    // a multi-row "queries" table refuses
    spark.sql("CREATE TABLE graft.db.hybqmulti AS " +
      "SELECT vec_id AS q_id, embedding FROM hyb_emb_src " +
      "WHERE vec_id < 3")
    val e = intercept[Exception] {
      spark.sql("CALL graft.system.search_hybrid(" +
        "'db.hybtix', 'db.hybvix', 'stream', 'db.hybqmulti', 5, 8)")
        .collect()
    }
    assert(e.getMessage.contains("1-row"), e.getMessage)
    // index_status: both kinds, metadata-only
    val ts = spark.sql(
      "CALL graft.system.index_status('db.hybtix')").head()
    assert(ts.getString(0) == "text" &&
      ts.getString(2) == "whitespace" &&
      ts.getString(3).startsWith("buckets=") &&
      ts.getLong(4) == 0L && ts.getString(5) == "unclaimed", ts.toString)
    val vs = spark.sql(
      "CALL graft.system.index_status('db.hybvix')").head()
    assert(vs.getString(0) == "vector" &&
      vs.getString(2) == "sq8" && vs.getString(3) == "nlist=8" &&
      vs.getLong(4) == 0L, vs.toString)
    val e2 = intercept[Exception] {
      spark.sql("CALL graft.system.index_status('db.hybdocs')")
        .collect()
    }
    assert(e2.getMessage.contains("not a graft retrieval index"),
      e2.getMessage)
  }

  test("retrieval procedures refuse unbounded driver collects: " +
      "search_vectors rejects a corpus-sized queries table (capped " +
      "count, one limit job) and an oversized k; search_text rejects " +
      "an oversized k") {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").limit(400)
    emb.createOrReplaceTempView("vixcap_src")
    spark.sql("CREATE TABLE graft.db.vixcapemb AS " +
      "SELECT * FROM vixcap_src")
    spark.sql("CALL graft.system.create_vector_index(" +
      "'db.vixcap', 'db.vixcapemb', 8)")
    // a "queries" table that is actually the corpus (>1000 rows after
    // union with itself x3): the procedure must refuse, not collect
    spark.sql("CREATE TABLE graft.db.vixcapq AS " +
      "SELECT vec_id AS q_id, embedding FROM vixcap_src " +
      "UNION ALL SELECT vec_id + 1000, embedding FROM vixcap_src " +
      "UNION ALL SELECT vec_id + 2000, embedding FROM vixcap_src")
    val e1 = intercept[Exception] {
      spark.sql("CALL graft.system.search_vectors(" +
        "'db.vixcap', 'db.vixcapq', 3, 3)").collect()
    }
    assert(e1.getMessage.contains("procedure-sized"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("CALL graft.system.search_vectors(" +
        "'db.vixcap', 'db.vixcapq', 100000, 3)").collect()
    }
    assert(e2.getMessage.contains("bound"), e2.getMessage)
    // search_text k bound (index over a small docs table)
    spark.sql("CREATE TABLE graft.db.txcap AS SELECT " +
      "CAST(id AS BIGINT) AS doc_id, 'apple pear kiwi' AS text " +
      "FROM range(50)")
    spark.sql("CALL graft.system.create_text_index(" +
      "'db.txcapix', 'db.txcap', 8, 'whitespace')")
    val e3 = intercept[Exception] {
      spark.sql("CALL graft.system.search_text(" +
        "'db.txcapix', 'apple', 100000, 'or')").collect()
    }
    assert(e3.getMessage.contains("bound"), e3.getMessage)
  }
}
