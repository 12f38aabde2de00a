package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DROP COLUMN as a metadata-only narrowing commit, and the ghost
  * rule that makes name-based drops SAFE: pre-drop files still
  * physically carry the old values, so re-ADDing the same name
  * refuses until compaction has rewritten them — otherwise a reader
  * projecting by name would resurface deleted data (the name-based
  * analogue of Iceberg's never-reuse-a-field-id rule). */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-se").toString + "/t"

  private def catalogFor(name: String): String = {
    val wh = java.nio.file.Files
      .createTempDirectory("graft-se-wh").toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.connector.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.db")
    wh
  }

  test("dropColumns narrows reads everywhere, zero data moves; time " +
      "travel at a pre-drop version still serves the column") {
    val root = tmpRoot()
    SnapshotTable.commit(spark, root,
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "v", "x"))    // v1
    val dataFiles = SnapshotTable.readManifest(spark, root, 1L)
      .map(_.path).sorted
    val v2 = SnapshotTable.dropColumns(spark, root, Seq("x"))
    assert(v2 == 2L)
    // same physical files — metadata-only
    assert(SnapshotTable.readManifest(spark, root, v2)
      .map(_.path).sorted == dataFiles)
    val now = SnapshotTable.read(spark, root)
    assert(now.columns.toSeq == Seq("k", "v"))
    assert(now.as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // the dropped column is gone from the scan, not just hidden
    assert(intercept[Exception](now.select("x").collect())
      .getMessage.toLowerCase.contains("x"))
    // time travel: version 1's schema still has it, values intact
    val old = SnapshotTable.readVersion(spark, root, 1L)
    assert(old.columns.toSeq == Seq("k", "v", "x"))
    assert(old.select("x").as[Int].collect().sorted.toSeq ==
      Seq(10, 20))
  }

  test("re-adding a dropped name refuses while pre-drop files are " +
      "live (ghost values), and succeeds after compaction with fresh " +
      "NULL / DEFAULT semantics — old values never resurface") {
    val root = tmpRoot()
    SnapshotTable.commit(spark, root,
      Seq((1L, "a", 111), (2L, "b", 222)).toDF("k", "v", "x"))  // v1
    SnapshotTable.dropColumns(spark, root, Seq("x"))            // v2
    val e = intercept[IllegalArgumentException](
      SnapshotTable.addColumns(spark, root,
        StructType(Seq(StructField("x", IntegerType)))))
    assert(e.getMessage.contains("compact"),
      s"re-add must point at compaction, got: ${e.getMessage}")
    SnapshotTable.compact(spark, root)                          // v3
    SnapshotTable.addColumns(spark, root,
      StructType(Seq(StructField("x", IntegerType))))           // v4
    // the ghost 111/222 must NOT resurface: compacted files have no
    // physical x, so the re-added column reads NULL everywhere
    val back = SnapshotTable.read(spark, root)
    assert(back.select("x").as[Option[Int]].collect().toSeq ==
      Seq(None, None))
    // and the marker is consumed: a second add of another dropped
    // name is a fresh decision
    assert(!SnapshotTable.tableProperties(spark, root).keys
      .exists(_.startsWith("graft.dropped.")))
  }

  test("drop refusals: merge-on-read tombstone key, hash-bucket " +
      "layout key, CHECK-referenced column, the last column, and an " +
      "unknown column all fail loudly") {
    val mor = tmpRoot()
    SnapshotTable.commit(spark, mor,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    SnapshotTable.mergeOnRead(spark, mor,
      Seq((1L, "a2")).toDF("k", "v"), "k")
    assert(intercept[IllegalArgumentException](
      SnapshotTable.dropColumns(spark, mor, Seq("k")))
      .getMessage.contains("tombstone"))

    val bucketed = tmpRoot()
    SnapshotTable.commitBucketed(spark, bucketed,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "k", 2)
    assert(intercept[IllegalArgumentException](
      SnapshotTable.dropColumns(spark, bucketed, Seq("k")))
      .getMessage.contains("bucket"))

    val checked = tmpRoot()
    SnapshotTable.commit(spark, checked,
      Seq((1L, "a")).toDF("k", "v"))
    SnapshotTable.setProperties(spark, checked,
      SnapshotTable.tableProperties(spark, checked) +
        ("graft.check.pos_k" -> "k > 0"))
    assert(intercept[IllegalArgumentException](
      SnapshotTable.dropColumns(spark, checked, Seq("k")))
      .getMessage.contains("CHECK"))
    // parsed references, not substring: `k > 0` does not pin `v`...
    SnapshotTable.dropColumns(spark, checked, Seq("v"))
    // ...and dropping the LAST remaining protected-free column refuses
    assert(intercept[IllegalArgumentException](
      SnapshotTable.dropColumns(spark, tmpRootWith(
        Seq((1L)).toDF("only")), Seq("only")))
      .getMessage.contains("every column"))

    assert(intercept[IllegalArgumentException](
      SnapshotTable.dropColumns(spark, checked, Seq("nope")))
      .getMessage.contains("no column"))
  }

  private def tmpRootWith(df: org.apache.spark.sql.DataFrame): String = {
    val root = tmpRoot()
    SnapshotTable.commit(spark, root, df)
    root
  }

  test("SQL surface: ALTER TABLE ... DROP COLUMN through the catalog, " +
      "IF EXISTS tolerated, dependency refusals surface, and the " +
      "dropped column's CURRENT DEFAULT dies with it") {
    catalogFor("graft_sedrop")
    spark.sql("CREATE TABLE graft_sedrop.db.t (k BIGINT, v STRING, " +
      "x INT DEFAULT 9)")
    spark.sql("INSERT INTO graft_sedrop.db.t VALUES (1, 'a', 5)")
    spark.sql("ALTER TABLE graft_sedrop.db.t DROP COLUMN x")
    assert(spark.table("graft_sedrop.db.t").columns.toSeq ==
      Seq("k", "v"))
    spark.sql("ALTER TABLE graft_sedrop.db.t DROP COLUMN IF EXISTS x")
    // default props are gone with the column
    val wh = spark.conf.get("spark.sql.catalog.graft_sedrop.warehouse")
    val props = SnapshotTable.tableProperties(spark, s"$wh/db/t")
    assert(!props.keys.exists(_.contains("default.x")),
      s"stale default property survived the drop: $props")
    assert(intercept[Exception](
      spark.sql("ALTER TABLE graft_sedrop.db.t DROP COLUMN nope"))
      .getMessage.contains("nope"))
  }
}
