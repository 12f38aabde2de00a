package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** Storage-partitioned joins (SnapshotTable.commitBucketed +
  * GraftScan.outputPartitioning + GraftCatalog's V2 bucket function):
  * two snapshot tables hash-bucketed the same way join with ZERO
  * shuffle — the scan reports KeyGroupedPartitioning and Spark aligns
  * bucket partitions instead of exchanging either side. */
class StoragePartitionedJoinSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse =
    java.nio.file.Files.createTempDirectory("graft-spj").toString

  locally {
    spark.conf.set("spark.sql.catalog.graftspj",
      classOf[graft.sources.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftspj.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftspj.db")
  }

  private def withSpj[A](body: => A): A = {
    val prevBucketing =
      spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val prevBroadcast =
      spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      prevBucketing.fold(spark.conf.unset(
        "spark.sql.sources.v2.bucketing.enabled"))(v =>
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v))
      prevBroadcast.fold(spark.conf.unset(
        "spark.sql.autoBroadcastJoinThreshold"))(v =>
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v))
    }
  }

  test("two co-bucketed snapshot tables join with ZERO exchange and " +
      "exact results; an unbucketed twin of the same join shuffles") {
    val factRoot = s"$warehouse/db/fact"
    val dimRoot = s"$warehouse/db/dim"
    val fact = (1 to 20000).map(i => (i.toLong % 997, i.toDouble))
      .toDF("k", "v")
    val dim = (0 to 996).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    SnapshotTable.commitBucketed(spark, factRoot, fact, "k", 8)
    SnapshotTable.commitBucketed(spark, dimRoot, dim, "k", 8)

    withSpj {
      val j = spark.table("graftspj.db.fact")
        .join(spark.table("graftspj.db.dim"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"storage-partitioned join still shuffles:\n$plan")
      // execute THIS frame (count() builds its own execution), then
      // the FINAL adaptive plan shows the ColumnarToRow transition —
      // bucketed partitions chain COLUMNAR readers, so the SPJ scan
      // stayed vectorized, no row-at-a-time fallback
      assert(j.collect().length == 20000)
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("ColumnarToRow"),
        s"bucketed scan de-vectorized:\n${finalPlan.take(1500)}")
      val got = j.groupBy("name").agg(sum("v").as("s"))
        .orderBy("name").collect()
      val want = fact.join(dim, "k").groupBy("name")
        .agg(sum("v").as("s")).orderBy("name").collect()
      assert(got.toSeq == want.toSeq)

      // control: the same data through plain (unbucketed) commits
      // must exchange — proving the zero-Exchange plan above came
      // from the reported partitioning, not from the data size
      val plainRootA = s"$warehouse/db/fact_plain"
      val plainRootB = s"$warehouse/db/dim_plain"
      SnapshotTable.commit(spark, plainRootA, fact)
      SnapshotTable.commit(spark, plainRootB, dim)
      val pj = spark.table("graftspj.db.fact_plain")
        .join(spark.table("graftspj.db.dim_plain"), "k")
      assert(pj.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(pj.count() == 20000)
    }
  }

  test("appendBucketed keeps the layout through ingest: the appended " +
      "batch lands in its buckets and the join stays exchange-free") {
    val aRoot = s"$warehouse/db/grow_a"
    val bRoot = s"$warehouse/db/grow_b"
    val a1 = (1 to 5000).map(i => (i.toLong % 997, i.toDouble))
      .toDF("k", "v")
    val a2 = (5001 to 9000).map(i => (i.toLong % 997, i.toDouble))
      .toDF("k", "v")
    val dim = (0 to 996).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    SnapshotTable.commitBucketed(spark, aRoot, a1, "k", 8)
    SnapshotTable.appendBucketed(spark, aRoot, a2)
    SnapshotTable.commitBucketed(spark, bRoot, dim, "k", 8)
    withSpj {
      val j = spark.table("graftspj.db.grow_a")
        .join(spark.table("graftspj.db.grow_b"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"append broke the bucket layout:\n$plan")
      assert(j.count() == 9000)
    }
  }

  test("group-by on the bucket key aggregates WITHOUT a shuffle: the " +
      "reported partitioning satisfies the aggregation's distribution") {
    val root = s"$warehouse/db/aggb"
    val data = (1 to 20000).map(i => (i.toLong % 997, i.toDouble))
      .toDF("k", "v")
    SnapshotTable.commitBucketed(spark, root, data, "k", 8)
    withSpj {
      val agg = spark.table("graftspj.db.aggb")
        .groupBy("k").agg(sum("v").as("s"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed group-by still shuffles:\n$plan")
      assert(agg.count() == 997)
      val direct = data.groupBy("k").agg(sum("v").as("s"))
      assert(agg.orderBy("k").collect().toSeq ==
        direct.orderBy("k").collect().toSeq)
    }
  }

  test("SQL INSERT INTO a bucketed table lands inside the declared " +
      "layout (bucket ids stamped, SPJ stays exchange-free through " +
      "catalog ingest); NULL bucket keys are refused") {
    val aRoot = s"$warehouse/db/ins_a"
    val bRoot = s"$warehouse/db/ins_b"
    SnapshotTable.commitBucketed(spark, aRoot,
      (1 to 4000).map(i => (i.toLong % 997, i.toDouble)).toDF("k", "v"),
      "k", 8)
    SnapshotTable.commitBucketed(spark, bRoot,
      (0 to 996).map(i => (i.toLong, s"d$i")).toDF("k", "name"),
      "k", 8)
    spark.sql(
      "INSERT INTO graftspj.db.ins_a SELECT id % 997, id * 1.0 " +
        "FROM range(4001, 6001)")
    // every file of the ingest history carries a bucket id
    val man = SnapshotTable.manifest(spark, aRoot,
      SnapshotTable.currentVersion(spark, aRoot))
    man.filter(_.kind == "d").foreach(e =>
      assert(e.statsFor("__bucket").isDefined,
        s"INSERT INTO landed ${e.path} outside the bucket layout"))
    withSpj {
      val j = spark.table("graftspj.db.ins_a")
        .join(spark.table("graftspj.db.ins_b"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"catalog INSERT broke the bucket layout:\n${plan.take(2000)}")
      assert(j.count() == 6000)
    }
    // NULL bucket key: refused, not silently mis-bucketed
    val e = intercept[Exception](spark.sql(
      "INSERT INTO graftspj.db.ins_a VALUES (CAST(NULL AS BIGINT), 1.0)"))
    assert((e.getMessage +
      Option(e.getCause).fold("")(_.getMessage)).contains("bucket"),
      e.getMessage)
  }

  test("pure-SQL bucketed DDL: CREATE TABLE ... PARTITIONED BY " +
      "(bucket(n, k)) records the same layout commitBucketed " +
      "declares, INSERT INTO lands inside it, and two tables created " +
      "and populated by SQL alone join with ZERO exchange") {
    spark.sql(
      """CREATE TABLE graftspj.db.sqlfact (k BIGINT, v DOUBLE)
        |PARTITIONED BY (bucket(8, k))""".stripMargin)
    spark.sql(
      """CREATE TABLE graftspj.db.sqldim (k BIGINT, name STRING)
        |PARTITIONED BY (bucket(8, k))""".stripMargin)
    // the DDL recorded exactly the commitBucketed property shape
    val props = SnapshotTable.tableProperties(spark,
      s"$warehouse/db/sqlfact")
    assert(props.get("graft.bucket.key").contains("k"), props)
    assert(props.get("graft.bucket.count").contains("8"), props)
    spark.sql("INSERT INTO graftspj.db.sqlfact " +
      "SELECT id % 997, id * 1.0 FROM range(0, 20000)")
    spark.sql("INSERT INTO graftspj.db.sqldim " +
      "SELECT id, concat('d', id) FROM range(0, 997)")
    // every data file carries its bucket id — the inserts landed
    // INSIDE the declared layout, not as layout-less stragglers
    val man = SnapshotTable.manifest(spark, s"$warehouse/db/sqlfact",
      SnapshotTable.currentVersion(spark, s"$warehouse/db/sqlfact"))
    man.filter(_.kind == "d").foreach(e =>
      assert(e.statsFor("__bucket").isDefined,
        s"SQL INSERT landed ${e.path} outside the bucket layout"))
    withSpj {
      val j = spark.sql(
        """SELECT f.k, f.v, d.name FROM graftspj.db.sqlfact f
          |JOIN graftspj.db.sqldim d ON f.k = d.k""".stripMargin)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"SQL-declared bucket layout still shuffles:\n" +
          plan.take(2000))
      assert(j.count() == 20000)
    }
    // a composite grid declares per-key transforms the same way
    spark.sql(
      """CREATE TABLE graftspj.db.sqlgrid (a BIGINT, b BIGINT,
        |v DOUBLE) PARTITIONED BY (bucket(4, a), bucket(2, b))"""
        .stripMargin)
    val gprops = SnapshotTable.tableProperties(spark,
      s"$warehouse/db/sqlgrid")
    assert(gprops.get("graft.bucket.key").contains("a,b"), gprops)
    assert(gprops.get("graft.bucket.count").contains("4,2"), gprops)
    // identity partitions are their OWN layout now (r13,
    // SnapshotPartitionSpec); here pin the remaining refusals:
    // mixing bucket + identity, time transforms, unknown columns,
    // duplicate keys
    val mixErr = intercept[Exception](spark.sql(
      "CREATE TABLE graftspj.db.badmix (k BIGINT, d STRING) " +
        "PARTITIONED BY (bucket(4, k), d)"))
    assert((mixErr.getMessage +
      Option(mixErr.getCause).fold("")(_.getMessage))
      .contains("not both"), mixErr.getMessage)
    val daysErr = intercept[Exception](spark.sql(
      "CREATE TABLE graftspj.db.baddays (k BIGINT, ts TIMESTAMP) " +
        "PARTITIONED BY (days(ts))"))
    assert((daysErr.getMessage +
      Option(daysErr.getCause).fold("")(_.getMessage)).contains("bucket"),
      daysErr.getMessage)
    val colErr = intercept[Exception](spark.sql(
      "CREATE TABLE graftspj.db.badcol (k BIGINT) " +
        "PARTITIONED BY (bucket(4, nope))"))
    assert(colErr.getMessage.contains("nope"), colErr.getMessage)
    val dupErr = intercept[Exception](spark.sql(
      "CREATE TABLE graftspj.db.baddup (k BIGINT) " +
        "PARTITIONED BY (bucket(4, k), bucket(8, k))"))
    assert((dupErr.getMessage +
      Option(dupErr.getCause).fold("")(_.getMessage))
      .matches("(?s).*(at most one|[Dd]uplicate).*"), dupErr.getMessage)
  }

  test("SQL INSERT INTO a composite-grid table records stats for " +
      "EVERY grid key: the appended files carry NDV sketches and a " +
      "range for the secondary key too, so table-wide NDV (all-files " +
      "rule) and range pruning survive catalog ingest") {
    val root = s"$warehouse/db/grid_ins"
    SnapshotTable.commitBucketedOn(spark, root,
      (1 to 3000).map(i => (i.toLong % 97, i.toLong % 11, i.toDouble))
        .toDF("a", "b", "v"),
      Seq("a" -> 4, "b" -> 3))
    val before = SnapshotTable.manifest(spark, root,
      SnapshotTable.currentVersion(spark, root))
    assert(before.filter(_.kind == "d").forall(e =>
      e.ndv.exists(_._1 == "b")), "grid commit must sketch b")
    spark.sql("INSERT INTO graftspj.db.grid_ins " +
      "SELECT id % 97, id % 11, id * 1.0 FROM range(3001, 5001)")
    val after = SnapshotTable.manifest(spark, root,
      SnapshotTable.currentVersion(spark, root))
    val appended = after.filterNot(e =>
      before.exists(_.path == e.path)).filter(_.kind == "d")
    assert(appended.nonEmpty, "INSERT must add files")
    appended.foreach { e =>
      assert(e.ndv.exists(_._1 == "a") && e.ndv.exists(_._1 == "b"),
        s"${e.path}: every grid key needs an NDV sketch, " +
          s"got ${e.ndv.map(_._1)}")
      assert(e.statsFor("b").isDefined,
        s"${e.path}: secondary grid key needs a recorded range")
      assert(e.statsFor("__bucket").isDefined,
        s"${e.path}: grid cell id must still be stamped")
    }
    // the all-files rule keeps table-wide NDV for BOTH keys alive
    val est = SnapshotTable.ndvEstimates(after)
    assert(est.contains("a") && est.contains("b"),
      s"one key-less append dropped a grid key's NDV: $est")
  }

  test("merge-on-read SQL UPDATE on a bucketed table lands its delta " +
      "files INSIDE the bucket layout: SPJ stays exchange-free " +
      "through the MOR history, no compaction needed") {
    val aRoot = s"$warehouse/db/morb_a"
    val bRoot = s"$warehouse/db/morb_b"
    spark.sql(
      """CREATE TABLE graftspj.db.morb_a (k BIGINT, v DOUBLE)
        |TBLPROPERTIES ('write.update.mode'='merge-on-read',
        |  'write.merge.key'='k')""".stripMargin)
    // bucket AFTER create: commitBucketed declares the layout props
    // on top of the row-level ones
    SnapshotTable.commitBucketed(spark, aRoot,
      (1 to 8000).map(i => (i.toLong % 997, i.toDouble)).toDF("k", "v"),
      "k", 8)
    SnapshotTable.commitBucketed(spark, bRoot,
      (0 to 996).map(i => (i.toLong, s"d$i")).toDF("k", "name"),
      "k", 8)
    // commitBucketed overwrote the properties file? both sets must
    // survive — re-assert the row-level knobs are still there
    val props = SnapshotTable.tableProperties(spark, aRoot)
    assert(props.get("graft.bucket.key").contains("k"), props)
    assert(props.get("write.merge.key").contains("k"), props)

    val before = SnapshotTable.manifest(spark, aRoot,
      SnapshotTable.currentVersion(spark, aRoot))
    spark.sql(
      "UPDATE graftspj.db.morb_a SET v = -1.0 WHERE k % 100 = 7")
    val after = SnapshotTable.manifest(spark, aRoot,
      SnapshotTable.currentVersion(spark, aRoot))
    // delta commit: prior files untouched, a tombstone added, and
    // EVERY new data file carries a bucket id
    before.foreach(e => assert(after.exists(_.path == e.path),
      s"MOR update dropped ${e.path}"))
    assert(after.exists(_.kind == "t"), "no tombstone")
    val newData = after.filter(e => e.kind == "d" &&
      !before.exists(_.path == e.path))
    assert(newData.nonEmpty, "update wrote no delta files")
    newData.foreach(e => assert(e.statsFor("__bucket").isDefined,
      s"delta file ${e.path} lost the bucket layout"))

    withSpj {
      val j = spark.table("graftspj.db.morb_a")
        .join(spark.table("graftspj.db.morb_b"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"MOR history broke SPJ:\n${plan.take(2000)}")
      assert(j.count() == 8000)
      // updated values visible through the join
      assert(j.filter(col("v") === -1.0).count() ==
        (1 to 8000).count(i => (i % 997) % 100 == 7))
    }
  }

  test("bucketed layout survives sparse buckets and reads exactly; " +
      "compaction PRESERVES the declared layout; a plain unbucketed " +
      "append degrades to unknown partitioning (correct, shuffled)") {
    val aRoot = s"$warehouse/db/sparse_a"
    val bRoot = s"$warehouse/db/sparse_b"
    // few keys: some of the 8 buckets are EMPTY on one or both sides
    val a = (1 to 40).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
    val b = (1 to 10).map(i => (i.toLong, s"x$i")).toDF("k", "name")
    SnapshotTable.commitBucketed(spark, aRoot, a, "k", 8)
    SnapshotTable.commitBucketed(spark, bRoot, b, "k", 8)
    withSpj {
      // partially-clustered: with push-part-values (default on) Spark
      // aligns the present buckets and fills the gaps — the join must
      // stay exchange-free even though some buckets exist on only one
      // side, and the RESULT must stay exact
      val j = spark.table("graftspj.db.sparse_a")
        .join(spark.table("graftspj.db.sparse_b"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"sparse-bucket SPJ shuffled:\n${plan.take(2000)}")
      assert(j.count() == 10)
    }
    // compaction re-stages INTO the declared bucket layout, so the
    // maintenance pass does not demote SPJ to a shuffle
    SnapshotTable.compact(spark, aRoot)
    withSpj {
      val j2 = spark.table("graftspj.db.sparse_a")
        .join(spark.table("graftspj.db.sparse_b"), "k")
      assert(!j2.queryExecution.executedPlan.toString.contains("Exchange"),
        "compaction lost the bucket layout")
      assert(j2.count() == 10)
    }
    // a PLAIN append adds a bucket-less file: the scan must stop
    // reporting the layout (never wrongly claim it) and stay correct
    SnapshotTable.append(spark, aRoot,
      Seq((41L, 41.0)).toDF("k", "v"))
    withSpj {
      val j3 = spark.table("graftspj.db.sparse_a")
        .join(spark.table("graftspj.db.sparse_b"), "k")
      assert(j3.queryExecution.executedPlan.toString.contains("Exchange"),
        "scan claimed a bucket layout over a bucket-less file")
      assert(j3.count() == 10)
    }
  }

  test("COMPOSITE bucket layout: a two-column join key bucketed over " +
      "both columns joins with ZERO exchange, catalog INSERT lands " +
      "inside the layout, and a single-column twin of the same join " +
      "still shuffles") {
    val aRoot = s"$warehouse/db/comp_a"
    val bRoot = s"$warehouse/db/comp_b"
    // (region, day) — a two-column key neither column determines alone
    val fact = (1 to 20000)
      .map(i => (i.toLong % 23, s"d${i % 97}", i.toDouble))
      .toDF("region", "day", "v")
    val dim = (for (r <- 0 to 22; d <- 0 to 96)
      yield (r.toLong, s"d$d", s"n$r-$d")).toDF("region", "day", "name")
    SnapshotTable.commitBucketedOn(spark, aRoot, fact,
      Seq("region" -> 4, "day" -> 4))
    SnapshotTable.commitBucketedOn(spark, bRoot, dim,
      Seq("region" -> 4, "day" -> 4))
    withSpj {
      val j = spark.table("graftspj.db.comp_a")
        .join(spark.table("graftspj.db.comp_b"),
          Seq("region", "day"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"composite-bucketed join still shuffles:\n${plan.take(2000)}")
      assert(j.count() == 20000)
      val got = j.groupBy("name").agg(sum("v").as("s"))
        .orderBy("name").collect()
      val want = fact.join(dim, Seq("region", "day")).groupBy("name")
        .agg(sum("v").as("s")).orderBy("name").collect()
      assert(got.toSeq == want.toSeq)
    }
    // catalog INSERT through the V2 write path: the composite writer
    // stamps bucket ids that agree with the layout, so SPJ survives
    spark.sql(
      "INSERT INTO graftspj.db.comp_a " +
        "SELECT id % 23, concat('d', id % 97), id * 1.0 " +
        "FROM range(20001, 24001)")
    val man = SnapshotTable.manifest(spark, aRoot,
      SnapshotTable.currentVersion(spark, aRoot))
    man.filter(_.kind == "d").foreach(e =>
      assert(e.statsFor("__bucket").isDefined,
        s"composite INSERT landed ${e.path} outside the layout"))
    withSpj {
      val j2 = spark.table("graftspj.db.comp_a")
        .join(spark.table("graftspj.db.comp_b"),
          Seq("region", "day"))
      val plan2 = j2.queryExecution.executedPlan.toString
      assert(!plan2.contains("Exchange"),
        s"composite INSERT broke the layout:\n${plan2.take(2000)}")
      assert(j2.count() == 24000)
    }
    // control: same data single-column-bucketed cannot serve the
    // two-column join's distribution — it must exchange
    val cRoot = s"$warehouse/db/comp_c"
    SnapshotTable.commitBucketed(spark, cRoot, fact, "region", 8)
    withSpj {
      val j3 = spark.table("graftspj.db.comp_c")
        .join(spark.table("graftspj.db.comp_b"),
          Seq("region", "day"))
      assert(j3.queryExecution.executedPlan.toString.contains("Exchange"),
        "a single-column layout wrongly satisfied a two-column join")
      assert(j3.count() == 20000)
    }
  }

  test("MISMATCHED sparse cell sets: two tables whose non-empty " +
      "buckets differ still join exchange-free under pushPartValues " +
      "(Spark aligns the value sets), and exactly — the skew/sparsity " +
      "story at scale; without it the planner correctly shuffles") {
    val aRoot = s"$warehouse/db/pp_a"
    val bRoot = s"$warehouse/db/pp_b"
    // A's keys hash into one sparse bucket subset, B's into another
    // (overlapping but different): partition values don't line up
    val a = (1 to 4000).map(i => (i.toLong % 37, i.toDouble))
      .toDF("k", "v")
    val b = (0 to 11).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    SnapshotTable.commitBucketed(spark, aRoot, a, "k", 16)
    SnapshotTable.commitBucketed(spark, bRoot, b, "k", 16)
    val want = a.join(b, "k").groupBy("name").agg(sum("v").as("s"))
      .orderBy("name").collect().toSeq
    def joined() = spark.table("graftspj.db.pp_a")
      .join(spark.table("graftspj.db.pp_b"), "k")
    withSpj {
      val key = "spark.sql.sources.v2.bucketing.pushPartValues.enabled"
      val prev = spark.conf.getOption(key)
      try {
        // pushPartValues OFF: mismatched values -> an honest shuffle
        // (Spark 4 defaults it ON, so the control pins it explicitly)
        spark.conf.set(key, "false")
        assert(joined().queryExecution.executedPlan.toString
          .contains("Exchange"),
          "mismatched cell sets must not silently co-partition")
        // ON (the default): Spark aligns the value sets, zero exchange
        spark.conf.set(key, "true")
        val j = joined()
        assert(!j.queryExecution.executedPlan.toString
          .contains("Exchange"),
          "pushPartValues should align the sparse cell sets")
        val got = j.groupBy("name").agg(sum("v").as("s"))
          .orderBy("name").collect().toSeq
        assert(got == want)
      } finally prev.fold(spark.conf.unset(key))(v =>
        spark.conf.set(key, v))
    }
  }
}
