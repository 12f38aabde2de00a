package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** IDENTITY partitioning (`commitPartitioned` / `PARTITIONED BY
  * (col)`): value-pure data files, exact partition pruning, manifest
  * answered GROUP BY (zero data IO), layout survival through append
  * and compaction, and NULL-key refusal. */
class SnapshotPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-part").toString + "/t"

  private def readFmt(root: String) =
    spark.read.format("graft-snapshot").option("path", root)

  private def fixture(n: Int = 10000) =
    (1 to n).map(i => (i.toLong, s"cat_${i % 7}", i * 1.5))
      .toDF("id", "category", "score")

  test("commitPartitioned writes VALUE-PURE files: every data file's " +
      "recorded min == max on the key, zero nulls, and the key " +
      "column is still stored in the files themselves") {
    val root = tmpRoot()
    SnapshotTable.commitPartitioned(spark, root, fixture(), "category")
    val data = SnapshotTable.manifest(spark, root,
      SnapshotTable.currentVersion(spark, root)).filter(_.kind == "d")
    assert(data.nonEmpty)
    assert(data.forall(e => e.statsKey.contains("category") &&
      e.lo.isDefined && e.lo == e.hi && e.statsNulls.contains(0L)),
      s"impure files: ${data.filterNot(e => e.lo == e.hi)}")
    assert(data.map(_.lo.get).distinct.sorted ==
      (0 until 7).map(i => s"cat_$i"))
    // the key survives IN the data (unlike Hive-style layouts, where
    // readers must re-derive it from the path)
    val one = new org.apache.hadoop.fs.Path(root, data.head.path)
    val cols = spark.read.parquet(one.toString).columns.toSeq
    assert(cols.contains("category") && !cols.contains("__pv"))
    // round-trip: native read equals the input
    val got = SnapshotTable.read(spark, root)
    assert(got.count() == 10000)
    assert(got.agg(sum("id")).as[Long].head() ==
      (1 to 10000).map(_.toLong).sum)
  }

  test("NULL partition keys are refused and the failed write leaves " +
      "no new version and no staged garbage") {
    val root = tmpRoot()
    SnapshotTable.commitPartitioned(spark, root, fixture(100), "category")
    val v = SnapshotTable.currentVersion(spark, root)
    val withNull = fixture(50).union(
      Seq((999L, null: String, 1.0)).toDF("id", "category", "score"))
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.appendPartitioned(spark, root, withNull)
    }
    assert(e.getMessage.contains("NULL partition key"))
    assert(SnapshotTable.currentVersion(spark, root) == v)
  }

  test("GROUP BY the partition key answers from the MANIFEST alone: " +
      "the plan reads zero data files — still correct after the " +
      "data directory is moved away — and equals the computed result") {
    val root = tmpRoot()
    val df = fixture(20000)
    SnapshotTable.commitPartitioned(spark, root, df, "category")
    val expected = df.groupBy("category")
      .agg(count(lit(1)).as("n"), min("category").as("lo"),
        max("category").as("hi"))
      .orderBy("category").collect().map(_.toSeq).toSeq

    val q = readFmt(root).load().groupBy("category")
      .agg(count(lit(1)).as("n"), min("category").as("lo"),
        max("category").as("hi"))
      .orderBy("category")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates") &&
      plan.contains("group by category"), s"not pushed:\n$plan")
    assert(plan.contains("files=0/"), s"data files planned:\n$plan")
    assert(q.collect().map(_.toSeq).toSeq == expected)

    // zero data IO, proven the hard way
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val dataDir = new org.apache.hadoop.fs.Path(root, "_data")
    val hidden = new org.apache.hadoop.fs.Path(root + "_hidden")
    assert(fs.rename(dataDir, hidden))
    try {
      spark.catalog.refreshByPath(root)
      assert(readFmt(root).load().groupBy("category")
        .agg(count(lit(1)).as("n")).orderBy("category")
        .collect().map(_.toSeq).toSeq ==
        expected.map(r => Seq(r.head, r(1))))
    } finally { fs.rename(hidden, dataDir); () }
  }

  test("GROUP BY pushdown DECLINES soundly: under a filter, under " +
      "merge-on-read tombstones, and on value-impure files the scan " +
      "reads rows and the answer stays identical") {
    val root = tmpRoot()
    val df = fixture(5000)
    SnapshotTable.commitPartitioned(spark, root, df, "category")
    val expectFiltered = df.filter(col("id") <= 2500)
      .groupBy("category").agg(count(lit(1)).as("n"))
      .orderBy("category").collect().map(_.toSeq).toSeq
    val qf = readFmt(root).load().filter(col("id") <= 2500)
      .groupBy("category").agg(count(lit(1)).as("n"))
      .orderBy("category")
    assert(!qf.queryExecution.executedPlan.toString
      .contains("group by category"))
    assert(qf.collect().map(_.toSeq).toSeq == expectFiltered)

    // MOR tombstones: counts must come from rows, not footer counts
    SnapshotTable.deleteKeysOnRead(spark, root,
      Seq("cat_0").toDF("category"), "category")
    val expectMor = df.filter(col("category") =!= "cat_0")
      .groupBy("category").agg(count(lit(1)).as("n"))
      .orderBy("category").collect().map(_.toSeq).toSeq
    val qm = readFmt(root).load().groupBy("category")
      .agg(count(lit(1)).as("n")).orderBy("category")
    assert(!qm.queryExecution.executedPlan.toString
      .contains("group by category"))
    assert(qm.collect().map(_.toSeq).toSeq == expectMor)

    // plain (value-impure) commit: pushdown declines, answer equal
    val root2 = tmpRoot()
    SnapshotTable.commit(spark, root2, df, clusterKey = Some("id"))
    val q2 = readFmt(root2).load().groupBy("category")
      .agg(count(lit(1)).as("n")).orderBy("category")
    assert(!q2.queryExecution.executedPlan.toString
      .contains("group by category"))
    assert(q2.collect().map(_.toSeq).toSeq ==
      df.groupBy("category").agg(count(lit(1)).as("n"))
        .orderBy("category").collect().map(_.toSeq).toSeq)
  }

  test("partition pruning is EXACT: an equality predicate on the key " +
      "plans only that value's files, and appendPartitioned keeps " +
      "the layout (new files value-pure, group-by still manifest-only)") {
    val root = tmpRoot()
    SnapshotTable.commitPartitioned(spark, root, fixture(7000),
      "category")
    SnapshotTable.appendPartitioned(spark, root,
      (7001 to 9000).map(i => (i.toLong, s"cat_${i % 7}", i * 1.5))
        .toDF("id", "category", "score"))
    val data = SnapshotTable.manifest(spark, root,
      SnapshotTable.currentVersion(spark, root)).filter(_.kind == "d")
    assert(data.forall(e => e.lo.isDefined && e.lo == e.hi))
    val q = readFmt(root).load().filter(col("category") === "cat_3")
    val d = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    val planned = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(d).get
    val (kept, total) = (planned.group(1).toInt, planned.group(2).toInt)
    assert(kept < total && kept == data.count(_.lo.contains("cat_3")),
      s"pruning inexact: $kept/$total")
    assert(q.count() == 9000 / 7 + (if (3 <= 9000 % 7) 1 else 0))
    // group-by is still manifest-only after the append
    val g = readFmt(root).load().groupBy("category")
      .agg(count(lit(1)).as("n"))
    assert(g.queryExecution.executedPlan.toString.contains("files=0/"))
    assert(g.orderBy("category").as[(String, Long)].collect().toSeq ==
      (0 until 7).map(i =>
        (s"cat_$i", 9000L / 7 + (if (i <= 9000 % 7 && i != 0) 1 else 0))))
  }

  private val warehouse =
    java.nio.file.Files.createTempDirectory("graft-partsql").toString

  locally {
    spark.conf.set("spark.sql.catalog.graftpart",
      classOf[graft.sources.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftpart.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftpart.db")
  }

  test("SQL surface: CREATE TABLE PARTITIONED BY (col) + INSERT " +
      "lands value-pure files, SQL GROUP BY answers from the " +
      "manifest, DESCRIBE shows the layout, and dropping or " +
      "renaming the partition key refuses") {
    spark.sql("CREATE TABLE graftpart.db.ev (id BIGINT, day STRING, " +
      "amount DOUBLE) PARTITIONED BY (day)")
    fixture(9000)
      .select(col("id"), concat(lit("d"), col("category")).as("day"),
        col("score").as("amount"))
      .createOrReplaceTempView("ev_src")
    spark.sql("INSERT INTO graftpart.db.ev SELECT * FROM ev_src")
    val data = SnapshotTable.manifest(spark, s"$warehouse/db/ev",
      SnapshotTable.currentVersion(spark, s"$warehouse/db/ev"))
      .filter(_.kind == "d")
    assert(data.nonEmpty && data.forall(e =>
      e.statsKey.contains("day") && e.lo == e.hi &&
        e.statsNulls.contains(0L)),
      s"INSERT broke value purity: $data")
    val g = spark.sql("SELECT day, count(*) AS n FROM " +
      "graftpart.db.ev GROUP BY day ORDER BY day")
    assert(g.queryExecution.executedPlan.toString.contains("files=0/"),
      "SQL GROUP BY did not answer from the manifest")
    assert(g.as[(String, Long)].collect().toSeq ==
      fixture(9000).groupBy(concat(lit("d"), col("category")))
        .count().orderBy(col("concat(d, category)"))
        .as[(String, Long)].collect().toSeq)
    val desc = spark.sql("DESCRIBE EXTENDED graftpart.db.ev")
      .collect().map(_.toSeq.mkString("|")).mkString("\n")
    assert(desc.contains("day"), s"partitioning not described:\n$desc")
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE graftpart.db.ev DROP COLUMN day") }
    assert(e1.getMessage.contains("identity-partition key"))
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graftpart.db.ev RENAME COLUMN day TO d2") }
    assert(e2.getMessage.contains("identity-partition key"))
    // NULL keys refuse through SQL too
    val e3 = intercept[Exception] {
      spark.sql("INSERT INTO graftpart.db.ev VALUES (1, NULL, 0.5)") }
    assert(e3.getMessage.contains("NULL partition key") ||
      Option(e3.getCause).exists(
        _.getMessage.contains("NULL partition key")))
  }

  test("identity SPJ: two tables PARTITIONED BY the same column join " +
      "with ZERO exchange (and the same join over unpartitioned " +
      "twins shuffles)") {
    val days = (0 until 11).map(i => f"2024-01-${i + 1}%02d")
    val fact = (1 to 22000).map(i =>
      (i.toLong, days(i % 11), i * 2.0)).toDF("id", "day", "v")
    val dim = days.zipWithIndex.map { case (d, i) =>
      (d, s"label_$i") }.toDF("day", "label")
    SnapshotTable.commitPartitioned(spark,
      s"$warehouse/db/fact_id", fact, "day")
    SnapshotTable.commitPartitioned(spark,
      s"$warehouse/db/dim_id", dim, "day")
    val prevB =
      spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val prevT =
      spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("graftpart.db.fact_id")
        .join(spark.table("graftpart.db.dim_id"), "day")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"identity SPJ still shuffles:\n$plan")
      assert(j.count() == 22000)
      val got = j.groupBy("label").agg(sum("v").as("s"))
        .orderBy("label").collect().map(_.toSeq).toSeq
      val want = fact.join(dim, "day").groupBy("label")
        .agg(sum("v").as("s")).orderBy("label")
        .collect().map(_.toSeq).toSeq
      assert(got == want)
      // control: unpartitioned twins exchange
      SnapshotTable.commit(spark, s"$warehouse/db/fact_pl", fact)
      SnapshotTable.commit(spark, s"$warehouse/db/dim_pl", dim)
      val pj = spark.table("graftpart.db.fact_pl")
        .join(spark.table("graftpart.db.dim_pl"), "day")
      assert(pj.queryExecution.executedPlan.toString
        .contains("Exchange"))
      assert(pj.count() == 22000)
    } finally {
      prevB.fold(spark.conf.unset(
        "spark.sql.sources.v2.bucketing.enabled"))(v =>
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v))
      prevT.fold(spark.conf.unset(
        "spark.sql.autoBroadcastJoinThreshold"))(v =>
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v))
    }
  }

  test("identity SPJ is SORT-FREE: the scan reports per-partition " +
      "ordering on its constant keys, so the co-partitioned join " +
      "plans a SortMergeJoin with ZERO exchange and ZERO sort; an " +
      "ORDER BY on a NON-key column still inserts its sort (the " +
      "report never overclaims)") {
    val days = (0 until 9).map(i => f"2024-02-${i + 1}%02d")
    val fact = (1 to 18000).map(i =>
      (i.toLong, days(i % 9), i * 0.5)).toDF("id", "day", "v")
    val dim = days.zipWithIndex.map { case (d, i) =>
      (d, s"lab_$i") }.toDF("day", "label")
    SnapshotTable.commitPartitioned(spark,
      s"$warehouse/db/fact_so", fact, "day")
    SnapshotTable.commitPartitioned(spark,
      s"$warehouse/db/dim_so", dim, "day")
    val prevB =
      spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val prevT =
      spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def sorts(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.SortExec => s }.size
      val j = spark.table("graftpart.db.fact_so")
        .join(spark.table("graftpart.db.dim_so"), "day")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"expected a sort-merge join under SPJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"identity SPJ still shuffles:\n$plan")
      assert(sorts(j) == 0,
        s"constant-key partitions still sorted:\n$plan")
      assert(j.count() == 18000)
      val got = j.groupBy("label").agg(sum("v").as("s"))
        .orderBy("label").collect().map(_.toSeq).toSeq
      val want = fact.join(dim, "day").groupBy("label")
        .agg(sum("v").as("s")).orderBy("label")
        .collect().map(_.toSeq).toSeq
      assert(got == want)
      // the report claims ONLY the identity keys: ordering by a
      // non-key column still pays its sort
      val o = spark.table("graftpart.db.fact_so")
        .sortWithinPartitions("v")
      assert(sorts(o) == 1,
        "non-key ordering was wrongly assumed satisfied")
      // and the key ordering itself is assumed satisfied per
      // partition — a sortWithinPartitions on the key is a no-op
      val ok = spark.table("graftpart.db.fact_so")
        .sortWithinPartitions("day")
      assert(sorts(ok) == 0,
        s"key ordering not consumed:\n${ok.queryExecution.executedPlan}")
    } finally {
      prevB.fold(spark.conf.unset(
        "spark.sql.sources.v2.bucketing.enabled"))(v =>
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v))
      prevT.fold(spark.conf.unset(
        "spark.sql.autoBroadcastJoinThreshold"))(v =>
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v))
    }
  }

  test("filters ON the partition key are CONSUMED (no residual, no " +
      "Filter node): equality keeps exactly that value's files, a " +
      "STRICT bound excludes the boundary value, COUNT(*) under the " +
      "filter answers from the manifest, and a mixed filter keeps " +
      "the non-key part residual") {
    val root = tmpRoot()
    val df = fixture(7000)
    SnapshotTable.commitPartitioned(spark, root, df, "category")
    def filterNodes(q: org.apache.spark.sql.DataFrame): Int =
      q.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FilterExec => f }.size
    val q = readFmt(root).load().filter(col("category") === "cat_3")
    assert(filterNodes(q) == 0,
      s"key filter not consumed:\n${q.queryExecution.executedPlan}")
    assert(q.collect().map(_.getAs[String]("category")).toSet ==
      Set("cat_3"))
    assert(q.count() == df.filter(col("category") === "cat_3").count())
    // the count above: consumed filter + manifest COUNT — zero files
    val cq = readFmt(root).load()
      .filter(col("category") === "cat_3")
      .agg(count(lit(1)).as("n"))
    assert(cq.queryExecution.executedPlan.toString.contains("files=0/"),
      s"filtered count not manifest-answered:\n${cq.queryExecution
        .executedPlan}")
    assert(cq.as[Long].head() ==
      df.filter(col("category") === "cat_3").count())
    // STRICT bound: the generic range pruning keeps the boundary
    // file; the exactness re-decision must drop it
    val qs = readFmt(root).load().filter(col("category") > "cat_3")
    assert(filterNodes(qs) == 0)
    assert(qs.collect().map(_.getAs[String]("category")).toSet ==
      Set("cat_4", "cat_5", "cat_6"))
    // grouped answer under a consumed RANGE filter stays manifest-only
    val gq = readFmt(root).load()
      .filter(col("category") >= "cat_4")
      .groupBy("category").agg(count(lit(1)).as("n"))
      .orderBy("category")
    assert(gq.queryExecution.executedPlan.toString.contains("files=0/"))
    assert(gq.as[(String, Long)].collect().toSeq ==
      df.filter(col("category") >= "cat_4")
        .groupBy("category").agg(count(lit(1)).as("n"))
        .orderBy("category").as[(String, Long)].collect().toSeq)
    // a conjunction with a NON-key predicate keeps that part residual
    // (Filter node present) and stays exact
    val qm = readFmt(root).load()
      .filter(col("category") === "cat_2" && col("id") <= 3500)
    assert(filterNodes(qm) == 1,
      s"non-key part should stay residual:\n${qm.queryExecution
        .executedPlan}")
    assert(qm.count() ==
      df.filter(col("category") === "cat_2" && col("id") <= 3500)
        .count())
    // a table whose stats column is NOT the filtered one consumes
    // nothing: the same key filter keeps its Filter node. (A 7-value
    // range-clustered table can come out value-pure by accident, so
    // cluster on id to pin the negative case.)
    val root2 = tmpRoot()
    SnapshotTable.commit(spark, root2, df, clusterKey = Some("id"))
    val qi = readFmt(root2).load().filter(col("category") === "cat_3")
    assert(filterNodes(qi) == 1)
    assert(qi.count() == df.filter(col("category") === "cat_3").count())
  }

  test("after ANALYZE, grouped MIN/MAX of a NON-group numeric column " +
      "answers from the manifest too (min/max decompose over the " +
      "group's files), and declines when a file lacks the stats") {
    val root = tmpRoot()
    val df = fixture(8000)
    SnapshotTable.commitPartitioned(spark, root, df, "category")
    // before analyze: score has no per-file range stats -> scan rows
    val q0 = readFmt(root).load().groupBy("category")
      .agg(min("score").as("lo"), max("score").as("hi"))
    assert(!q0.queryExecution.executedPlan.toString
      .contains("files=0/"))
    SnapshotTable.analyze(spark, root)
    val q = readFmt(root).load().groupBy("category")
      .agg(count(lit(1)).as("n"), min("score").as("lo"),
        max("score").as("hi"))
      .orderBy("category")
    assert(q.queryExecution.executedPlan.toString.contains("files=0/"),
      s"analyzed ranges not used:\n${q.queryExecution.executedPlan}")
    assert(q.collect().map(_.toSeq).toSeq ==
      df.groupBy("category")
        .agg(count(lit(1)).as("n"), min("score").as("lo"),
          max("score").as("hi"))
        .orderBy("category").collect().map(_.toSeq).toSeq)
    // id is numeric, so analyze covered it too — both extremes push
    val qs = readFmt(root).load().groupBy("category")
      .agg(min("id").as("lo"), max("id").as("hi"))
    assert(qs.queryExecution.executedPlan.toString.contains("files=0/"))
    assert(qs.orderBy("category").as[(String, Long, Long)]
      .collect().toSeq ==
      df.groupBy("category").agg(min("id").as("lo"), max("id").as("hi"))
        .orderBy("category").as[(String, Long, Long)].collect().toSeq)
  }

  test("GROUP BY the partition key with a NON-pushable aggregate " +
      "(SUM) reads data but does NOT shuffle: the reported " +
      "KeyGroupedPartitioning satisfies the aggregation") {
    val root = s"$warehouse/db/aggp"
    val df = fixture(15000)
    SnapshotTable.commitPartitioned(spark, root, df, "category")
    val prevB =
      spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val agg = spark.table("graftpart.db.aggp")
        .groupBy("category").agg(sum("score").as("s"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"identity group-by still shuffles:\n$plan")
      assert(agg.count() == 7)
      assert(agg.orderBy("category").collect().map(_.toSeq).toSeq ==
        df.groupBy("category").agg(sum("score").as("s"))
          .orderBy("category").collect().map(_.toSeq).toSeq)
    } finally {
      prevB.fold(spark.conf.unset(
        "spark.sql.sources.v2.bucketing.enabled"))(v =>
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v))
    }
  }

  test("row-level SQL (UPDATE, DELETE) PRESERVES the identity " +
      "layout: rewritten files stay value-pure, and the manifest " +
      "GROUP BY still answers afterwards") {
    spark.sql("CREATE TABLE graftpart.db.rl (id BIGINT, cat STRING, " +
      "v DOUBLE) PARTITIONED BY (cat)")
    val root = s"$warehouse/db/rl"
    (1 to 6000).map(i => (i.toLong, s"c${i % 5}", i * 1.0))
      .toDF("id", "cat", "v").createOrReplaceTempView("rl_src")
    spark.sql("INSERT INTO graftpart.db.rl SELECT * FROM rl_src")
    // COW UPDATE touching a few rows of two partitions
    spark.sql("UPDATE graftpart.db.rl SET v = v + 1000000 " +
      "WHERE id % 997 = 0")
    def pure(): Unit = {
      val data = SnapshotTable.manifest(spark, root,
        SnapshotTable.currentVersion(spark, root)).filter(_.kind == "d")
      assert(data.nonEmpty && data.forall(e =>
        e.statsKey.contains("cat") && e.lo == e.hi &&
          e.statsNulls.contains(0L)),
        s"row-level op broke value purity: ${data.filterNot(e =>
          e.lo == e.hi)}")
    }
    pure()
    val g = spark.sql("SELECT cat, count(*) AS n FROM graftpart.db.rl " +
      "GROUP BY cat ORDER BY cat")
    assert(g.queryExecution.executedPlan.toString.contains("files=0/"),
      "manifest GROUP BY lost after UPDATE")
    assert(g.as[(String, Long)].collect().toSeq ==
      (0 until 5).map(i => (s"c$i", 1200L)))
    assert(spark.sql("SELECT count(*) FROM graftpart.db.rl " +
      "WHERE v > 999999").as[Long].head() == 6)
    // DELETE with a NON-key condition forces the scan+rewrite tier;
    // the rewrite must come back value-pure too
    spark.sql("DELETE FROM graftpart.db.rl WHERE id % 1001 = 0")
    pure()
    val g2 = spark.sql("SELECT cat, count(*) AS n FROM " +
      "graftpart.db.rl GROUP BY cat ORDER BY cat")
    assert(g2.queryExecution.executedPlan.toString.contains("files=0/"))
    assert(g2.as[(String, Long)].collect().map(_._2).sum == 6000 - 5)
  }

  test("compaction PRESERVES the identity layout: files stay " +
      "value-pure, the manifest group-by still answers, and the " +
      "compacted answer equals the pre-compaction one") {
    val root = tmpRoot()
    SnapshotTable.commitPartitioned(spark, root, fixture(4000),
      "category")
    SnapshotTable.appendPartitioned(spark, root,
      (4001 to 6000).map(i => (i.toLong, s"cat_${i % 7}", i * 1.5))
        .toDF("id", "category", "score"))
    val before = readFmt(root).load().groupBy("category")
      .agg(count(lit(1)).as("n")).orderBy("category")
      .collect().map(_.toSeq).toSeq
    SnapshotTable.compact(spark, root)
    val data = SnapshotTable.manifest(spark, root,
      SnapshotTable.currentVersion(spark, root)).filter(_.kind == "d")
    assert(data.forall(e => e.statsKey.contains("category") &&
      e.lo == e.hi))
    val g = readFmt(root).load().groupBy("category")
      .agg(count(lit(1)).as("n")).orderBy("category")
    assert(g.queryExecution.executedPlan.toString.contains("files=0/"))
    assert(g.collect().map(_.toSeq).toSeq == before)
  }

  private def multiFixture(n: Int = 9000) =
    (1 to n).map(i => (i.toLong, s"d${i % 5}", s"t${i % 3}", i * 1.0))
      .toDF("id", "day", "tenant", "v")

  private def assertTuplePure(root: String): Unit = {
    val data = SnapshotTable.manifest(spark, root,
      SnapshotTable.currentVersion(spark, root)).filter(_.kind == "d")
    assert(data.nonEmpty)
    assert(data.forall(e => e.statsKey.contains("day") &&
      e.lo.isDefined && e.lo == e.hi && e.statsNulls.contains(0L)),
      s"day impure: $data")
    assert(data.forall(e =>
      e.statsFor("tenant").exists(t => t._1 == t._2) &&
        e.colNulls.exists { case (nm, c) =>
          nm.equalsIgnoreCase("tenant") && c == 0L }),
      s"tenant impure: $data")
  }

  test("COMPOSITE identity layout (native API): commitPartitionedOn " +
      "(day, tenant) + appendPartitioned write TUPLE-pure files, " +
      "GROUP BY both keys — and a SUBSET — answers from the " +
      "manifest, and filters on EITHER key prune exactly with no " +
      "residual") {
    val root = tmpRoot()
    SnapshotTable.commitPartitionedOn(spark, root, multiFixture(6000),
      Seq("day", "tenant"))
    SnapshotTable.appendPartitioned(spark, root,
      (6001 to 9000).map(i =>
        (i.toLong, s"d${i % 5}", s"t${i % 3}", i * 1.0))
        .toDF("id", "day", "tenant", "v"))
    assertTuplePure(root)
    val src = multiFixture(9000)
    // GROUP BY the full tuple: zero data IO
    val g2 = readFmt(root).load().groupBy("day", "tenant")
      .agg(count(lit(1)).as("n")).orderBy("day", "tenant")
    val p2 = g2.queryExecution.executedPlan.toString
    assert(p2.contains("PushedAggregates") && p2.contains("files=0/"),
      s"tuple GROUP BY not manifest-answered:\n$p2")
    assert(g2.as[(String, String, Long)].collect().toSeq ==
      src.groupBy("day", "tenant").agg(count(lit(1)).as("n"))
        .orderBy("day", "tenant")
        .as[(String, String, Long)].collect().toSeq)
    // GROUP BY a SUBSET (the second key alone): files are pure on it
    // too, so the manifest still answers
    val g1 = readFmt(root).load().groupBy("tenant")
      .agg(count(lit(1)).as("n"), min(col("tenant")).as("lo"))
      .orderBy("tenant")
    val p1 = g1.queryExecution.executedPlan.toString
    assert(p1.contains("PushedAggregates") && p1.contains("files=0/"),
      s"subset GROUP BY not manifest-answered:\n$p1")
    assert(g1.as[(String, Long, String)].collect().toSeq ==
      Seq(("t0", 3000L, "t0"), ("t1", 3000L, "t1"),
        ("t2", 3000L, "t2")))
    // filters on EITHER key are consumed: count(*) under them stays a
    // metadata read, and the kept file set is exactly the value's
    val cDay = readFmt(root).load().filter(col("day") === "d2")
      .agg(count(lit(1)).as("n"))
    val pDay = cDay.queryExecution.executedPlan.toString
    assert(pDay.contains("PushedAggregates") && pDay.contains("files=0/"),
      s"day filter not consumed:\n$pDay")
    assert(cDay.as[Long].head() == src.filter(col("day") === "d2").count())
    val cTen = readFmt(root).load().filter(col("tenant") === "t1")
      .agg(count(lit(1)).as("n"))
    val pTen = cTen.queryExecution.executedPlan.toString
    assert(pTen.contains("PushedAggregates") && pTen.contains("files=0/"),
      s"tenant filter not consumed:\n$pTen")
    assert(cTen.as[Long].head() ==
      src.filter(col("tenant") === "t1").count())
    // both keys at once: exact tuple pruning on the plain scan
    val both = readFmt(root).load()
      .filter(col("day") === "d1" && col("tenant") === "t2")
    val pBoth = both.queryExecution.executedPlan.toString
    assert(!pBoth.contains("Filter ("),
      s"composite key filter left a residual:\n$pBoth")
    assert(both.count() ==
      src.filter(col("day") === "d1" && col("tenant") === "t2").count())
    // NULL in the SECOND key refuses like the first
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.appendPartitioned(spark, root,
        Seq((1L, "d0", null: String, 1.0))
          .toDF("id", "day", "tenant", "v"))
    }
    assert(e.getMessage.contains("NULL partition key"))
  }

  test("COMPOSITE identity layout (SQL surface): CREATE TABLE " +
      "PARTITIONED BY (day, tenant) + INSERT lands tuple-pure " +
      "files, two co-partitioned tables JOIN on the tuple with ZERO " +
      "exchange, UPDATE preserves the layout, and either key " +
      "refuses rename/drop") {
    spark.sql("CREATE TABLE graftpart.db.m1 (id BIGINT, day STRING, " +
      "tenant STRING, v DOUBLE) PARTITIONED BY (day, tenant)")
    spark.sql("CREATE TABLE graftpart.db.m2 (day STRING, " +
      "tenant STRING, w DOUBLE) PARTITIONED BY (day, tenant)")
    multiFixture(9000).createOrReplaceTempView("m_src")
    spark.sql("INSERT INTO graftpart.db.m1 SELECT * FROM m_src")
    spark.sql("INSERT INTO graftpart.db.m2 " +
      "SELECT day, tenant, sum(v) FROM m_src GROUP BY day, tenant")
    assertTuplePure(s"$warehouse/db/m1")
    assertTuplePure(s"$warehouse/db/m2")
    // SQL GROUP BY over the tuple: manifest-answered
    val g = spark.sql("SELECT day, tenant, count(*) AS n FROM " +
      "graftpart.db.m1 GROUP BY day, tenant ORDER BY day, tenant")
    assert(g.queryExecution.executedPlan.toString.contains("files=0/"),
      "SQL tuple GROUP BY did not answer from the manifest")
    assert(g.as[(String, String, Long)].collect().length == 15)
    // composite storage-partitioned join: zero exchange on both sides
    val prevB =
      spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val prevT =
      spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("graftpart.db.m1")
        .join(spark.table("graftpart.db.m2"), Seq("day", "tenant"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"composite identity SPJ still shuffles:\n$plan")
      // the reported tuple ordering (constant per partition) elides
      // both SMJ sorts too — zero exchange AND zero sort
      assert(j.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s }.isEmpty,
        s"composite SPJ still sorts constant keys:\n$plan")
      assert(j.count() == 9000)
      val got = j.groupBy("day", "tenant")
        .agg(sum("v").as("sv"), first("w").as("w"))
        .filter(col("sv") =!= col("w")).count()
      assert(got == 0, "per-tuple sums disagree with the dim side")
    } finally {
      prevB.fold(spark.conf.unset(
        "spark.sql.sources.v2.bucketing.enabled"))(v =>
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v))
      prevT.fold(spark.conf.unset(
        "spark.sql.autoBroadcastJoinThreshold"))(v =>
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v))
    }
    // row-level UPDATE (COW rewrite) preserves tuple purity and the
    // manifest GROUP BY
    spark.sql("UPDATE graftpart.db.m1 SET v = v * 10 WHERE id % 7 = 0")
    assertTuplePure(s"$warehouse/db/m1")
    val g3 = spark.sql("SELECT day, tenant, count(*) AS n FROM " +
      "graftpart.db.m1 GROUP BY day, tenant ORDER BY day, tenant")
    assert(g3.queryExecution.executedPlan.toString.contains("files=0/"),
      "manifest GROUP BY lost after UPDATE")
    assert(g3.as[(String, String, Long)].collect().map(_._3).sum == 9000)
    // either key refuses rename/drop
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE graftpart.db.m1 RENAME COLUMN tenant TO t2") }
    assert(e1.getMessage.contains("identity-partition key"))
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graftpart.db.m1 DROP COLUMN day") }
    assert(e2.getMessage.contains("identity-partition key"))
  }

  test("PARTITION-SPEC EVOLUTION: ALTER TABLE SET TBLPROPERTIES " +
      "('graft.partition.key') changes the layout GOING FORWARD — " +
      "metadata-only, zero files touched; old files keep their " +
      "layout, new writes land on the new spec, GROUP BY the shared " +
      "key stays a zero-IO answer ACROSS the boundary, the full new " +
      "tuple declines to an exact scan until compaction restores " +
      "it; invalid specs refuse") {
    val root = s"$warehouse/db/ev2"
    spark.sql("CREATE TABLE graftpart.db.ev2 (id BIGINT, day STRING, " +
      "tenant STRING, v DOUBLE) PARTITIONED BY (day)")
    multiFixture(4500).createOrReplaceTempView("ev2_src_a")
    spark.sql("INSERT INTO graftpart.db.ev2 SELECT * FROM ev2_src_a")
    val vBefore = SnapshotTable.currentVersion(spark, root)
    val filesBefore = SnapshotTable.manifest(spark, root, vBefore)
      .filter(_.kind == "d").map(_.path).toSet
    // EVOLVE (day) -> (day, tenant): metadata-only — no new version,
    // no file rewritten
    spark.sql("ALTER TABLE graftpart.db.ev2 SET TBLPROPERTIES " +
      "('graft.partition.key' = 'day,tenant')")
    assert(SnapshotTable.currentVersion(spark, root) == vBefore,
      "spec evolution must not commit a data version")
    assert(SnapshotTable.manifest(spark, root, vBefore)
      .filter(_.kind == "d").map(_.path).toSet == filesBefore)
    // new-era writes land on the NEW spec (tuple-pure)
    (4501 to 9000).map(i =>
      (i.toLong, s"d${i % 5}", s"t${i % 3}", i * 1.0))
      .toDF("id", "day", "tenant", "v")
      .createOrReplaceTempView("ev2_src_b")
    spark.sql("INSERT INTO graftpart.db.ev2 SELECT * FROM ev2_src_b")
    val data = SnapshotTable.manifest(spark, root,
      SnapshotTable.currentVersion(spark, root)).filter(_.kind == "d")
    val (oldEra, newEra) = data.partition(e => filesBefore(e.path))
    assert(newEra.nonEmpty && newEra.forall(e =>
      e.statsFor("tenant").exists(t => t._1 == t._2)),
      s"post-evolution files not tenant-pure: $newEra")
    assert(oldEra.forall(_.statsFor("tenant").isEmpty),
      "old-era files must be untouched")
    // GROUP BY the SHARED key: every file of both eras is day-pure,
    // so the manifest still answers with zero IO across the boundary
    val src = multiFixture(9000)
    val gDay = spark.sql("SELECT day, count(*) AS n FROM " +
      "graftpart.db.ev2 GROUP BY day ORDER BY day")
    assert(gDay.queryExecution.executedPlan.toString
      .contains("files=0/"),
      "shared-key GROUP BY lost its manifest answer across the " +
        "evolution boundary")
    assert(gDay.as[(String, Long)].collect().toSeq ==
      src.groupBy("day").count().orderBy("day")
        .as[(String, Long)].collect().toSeq)
    // the FULL new tuple: old-era files are not tenant-pure, so the
    // manifest DECLINES and the scan answers exactly
    val gTup = spark.sql("SELECT day, tenant, count(*) AS n FROM " +
      "graftpart.db.ev2 GROUP BY day, tenant ORDER BY day, tenant")
    assert(!gTup.queryExecution.executedPlan.toString
      .contains("files=0/"),
      "tuple GROUP BY must decline over mixed-era files")
    assert(gTup.as[(String, String, Long)].collect().toSeq ==
      src.groupBy("day", "tenant").count().orderBy("day", "tenant")
        .as[(String, String, Long)].collect().toSeq)
    // a tenant filter still prunes the NEW era by stats and keeps the
    // old era conservatively — exact answer either way
    assert(spark.sql("SELECT count(*) FROM graftpart.db.ev2 " +
      "WHERE tenant = 't1'").as[Long].head() ==
      src.filter(col("tenant") === "t1").count())
    // compaction restages EVERYTHING into the current spec: the tuple
    // answer comes back as a metadata read
    SnapshotTable.compact(spark, root)
    val gTup2 = spark.sql("SELECT day, tenant, count(*) AS n FROM " +
      "graftpart.db.ev2 GROUP BY day, tenant ORDER BY day, tenant")
    assert(gTup2.queryExecution.executedPlan.toString
      .contains("files=0/"),
      "compaction did not restore the tuple manifest answer")
    assert(gTup2.as[(String, String, Long)].collect().toSeq ==
      src.groupBy("day", "tenant").count().orderBy("day", "tenant")
        .as[(String, String, Long)].collect().toSeq)
    // refusals: unknown column, unpartitionable type, bucket clash
    val b1 = intercept[Exception] {
      spark.sql("ALTER TABLE graftpart.db.ev2 SET TBLPROPERTIES " +
        "('graft.partition.key' = 'nope')") }
    assert(b1.getMessage.contains("not in the table schema"))
    val b2 = intercept[Exception] {
      spark.sql("ALTER TABLE graftpart.db.ev2 SET TBLPROPERTIES " +
        "('graft.partition.key' = 'v')") }
    assert(b2.getMessage.contains("does not support"))
    spark.sql("CREATE TABLE graftpart.db.ev2b (id BIGINT, k STRING) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql("INSERT INTO graftpart.db.ev2b VALUES (1, 'x')")
    val b3 = intercept[Exception] {
      spark.sql("ALTER TABLE graftpart.db.ev2b SET TBLPROPERTIES " +
        "('graft.partition.key' = 'k')") }
    assert(b3.getMessage.contains("not both"))
    // UNSET drops the layout going forward
    spark.sql("ALTER TABLE graftpart.db.ev2 UNSET TBLPROPERTIES " +
      "('graft.partition.key')")
    assert(SnapshotTable.partitionKeysOf(
      SnapshotTable.tableProperties(spark, root)).isEmpty)
  }
}
