package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** SUM/AVG/COUNT(col) aggregate pushdown answered from the manifest's
  * per-file exact-sum slots (recorded by analyze), and the slot
  * lifecycle rules that keep analyze convergent: overflow sentinels,
  * initial-default served sums, rename re-keying. The scale claim
  * under test: `sum(amount)` over a petabyte is a metadata read. */
class SumPushdownSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-sump").toString + "/t"

  private def readFmt(root: String) =
    spark.read.format("graft-snapshot").option("path", root)

  private def catalogFor(name: String): String = {
    val wh = java.nio.file.Files
      .createTempDirectory("graft-sump-wh").toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.connector.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.db")
    wh
  }

  /** id, category (7 values), decimal(12,2) amount, and a nullable
    * flag (null on every 3rd row) — sum/avg/count(col) all have
    * non-trivial answers. */
  private def fixture(n: Int = 10000) =
    (1 to n).map(i => (i.toLong, s"cat_${i % 7}",
        if (i % 3 == 0) None else Some(i.toLong)))
      .toDF("id", "category", "flag")
      .withColumn("amount",
        (col("id") % 1000 + lit(0.25)).cast("decimal(12,2)"))

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def hideData(root: String)(body: => Unit): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val dataDir = new org.apache.hadoop.fs.Path(root, "_data")
    val hidden = new org.apache.hadoop.fs.Path(root + "_hidden")
    assert(fs.rename(dataDir, hidden))
    try { spark.catalog.refreshByPath(root); body }
    finally { fs.rename(hidden, dataDir); () }
  }

  test("ungrouped SUM/COUNT(col) answer from the MANIFEST after " +
      "analyze: PushedAggregates with files=0/N, still correct after " +
      "the data directory is moved away, values equal the computed " +
      "answers (long and decimal sums exact, overflow declines); AVG " +
      "always declines — Spark's scan-path Average sums in a double " +
      "buffer, so a manifest answer could differ in the last ulp") {
    val root = tmpRoot()
    val df = fixture()
    SnapshotTable.commit(spark, root, df, clusterKey = Some("id"))
    val expected = df.agg(
      sum("id").as("s"), count(col("flag")).as("cf"),
      sum("amount").as("sa")).collect()(0).toSeq
    val (_, _, n1) = SnapshotTable.analyze(spark, root)
    assert(n1 > 0)
    val q = readFmt(root).load().agg(
      sum("id").as("s"), count(col("flag")).as("cf"),
      sum("amount").as("sa"))
    val p = plan(q)
    assert(p.contains("PushedAggregates"), s"not pushed:\n$p")
    assert(p.contains("files=0/"), s"data files planned:\n$p")
    assert(q.collect()(0).toSeq == expected)
    hideData(root) {
      assert(readFmt(root).load().agg(sum("id"),
        count(col("flag")), sum("amount")).collect()(0).toSeq == expected)
    }
    // AVG itself is declined by design (Spark's scan-path Average
    // sums in a double buffer, so a connector-computed average could
    // differ from it) — and Spark then REWRITES avg into pushed
    // sum/count and owns the division: still a files=0/N metadata
    // answer, with the semantics choice made by Spark, not us
    val qa = readFmt(root).load().agg(avg("id").as("a"))
    val pa = plan(qa)
    assert(pa.contains("PushedAggregates: [sum(id), count(id)]") &&
      pa.contains("files=0/"), pa)
    assert(qa.collect()(0).getDouble(0) ==
      df.agg(avg("id")).collect()(0).getDouble(0))
  }

  test("GROUP BY the partition key with SUM/COUNT(col) answers " +
      "from the manifest on an identity-partitioned analyzed table: " +
      "files=0/N, zero data IO proven the hard way") {
    val root = tmpRoot()
    val df = fixture(20000)
    SnapshotTable.commitPartitioned(spark, root, df, "category")
    SnapshotTable.analyze(spark, root)
    val expected = df.groupBy("category")
      .agg(count(lit(1)).as("n"), sum("id").as("s"),
        count(col("flag")).as("cf"),
        sum("amount").as("sa"))
      .orderBy("category").collect().map(_.toSeq).toSeq
    val q = readFmt(root).load().groupBy("category")
      .agg(count(lit(1)).as("n"), sum("id").as("s"),
        count(col("flag")).as("cf"),
        sum("amount").as("sa"))
      .orderBy("category")
    val p = plan(q)
    assert(p.contains("PushedAggregates") &&
      p.contains("group by category"), s"not pushed:\n$p")
    assert(p.contains("files=0/"), s"data files planned:\n$p")
    assert(q.collect().map(_.toSeq).toSeq == expected)
    hideData(root) {
      assert(readFmt(root).load().groupBy("category")
        .agg(sum("id").as("s")).orderBy("category")
        .collect().map(_.toSeq).toSeq ==
        expected.map(r => Seq(r.head, r(2))))
    }
  }

  test("a CONSUMED partition-key filter composes with SUM: the " +
      "filtered manifest answer stays zero-IO (files=0/N) and equals " +
      "the computed answer over exactly the kept files") {
    val root = tmpRoot()
    val df = fixture(9000)
    SnapshotTable.commitPartitioned(spark, root, df, "category")
    SnapshotTable.analyze(spark, root)
    val expected = df.filter(col("category") === "cat_3")
      .agg(sum("id").as("s"), count(col("flag")).as("cf"))
      .collect()(0).toSeq
    val q = readFmt(root).load().filter(col("category") === "cat_3")
      .agg(sum("id").as("s"), count(col("flag")).as("cf"))
    val p = plan(q)
    assert(p.contains("PushedAggregates") && p.contains("files=0/"),
      s"consumed filter must not block the manifest answer:\n$p")
    assert(q.collect()(0).toSeq == expected)
    // a NON-key filter is residual: pushdown declines, scan answers
    val q2 = readFmt(root).load().filter(col("id") <= 4500)
      .agg(sum("id").as("s"))
    assert(!plan(q2).contains("PushedAggregates"), plan(q2))
    assert(q2.as[Long].head() == (1 to 4500).map(_.toLong).sum)
  }

  test("SUM pushdown declines SOUNDLY and the scan answers: before " +
      "analyze (no slots), SUM(DISTINCT), a double column (IEEE " +
      "order-dependence), and under merge-on-read tombstones") {
    val root = tmpRoot()
    val df = fixture(5000).withColumn("score",
      (col("id") * 1.5).cast("double"))
    SnapshotTable.commit(spark, root, df, clusterKey = Some("id"))
    // pre-analyze: no sum slots, no colNulls — decline, scan answers
    val q0 = readFmt(root).load().agg(sum("id").as("s"))
    assert(!plan(q0).contains("PushedAggregates"), plan(q0))
    assert(q0.as[Long].head() == (1 to 5000).map(_.toLong).sum)
    SnapshotTable.analyze(spark, root)
    // DISTINCT is not decomposable over files
    val qd = readFmt(root).load().agg(sum_distinct(col("id")).as("s"))
    assert(!plan(qd).contains("PushedAggregates"), plan(qd))
    assert(qd.as[Long].head() == (1 to 5000).map(_.toLong).sum)
    // double sums are order-dependent: never answered from metadata
    val qf = readFmt(root).load().agg(sum("score").as("s"))
    assert(!plan(qf).contains("PushedAggregates"), plan(qf))
    // sanity: the long sum IS pushed on the analyzed table
    assert(plan(readFmt(root).load().agg(sum("id")))
      .contains("PushedAggregates"))
    // MOR tombstones: per-file sums overcount killed rows — decline
    SnapshotTable.deleteKeysOnRead(spark, root,
      (1 to 100).map(_.toLong).toDF("id"), "id")
    val qm = readFmt(root).load().agg(sum("id").as("s"))
    assert(!plan(qm).contains("PushedAggregates"), plan(qm))
    assert(qm.as[Long].head() == (101 to 5000).map(_.toLong).sum)
  }

  test("a file whose sum OVERFLOWS the decimal(38) accumulator " +
      "records the unavailable sentinel: analyze CONVERGES (repeat " +
      "reads 0 files), pushdown declines, the scan's overflow " +
      "semantics serve") {
    val root = tmpRoot()
    val big = "5" + "0" * 37 // 5e37: three of them overflow 38 digits
    val df = Seq(big, big, big).toDF("s")
      .select(col("s").cast("decimal(38,0)").as("x"),
        monotonically_increasing_id().as("k"))
      .coalesce(1)
    SnapshotTable.commit(spark, root, df)
    val (_, _, n1) = SnapshotTable.analyze(spark, root)
    assert(n1 > 0)
    // the sentinel is stamped, so the file counts as SKETCHED and a
    // repeat analyze reads nothing — no permanent staleness
    val (_, _, n2) = SnapshotTable.analyze(spark, root)
    assert(n2 == 0L, s"overflowed file stayed stale: re-read $n2")
    val cur = SnapshotTable.currentVersion(spark, root)
    val entry = SnapshotTable.manifest(spark, root, cur)
      .filter(_.kind == "d").head
    assert(entry.statsFor(SnapshotTable.sumKey("x"))
      .contains((SnapshotTable.SumUnavailable,
        SnapshotTable.SumUnavailable)), "sentinel slot missing")
    // pushdown declines on the sentinel; the scan's own (non-ANSI
    // NULL-on-overflow) answer is what the user gets either way
    val q = readFmt(root).load().agg(sum("x").as("s"))
    assert(!plan(q).contains("PushedAggregates"), plan(q))
    // 1.5e38 needs 39 digits: under ANSI (Spark 4's default) decimal
    // SUM overflow THROWS — declining preserves exactly that instead
    // of serving a silently-wrong manifest total
    val ex = intercept[Exception](q.collect())
    assert(ex.toString.contains("ARITHMETIC_OVERFLOW") ||
      Option(ex.getCause).exists(_.toString
        .contains("ARITHMETIC_OVERFLOW")), s"unexpected failure: $ex")
  }

  test("ADD COLUMN ... DEFAULT on a summable type: analyze stamps " +
      "the SERVED sum (default x rows) onto pre-evolution files, " +
      "repeat analyze reads 0 files, and the manifest SUM equals " +
      "what queries serve") {
    val wh = catalogFor("graft_sumdef")
    spark.sql("CREATE TABLE graft_sumdef.db.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft_sumdef.db.t " +
      "SELECT id, concat('v', id) FROM range(1, 101)")           // v1
    spark.sql("ALTER TABLE graft_sumdef.db.t " +
      "ADD COLUMNS (bonus BIGINT DEFAULT 7)")                    // v2
    spark.sql("INSERT INTO graft_sumdef.db.t " +
      "SELECT id, concat('w', id), id * 2 FROM range(1, 51)")    // v3
    val root = s"$wh/db/t"
    val (_, _, n1) = SnapshotTable.analyze(spark, root)
    assert(n1 > 0)
    // the default-filled files got a served-sum slot: converged
    val (_, _, n2) = SnapshotTable.analyze(spark, root)
    assert(n2 == 0L, s"default-filled files stayed stale: re-read $n2")
    // manifest SUM includes the 100 pre-evolution rows at 7 each
    val expected = 100L * 7 + (1L until 51L).map(_ * 2).sum
    val q = spark.table("graft_sumdef.db.t").agg(sum("bonus").as("s"))
    val p = plan(q)
    assert(p.contains("PushedAggregates") && p.contains("files=0/"),
      s"served-sum slots must feed the manifest answer:\n$p")
    assert(q.as[Long].head() == expected)
    // and it matches the row-served answer exactly
    assert(spark.table("graft_sumdef.db.t").collect()
      .map(_.getAs[Long]("bonus")).sum == expected)
  }

  test("per-file sums SURVIVE a rename: SUM answers from the " +
      "manifest under the NEW name (files=0/N), and a rename -> " +
      "analyze -> rename -> analyze round-trip reads 0 files both " +
      "times") {
    val root = tmpRoot()
    SnapshotTable.commit(spark, root,
      (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("x", "v"),
      clusterKey = Some("x"))                                     // v1
    SnapshotTable.analyze(spark, root)                            // v2
    SnapshotTable.renameColumn(spark, root, "x", "key")           // v3
    val (_, _, r1) = SnapshotTable.analyze(spark, root)
    assert(r1 == 0L, s"sum slots must re-key with the rename: $r1")
    val q = readFmt(root).load().agg(sum("key").as("s"))
    val p = plan(q)
    assert(p.contains("PushedAggregates") && p.contains("files=0/"),
      s"renamed sum slot not consumed:\n$p")
    assert(q.as[Long].head() == (1 to 1000).map(_.toLong).sum)
    SnapshotTable.renameColumn(spark, root, "key", "key2")        // v4
    val (_, _, r2) = SnapshotTable.analyze(spark, root)
    assert(r2 == 0L, s"second rename went O(table): $r2")
    assert(readFmt(root).load().agg(sum("key2")).as[Long].head() ==
      (1 to 1000).map(_.toLong).sum)
  }

  test("MIN/MAX of a TIMESTAMP column answer from the epoch-micros " +
      "slots: TZ-independent instants, sub-second precision exact, " +
      "all-null files contribute nothing, files=0/N proven with the " +
      "data moved away; grouped per identity key too") {
    val root = tmpRoot()
    val df = fixture(8000)
      .withColumn("ts", expr(
        "CASE WHEN id % 5 = 0 THEN NULL " +
          "ELSE timestamp_micros(id * 1000001) END"))
    SnapshotTable.commitPartitioned(spark, root, df, "category")
    SnapshotTable.analyze(spark, root)
    val expected = df.agg(min("ts"), max("ts")).collect()(0).toSeq
    val q = readFmt(root).load().agg(min("ts").as("lo"),
      max("ts").as("hi"))
    val p = plan(q)
    assert(p.contains("PushedAggregates") && p.contains("files=0/"),
      s"timestamp bounds not answered from the manifest:\n$p")
    assert(q.collect()(0).toSeq == expected)
    // grouped: per-key bounds from the same slots
    val eg = df.groupBy("category").agg(min("ts").as("lo"),
      max("ts").as("hi")).orderBy("category").collect().map(_.toSeq)
    val qg = readFmt(root).load().groupBy("category")
      .agg(min("ts").as("lo"), max("ts").as("hi")).orderBy("category")
    assert(plan(qg).contains("files=0/"), plan(qg))
    assert(qg.collect().map(_.toSeq).toSeq == eg.toSeq)
    hideData(root) {
      assert(readFmt(root).load().agg(min("ts"), max("ts"))
        .collect()(0).toSeq == expected)
    }
    // an ALL-NULL timestamp column serves SQL's NULL bounds from
    // metadata alone (the all-null escape, not a decline)
    val root2 = tmpRoot()
    SnapshotTable.commit(spark, root2, fixture(100)
      .withColumn("ts", lit(null).cast("timestamp")))
    SnapshotTable.analyze(spark, root2)
    val q2 = readFmt(root2).load().agg(min("ts").as("lo"))
    assert(plan(q2).contains("files=0/"), plan(q2))
    assert(q2.collect()(0).isNullAt(0))
  }

  test("COUNT(DISTINCT key) answers from the manifest on a value-" +
      "pure table — the distinct set IS the set of per-file " +
      "constants — composes with a consumed filter, is 1 per group " +
      "under GROUP BY, and declines on impure tables and non-key " +
      "columns") {
    val root = tmpRoot()
    val df = fixture(6000)
    SnapshotTable.commitPartitioned(spark, root, df, "category")
    val q = readFmt(root).load()
      .agg(countDistinct(col("category")).as("k"))
    val p = plan(q)
    assert(p.contains("PushedAggregates") && p.contains("files=0/"),
      s"COUNT DISTINCT not answered from the manifest:\n$p")
    assert(q.as[Long].head() == 7L)
    // consumed filter keeps whole files: the kept constants are
    // exactly the matching values
    val qf = readFmt(root).load()
      .filter(col("category").isin("cat_1", "cat_2", "cat_3"))
      .agg(countDistinct(col("category")).as("k"))
    assert(plan(qf).contains("files=0/"), plan(qf))
    assert(qf.as[Long].head() == 3L)
    // grouped: per-group distinct of the key is 1 by purity
    val qg = readFmt(root).load().groupBy("category")
      .agg(countDistinct(col("category")).as("k"), count(lit(1)).as("n"))
      .orderBy("category")
    assert(plan(qg).contains("files=0/"), plan(qg))
    val rows = qg.collect()
    assert(rows.length == 7 && rows.forall(_.getLong(1) == 1L),
      rows.mkString(", "))
    // non-key distinct: files are not value-pure on it — scan answers
    val qn = readFmt(root).load()
      .agg(countDistinct(col("id")).as("k"))
    assert(!plan(qn).contains("PushedAggregates"), plan(qn))
    assert(qn.as[Long].head() == 6000L)
    // plain (impure) table declines
    val root2 = tmpRoot()
    SnapshotTable.commit(spark, root2, df, clusterKey = Some("id"))
    val q2 = readFmt(root2).load()
      .agg(countDistinct(col("category")).as("k"))
    assert(!plan(q2).contains("PushedAggregates"), plan(q2))
    assert(q2.as[Long].head() == 7L)
  }

  test("ungrouped MIN/MAX skip ALL-NULL files instead of declining: " +
      "an analyzed table where some files store only NULLs of the " +
      "column still answers from the manifest, and an entirely-NULL " +
      "column serves SQL's NULL") {
    val root = tmpRoot()
    // two populations in separate files: ids 1..1000 with real
    // values, ids 1001..2000 all-NULL for v
    val df = (1 to 2000).map(i => (i.toLong,
        if (i <= 1000) Some(i * 2L) else None))
      .toDF("id", "v")
    SnapshotTable.commitPartitioned(spark, root,
      df.withColumn("half", (col("id") <= 1000).cast("string")), "half")
    SnapshotTable.analyze(spark, root)
    val q = readFmt(root).load().agg(min("v").as("lo"),
      max("v").as("hi"))
    val p = plan(q)
    assert(p.contains("PushedAggregates") && p.contains("files=0/"),
      s"all-null files must be skipped, not declined:\n$p")
    assert(q.collect()(0).toSeq == Seq(2L, 2000L))
    // entirely-NULL column: the manifest serves SQL's NULL bounds
    val root2 = tmpRoot()
    SnapshotTable.commit(spark, root2,
      (1 to 100).map(i => (i.toLong, None: Option[Long]))
        .toDF("id", "v"))
    SnapshotTable.analyze(spark, root2)
    val q2 = readFmt(root2).load().agg(min("v").as("lo"))
    assert(plan(q2).contains("files=0/"), plan(q2))
    assert(q2.collect()(0).isNullAt(0))
  }

  test("timestamp epoch-micros slots SURVIVE a rename: repeat " +
      "analyze reads 0 files and MIN(ts) answers under the new name") {
    val root = tmpRoot()
    SnapshotTable.commit(spark, root,
      (1 to 500).map(i => (i.toLong, s"v$i")).toDF("x", "v")
        .withColumn("ev_ts", expr("timestamp_micros(x * 777)")))
    SnapshotTable.analyze(spark, root)
    SnapshotTable.renameColumn(spark, root, "ev_ts", "occurred_at")
    val (_, _, n) = SnapshotTable.analyze(spark, root)
    assert(n == 0L, s"tsu slots must re-key with the rename: $n")
    val q = readFmt(root).load().agg(min("occurred_at").as("lo"))
    val p = plan(q)
    assert(p.contains("PushedAggregates") && p.contains("files=0/"),
      s"renamed tsu slot not consumed:\n$p")
    assert(q.collect()(0).getTimestamp(0).toInstant ==
      java.time.Instant.EPOCH.plus(777,
        java.time.temporal.ChronoUnit.MICROS))
  }

  test("decimal sums across the 18-digit boundary: per-file slots " +
      "and the manifest total render losslessly past int64 range") {
    val root = tmpRoot()
    // 1e18 x 12 rows -> 1.2e19, past Long.MaxValue (~9.2e18); two
    // files so the answer is a true cross-file decimal accumulation
    val df = (1 to 12).map(i => (i.toLong, "1" + "0" * 18 + ".25"))
      .toDF("k", "s")
      .select(col("k"), col("s").cast("decimal(38,2)").as("x"))
      .repartition(2)
    SnapshotTable.commit(spark, root, df)
    SnapshotTable.analyze(spark, root)
    val q = readFmt(root).load().agg(sum("x").as("s"))
    val p = plan(q)
    assert(p.contains("PushedAggregates") && p.contains("files=0/"),
      s"wide decimal sum not pushed:\n$p")
    val got = q.collect()(0).getDecimal(0)
    assert(got == new java.math.BigDecimal("12000000000000000003.00"),
      s"lossy wide-decimal sum: $got")
  }

  test("CORRUPT manifest slots decline to the scan instead of " +
      "throwing at plan time: an unparseable __sum value, an over-" +
      "scaled sum, and a non-numeric __tsu bound each fall back to " +
      "the exact scan answer while intact slots keep answering") {
    def b64(s: String): String = java.util.Base64.getEncoder
      .encodeToString(s.getBytes("UTF-8"))
    def corrupt(root: String, key: String, newLo: String): Unit = {
      val v = SnapshotTable.currentVersion(spark, root)
      val mf = java.nio.file.Paths.get(root, "_manifests", v.toString)
      val txt = new String(java.nio.file.Files.readAllBytes(mf), "UTF-8")
      val kb = b64(key)
      // extraStats triples are `b64key:b64lo:b64hi` joined by ';' in
      // a tab-separated field — swap the lo (and hi) payloads
      val re = (java.util.regex.Pattern.quote(kb) +
        ":[A-Za-z0-9+/=]*:[A-Za-z0-9+/=]*").r
      val swapped = re.replaceAllIn(txt,
        s"$kb:${b64(newLo)}:${b64(newLo)}")
      assert(swapped != txt, s"slot $key not found to corrupt")
      java.nio.file.Files.write(mf, swapped.getBytes("UTF-8"))
      // drop Hadoop LocalFS's checksum sidecar — the edit IS the
      // corruption under test, not a checksum failure
      java.nio.file.Files.deleteIfExists(
        mf.getParent.resolve(s".${mf.getFileName}.crc"))
      spark.catalog.refreshByPath(root)
    }
    val root = tmpRoot()
    val base = java.sql.Timestamp.from(java.time.Instant.EPOCH)
    val df = (1 to 3000).map(i => (i.toLong, i.toLong % 97))
      .toDF("id", "amt0")
      .withColumn("amount", (col("amt0") + lit(0.25))
        .cast("decimal(12,2)"))
      .withColumn("ts", expr("timestamp_micros(id * 1000000)"))
      .drop("amt0")
    SnapshotTable.commit(spark, root, df, clusterKey = Some("id"))
    SnapshotTable.analyze(spark, root)
    val expect = df.agg(sum("id"), sum("amount"), min("ts"))
      .collect()(0)
    def q() = readFmt(root).load()
      .agg(sum("id").as("si"), sum("amount").as("sa"),
        min("ts").as("mt"))
    assert(plan(q()).contains("PushedAggregates"), "healthy pushdown")
    // 1) unparseable decimal in __sum:amount -> whole pushdown
    // declines (one bad slot poisons the combined aggregate), scan
    // answers exactly, nothing throws
    corrupt(root, "__sum:amount", "not_a_number")
    val p1 = plan(q())
    assert(!p1.contains("PushedAggregates"),
      s"corrupt sum slot must decline:\n$p1")
    assert(q().collect()(0).toSeq == expect.toSeq)
    // but an aggregate NOT touching the corrupt column still answers
    // from the manifest
    val pi = plan(readFmt(root).load().agg(sum("id").as("si")))
    assert(pi.contains("PushedAggregates") && pi.contains("files=0/"),
      s"intact slot stopped answering:\n$pi")
    // 2) parseable but OVER-SCALED sum (scale 5 > column scale 2):
    // renderSum's setScale must decline, not throw
    corrupt(root, "__sum:amount", "1.23456")
    assert(!plan(q()).contains("PushedAggregates"))
    assert(q().collect()(0).toSeq == expect.toSeq)
    // 3) non-numeric __tsu bound -> timestamp MIN declines soundly
    corrupt(root, "__tsu:ts", "garbage")
    val qt = readFmt(root).load().agg(min("ts").as("mt"))
    assert(!plan(qt).contains("PushedAggregates"))
    assert(qt.collect()(0).getTimestamp(0) == expect.getTimestamp(2))
  }
}
