package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, VectorIndex}

/** Persisted IVF vector index (operators/VectorIndex): cell-identity-
  * partitioned assignments + exact centroid sidecar. Pins (a) a probe
  * plans ONLY the probed cells' files (the IVF byte-budget is a
  * manifest fact), (b) recall vs the exact brute force, (c) bit
  * determinism across runs, (d) incremental add: new vectors are
  * assigned by the PERSISTED model, stay findable, and keep the
  * pruned probe path. */
class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-vix").toString + "/ix"

  private def embeddings =
    Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")

  test("probe plans only the probed cells' files; recall@3 vs brute " +
      "force is material; two runs are bit-identical") {
    val root = tmpRoot()
    VectorIndex.build(spark, embeddings, root, nlist = 16, iters = 5)
    val total = graft.sources.SnapshotTable
      .manifest(spark, root, 1L).count(_.kind == "d")
    assert(total >= 16, s"expected one file per cell, got $total")

    // 3 queries × nprobe 3 probe at most 9 of the 16 cells
    val qs = embeddings.filter(col("vec_id") < 3)
      .selectExpr("vec_id AS q_id", "embedding")
    val res = VectorIndex.search(spark, root, qs, k = 3, nprobe = 3)
    val plan = res.queryExecution.executedPlan.toString
    val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"no graft scan in search plan:\n$plan")
    val (kept, tot) = (m.get.group(1).toInt, m.get.group(2).toInt)
    assert(kept < tot && kept <= 9,
      s"probe planned $kept/$tot files — not the nprobe byte budget")

    val full = VectorIndex.search(spark, root,
      embeddings.filter(col("vec_id") < 10)
        .selectExpr("vec_id AS q_id", "embedding"),
      k = 3, nprobe = 3)
    val a = full.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // structure: a full ranked top-3 per query
    assert(a.groupBy(_._1).size == 10)
    assert(a.groupBy(_._1).values.forall(_.map(_._2).sorted.toSeq ==
      Seq(1, 2, 3)))
    // recall vs the exact brute force (same bound as knn_ivf: random
    // spread across 16 cells, nprobe 3 — materially above chance)
    val exact = Similarity.queries("knn_bruteforce")(spark, sfDir)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val pairs = a.map(t => (t._1, t._3)).toSet
    val recall = exact.count(pairs.contains).toDouble / exact.size
    assert(recall >= 0.1, s"persisted-IVF recall@3 $recall")

    val b = VectorIndex.search(spark, root,
      embeddings.filter(col("vec_id") < 10)
        .selectExpr("vec_id AS q_id", "embedding"),
      k = 3, nprobe = 3).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(a.toSeq == b.toSeq, "search is not deterministic")
  }

  test("incremental add: the persisted model assigns new vectors, " +
      "an added vector is its own duplicate's nearest neighbor, and " +
      "probes still prune") {
    val root = tmpRoot()
    val base = embeddings.filter(col("vec_id") < 400)
    VectorIndex.build(spark, base, root, nlist = 8, iters = 5,
      trainCap = 400)
    // clones of vectors 0..4 under new ids: their own duplicate is
    // the cos=1.0 top hit, and it can only be found if (1) the model
    // assigned the clone to the same cell as the original and (2)
    // the probe read that cell after appendPartitioned
    val clones = embeddings.filter(col("vec_id") < 5)
      .selectExpr("vec_id + 100000 AS vec_id", "embedding")
    VectorIndex.add(spark, clones, root)

    val qs = embeddings.filter(col("vec_id") < 5)
      .selectExpr("vec_id AS q_id", "embedding")
    val res = VectorIndex.search(spark, root, qs, k = 1, nprobe = 2)
    val plan = res.queryExecution.executedPlan.toString
    val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined && m.get.group(1).toInt < m.get.group(2).toInt,
      s"post-add probe lost pruning:\n$plan")
    val top = res.collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    (0L until 5L).foreach { q =>
      val (cid, cos) = top(q)
      assert(cid == q + 100000 && cos == 1.0,
        s"query $q: expected clone ${q + 100000} at cos 1.0, " +
          s"got $cid at $cos")
    }
  }

  test("remove(): a tombstoned vector disappears from results (its " +
      "clone query falls back to the next neighbor), probes keep " +
      "pruning, and a rebuild purges the set") {
    val root = tmpRoot()
    VectorIndex.build(spark, embeddings.filter(col("vec_id") < 400),
      root, nlist = 8, iters = 5, trainCap = 400)
    // clone vector 3 under a new id, verify it tops its own query,
    // then remove it and verify the query no longer returns it
    val clone = embeddings.filter(col("vec_id") === 3)
      .selectExpr("vec_id + 100000 AS vec_id", "embedding")
    VectorIndex.add(spark, clone, root)
    val qs = embeddings.filter(col("vec_id") === 3)
      .selectExpr("vec_id AS q_id", "embedding")
    def top1() = VectorIndex.search(spark, root, qs, 1, nprobe = 2)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).head
    assert(top1() == ((100003L, 1.0)))

    VectorIndex.remove(spark,
      spark.range(100003, 100004).selectExpr("id AS vec_id"), root)
    val (cid, cos) = top1()
    assert(cid != 100003L && cos < 1.0,
      s"tombstoned vector still returned: $cid at $cos")
    val plan = VectorIndex.search(spark, root, qs, 1, nprobe = 2)
      .queryExecution.executedPlan.toString
    val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined && m.get.group(1).toInt < m.get.group(2).toInt,
      s"post-remove probe lost pruning:\n$plan")

    // rebuild over the base corpus: dels cleared, same top-1 as a
    // fresh index
    VectorIndex.build(spark, embeddings.filter(col("vec_id") < 400),
      root, nlist = 8, iters = 5, trainCap = 400)
    val fresh = tmpRoot()
    VectorIndex.build(spark, embeddings.filter(col("vec_id") < 400),
      fresh, nlist = 8, iters = 5, trainCap = 400)
    val a = VectorIndex.search(spark, root, qs, 3, nprobe = 2)
      .collect().map(_.toSeq)
    val b = VectorIndex.search(spark, fresh, qs, 3, nprobe = 2)
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, "rebuild diverged from a fresh index")
  }

  test("streaming maintenance is exactly-once: vectors land through " +
      "indexSink, a replayed batch no-ops, and streamed results " +
      "equal the batch add() path") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = embeddings.filter(col("vec_id") < 300)
    val streamRoot = tmpRoot()
    val batchRoot = tmpRoot()
    VectorIndex.build(spark, base, streamRoot, nlist = 8, iters = 5,
      trainCap = 300)
    VectorIndex.build(spark, base, batchRoot, nlist = 8, iters = 5,
      trainCap = 300)

    val newRows = embeddings
      .filter(col("vec_id") >= 300 && col("vec_id") < 360)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val stream = MemoryStream[(Long, Seq[Float])]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-vix-ck").toString
    stream.addData(newRows.toIndexedSeq: _*)
    VectorIndex.indexSink(
      stream.toDF().toDF("vec_id", "embedding"), streamRoot, ckpt,
      appId = "vix-test").start().awaitTermination()
    VectorIndex.add(spark,
      embeddings.filter(col("vec_id") >= 300 && col("vec_id") < 360),
      batchRoot)

    val qs = embeddings.filter(col("vec_id") < 5)
      .selectExpr("vec_id AS q_id", "embedding")
    def results(root: String) =
      VectorIndex.search(spark, root, qs, k = 3, nprobe = 3)
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSeq
    assert(results(streamRoot) == results(batchRoot),
      "streamed index diverged from batch add()")

    // replay under the committed batch id: no new version, results
    // unchanged
    val vBefore = graft.sources.SnapshotTable
      .currentVersion(spark, streamRoot)
    VectorIndex.applyBatch(spark, streamRoot,
      embeddings.filter(col("vec_id") >= 300 && col("vec_id") < 360),
      "vix-test", batchId = 0L)
    assert(graft.sources.SnapshotTable
      .currentVersion(spark, streamRoot) == vBefore,
      "replayed batch committed new assignments")
    assert(results(streamRoot) == results(batchRoot))
  }
}
