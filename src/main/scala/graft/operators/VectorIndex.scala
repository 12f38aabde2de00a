package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** A persisted IVF (inverted-file) vector index, stored as a
  * cell-identity-partitioned snapshot table — approximate
  * nearest-neighbor search as a lakehouse primitive, the embedding
  * twin of [[TextIndex]].
  *
  * Build: a bit-deterministic Lloyd model ([[Dedup.lloydModel]] — the
  * SemDeDup trainer) quantizes the corpus into `nlist` cells; the
  * assignment pass is map-side zero-Exchange (`graft_nearest` over a
  * 1-row broadcast model), and `(vec_id, cell, v)` commits
  * IDENTITY-PARTITIONED on `cell`, so every data file is value-pure
  * on its cell id. Centroids persist exactly (parquet doubles) in a
  * `<root>_cents` sidecar table.
  *
  * Search: rank cells by query↔centroid cosine, take the top
  * `nprobe`, and read the index with `cell IN (<probed>)` — a filter
  * the scan CONSUMES exactly (value-pure files), so a probe plans
  * `nprobe`-cells' files and Spark re-evaluates nothing. At 100 TB
  * that is the IVF contract made literal: a search reads
  * ~nprobe/nlist of the corpus BYTES, decided from manifest metadata
  * before any IO. The probed cell-id list is collected to the driver
  * to become the plan literal — bounded by |queries|·nprobe, the
  * same broadcast-only-model discipline as every trainer here.
  *
  * Reference scope: extends the beyond-reference ANN family
  * (SURVEY.md §2's LLM-pipeline block) with the PERSISTED index shape
  * the in-query `knn_ivf` pipeline deliberately rebuilds per run. */
object VectorIndex {

  private val NListProp = "graft.vectorindex.nlist"

  private def centsRoot(root: String): String = root + "_cents"
  private def delsRoot(root: String): String = root + "_dels"

  /** Index `vecs(vec_id, embedding)` at `root`: nlist cells, one
    * value-pure partition per cell. Replaces any prior index. */
  def build(spark: SparkSession, vecs: DataFrame, root: String,
      nlist: Int, iters: Int = 5, trainCap: Int = 2048): Long = {
    graft.functions.VectorFunctions.register(spark)
    import spark.implicits._
    val e = Dedup.unitVectors(vecs)
    val cent = Dedup.lloydModel(e, nlist, iters, trainCap)
    val model = Seq(Tuple1(cent.map(_.toSeq).toSeq)).toDF("cents")
    val asg = e.crossJoin(broadcast(model))
      .selectExpr("vec_id", "graft_nearest(v, cents).cid AS cell", "v")
    val v = SnapshotTable.commitPartitioned(spark, root, asg, "cell")
    val centDf = cent.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "cent")
    SnapshotTable.commit(spark, centsRoot(root), centDf)
    // a rebuild IS the tombstone purge
    if (SnapshotTable.currentVersion(spark, delsRoot(root)) > 0L)
      SnapshotTable.commit(spark, delsRoot(root),
        spark.range(0).selectExpr("id AS vec_id"))
    SnapshotTable.setProperties(spark, root,
      SnapshotTable.tableProperties(spark, root) +
        (NListProp -> nlist.toString))
    v
  }

  /** Incrementally index NEW vectors: assign against the PERSISTED
    * model (the quantizer never drifts under ingest — cells keep
    * their meaning), land value-pure via appendPartitioned so probes
    * keep pruning. Vec ids must be new. */
  def add(spark: SparkSession, vecs: DataFrame, root: String): Long = {
    graft.functions.VectorFunctions.register(spark)
    val model = loadModel(spark, root)
    val asg = Dedup.unitVectors(vecs)
      .crossJoin(broadcast(model))
      .selectExpr("vec_id", "graft_nearest(v, cents).cid AS cell", "v")
    SnapshotTable.appendPartitioned(spark, root, asg)
  }

  /** REMOVE vectors WITHOUT touching a single index file: ids land in
    * a `<root>_dels` tombstone set and [[search]] anti-joins them out
    * of the probed cells. No scoring state to adjust (IVF has none —
    * the quantizer is frozen), so deletion is one tiny append;
    * rebuild (`build`) is the physical purge and clears the set.
    * Removed ids must not be re-added. */
  def remove(spark: SparkSession, vecIds: DataFrame, root: String)
  : Long =
    SnapshotTable.append(spark, delsRoot(root),
      vecIds.select(col("vec_id")), files = 1)

  /** EXACTLY-ONCE streaming maintenance: one micro-batch of new
    * vectors under an `(appId, batchId)` idempotence marker. Unlike
    * [[TextIndex]] there is no scoring-state journal — the quantizer
    * is frozen at build time — so a single marked commit IS the whole
    * batch and replay is a pure no-op. */
  def applyBatch(spark: SparkSession, root: String, vecs: DataFrame,
      appId: String, batchId: Long): Unit = {
    val landed = SnapshotTable.lastCommittedTxn(spark, root, appId)
      .exists(_ >= batchId)
    if (landed) return
    graft.functions.VectorFunctions.register(spark)
    val model = loadModel(spark, root)
    val asg = Dedup.unitVectors(vecs)
      .crossJoin(broadcast(model))
      .selectExpr("vec_id", "graft_nearest(v, cents).cid AS cell", "v")
    SnapshotTable.appendPartitioned(spark, root, asg,
      txn = Some((appId, batchId)))
    ()
  }

  /** Streaming sink: keep the index at `root` (built beforehand) fresh
    * from a stream of `(vec_id, embedding)` rows — the embedding twin
    * of [[TextIndex.indexSink]], same idempotent-writer handshake. */
  def indexSink(vecs: DataFrame, root: String, checkpoint: String,
      appId: String)
  : org.apache.spark.sql.streaming.DataStreamWriter[
      org.apache.spark.sql.Row] =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          applyBatch(batch.sparkSession, root, batch, appId, batchId)
        ()
      }

  /** The persisted centroid matrix as the 1-row broadcast-model frame
    * the assignment/probe expressions consume. */
  private def loadModel(spark: SparkSession, root: String): DataFrame =
    SnapshotTable.read(spark, centsRoot(root))
      .agg(expr("transform(array_sort(collect_list(struct(cell, cent)))" +
        ", p -> p.cent) AS cents"))

  /** Approximate top-k neighbors for `queries(q_id, embedding)`:
    * probe the top-`nprobe` cells per query, exact cosine within
    * them. Output (q_id, rk, c_id, cos_r) — deterministic: the model
    * is bit-reproducible, cell ranking ties break on cell id, and
    * result ties on rounded cosine break on c_id. */
  def search(spark: SparkSession, root: String, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val model = loadModel(spark, root)
    val qe = Dedup.unitVectors(
        queries.select(col("q_id").as("vec_id"), col("embedding")))
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    // rank cells per query against the broadcast model; the probe
    // set (q_id, cell) is tiny — |queries| × nprobe rows
    val wCell = Window.partitionBy(col("q_id"))
      .orderBy(desc("cent_cos"), asc("cell"))
    val probes = qe.crossJoin(broadcast(model))
      .select(col("q_id"), col("q_v"),
        posexplode(col("cents")).as(Seq("cell", "cent")))
      .selectExpr("q_id", "q_v", "cell",
        "graft_cosine(q_v, cent) AS cent_cos")
      .withColumn("cell_rk", row_number().over(wCell))
      .filter(col("cell_rk") <= nprobe)
      .select(col("q_id"), col("q_v"), col("cell"))
      .persist()
    // the union of probed cells becomes the scan's IN literal — the
    // consumed-filter path plans exactly those cells' files
    val cells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val idx0 = spark.read.format("graft-snapshot")
      .option("path", root).load()
      .filter(col("cell").isin(cells.toSeq: _*))
      .select(col("vec_id").as("c_id"), col("cell"), col("v"))
    // tombstoned vectors leave the probed cells at read time; the
    // set is bounded by removals since the last rebuild
    val idx =
      if (SnapshotTable.currentVersion(spark, delsRoot(root)) == 0L)
        idx0
      else idx0.join(SnapshotTable.read(spark, delsRoot(root))
          .select(col("vec_id").as("c_id")).distinct(),
        Seq("c_id"), "left_anti")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(desc("cos_r"), asc("c_id"))
    idx.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .selectExpr("q_id", "c_id",
        "round(graft_cosine(q_v, v), 6) AS cos_r")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("c_id"), col("cos_r"))
      .orderBy(asc("q_id"), asc("rk"))
  }
}
