package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.sources.SnapshotTable

/** A persisted INVERTED INDEX over a document corpus, stored as a
  * term-bucketed snapshot table — lexical (BM25) retrieval as a
  * lakehouse primitive.
  *
  * Postings are one row per (term, doc): `term, doc_id, tf, dl`,
  * hash-bucketed on `term` via [[SnapshotTable.commitBucketedOn]].
  * That single layout decision is the whole scale story: a query's
  * `term IN (...)` filter is hashed at PLAN time into the buckets
  * those terms live in (GraftPruning.pruneBucket), so a 4-term search
  * against a 4096-bucket index reads ~4/4096ths of the postings —
  * the classic posting-list access path, recovered entirely from
  * declarative Spark + manifest metadata, no driver-side index
  * structure and nothing resident in memory between queries.
  *
  * Corpus-level scoring state (document count and total token count)
  * is ADDITIVE, so it lives as a JOURNAL: a tiny `<root>_stats`
  * snapshot table holding one `(n_docs, sum_dl)` row per
  * installment; `avgdl = Σsum_dl / Σn_docs` stays exact across any
  * number of incremental adds, and because the journal is itself a
  * snapshot table, installments can carry the same `(appId, batchId)`
  * idempotence marker the postings commit carries — which is what
  * makes STREAMING maintenance exactly-once ([[applyBatch]]).
  * df(term) deliberately does NOT live anywhere: it is one tiny
  * aggregate over exactly the postings a search already reads (df of
  * a term = that term's posting count), and any persisted copy would
  * go stale on every add.
  *
  * Reference scope: the reference engine has no text-retrieval
  * operator; this extends the LLM-pipeline surface (SURVEY.md §2's
  * beyond-reference block) where retrieval-based decontamination and
  * data selection need exactly this primitive at corpus scale.
  */
object TextIndex {

  private def statsRoot(root: String): String = root + "_stats"
  private def delsRoot(root: String): String = root + "_dels"

  /** Whitespace tokens — the same tokenizer every documents-table
    * query in this repo uses (`split(text, ' ')`), so index answers
    * are comparable with the from-raw oracles. */
  private def postingsOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("__toks", split(col("text"), " "))
      .select(col("doc_id"), size(col("__toks")).as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))

  /** One journal row for an installment of documents. */
  private def statsRowOf(docs: DataFrame): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " "))).as("sum_dl"))

  /** Index `docs(doc_id, text)` at `root`. Replaces any prior index
    * there (commitBucketedOn replaces the file set; the stats journal
    * restarts with it). */
  def build(spark: SparkSession, docs: DataFrame, root: String,
      buckets: Int = 64): Long = {
    val v = SnapshotTable.commitBucketedOn(spark, root,
      postingsOf(docs), Seq(("term", buckets)))
    SnapshotTable.commit(spark, statsRoot(root), statsRowOf(docs))
    // a rebuild IS the tombstone purge: clear any accumulated dels
    if (SnapshotTable.currentVersion(spark, delsRoot(root)) > 0L)
      SnapshotTable.commit(spark, delsRoot(root),
        spark.range(0).selectExpr("id AS doc_id"))
    v
  }

  /** Incrementally index a NEW batch of documents: postings land in
    * their buckets (the layout survives ingest, so searches keep
    * pruning), the stats journal gains one additive row. Doc ids must
    * be new — re-adding an already-indexed doc would split its tf
    * rows. */
  def add(spark: SparkSession, docs: DataFrame, root: String): Long = {
    val v = SnapshotTable.appendBucketed(spark, root, postingsOf(docs))
    SnapshotTable.append(spark, statsRoot(root), statsRowOf(docs),
      files = 1)
    v
  }

  /** REMOVE documents from the index WITHOUT touching a single
    * posting file: the removed ids land in a `<root>_dels` tombstone
    * set and the stats journal gains a NEGATIVE row — the additive
    * (n_docs, sum_dl) algebra nets them out exactly, and
    * [[searchBm25]] anti-joins the tombstones out of the pruned
    * postings BEFORE df is counted, so df/N/avgdl all behave as if
    * the docs were never indexed. `docs` carries full (doc_id, text)
    * rows because that is what deletion feeds actually provide (the
    * snapshot changelog emits preImages) and the negative journal
    * row needs the token counts. Postings are term-bucketed, so a
    * physical purge would touch every bucket — the production shape
    * is exactly this: filter at read, rebuild (`build`) to compact
    * once tombstones accumulate. Removing an id that was never
    * indexed, or re-adding a removed id, is outside the contract. */
  def remove(spark: SparkSession, docs: DataFrame, root: String)
  : Long = {
    SnapshotTable.append(spark, delsRoot(root),
      docs.select(col("doc_id")), files = 1)
    SnapshotTable.append(spark, statsRoot(root),
      docs.agg((-count(lit(1))).as("n_docs"),
        (-sum(size(split(col("text"), " ")))).as("sum_dl")),
      files = 1)
  }

  /** EXACTLY-ONCE streaming maintenance: apply one micro-batch of new
    * documents under an `(appId, batchId)` idempotence marker. Each
    * of the two commits (postings, stats journal) carries the marker
    * atomically with its data and is guarded by its OWN
    * `lastCommittedTxn` check, so a replayed batch no-ops and a crash
    * BETWEEN the two commits converges on replay: the landed half is
    * recognized and skipped, the missing half lands. (The one-batch
    * window where postings exist without their stats row only skews
    * avgdl/N by the in-flight batch — scoring state, never membership
    * — and closes on recovery.) */
  def applyBatch(spark: SparkSession, root: String, docs: DataFrame,
      appId: String, batchId: Long): Unit = {
    val landed = SnapshotTable.lastCommittedTxn(spark, root, appId)
      .exists(_ >= batchId)
    if (!landed)
      SnapshotTable.appendBucketed(spark, root, postingsOf(docs),
        txn = Some((appId, batchId)))
    val statsLanded = SnapshotTable
      .lastCommittedTxn(spark, statsRoot(root), appId)
      .exists(_ >= batchId)
    if (!statsLanded)
      SnapshotTable.append(spark, statsRoot(root), statsRowOf(docs),
        files = 1, txn = Some((appId, batchId)))
  }

  /** Streaming sink: keep the index at `root` (built beforehand over
    * the day-0 corpus) fresh from a stream of `(doc_id, text)` rows.
    * At-least-once delivery + the per-table markers compose to
    * exactly-once index maintenance — the same handshake as the
    * snapshot ingest sinks. */
  def indexSink(docs: DataFrame, root: String, checkpoint: String,
      appId: String): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          applyBatch(batch.sparkSession, root, batch, appId, batchId)
        ()
      }

  /** BM25 top-k: score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b +
    * b·dl/avgdl)) with idf = ln(1 + (N − df + ½)/(df + ½)) — the
    * Robertson/Lucene form, non-negative for every df. One pruned
    * scan (only the query terms' buckets), one tiny per-term
    * aggregate broadcast back onto it, one doc-keyed sum: every
    * stage is a narrow shuffle of ALREADY term-filtered postings.
    * Scores round to 6 decimals and ties break on doc_id, so results
    * are deterministic and engine-comparable. */
  def searchBm25(spark: SparkSession, root: String,
      query: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "empty query")
    val st = SnapshotTable.read(spark, statsRoot(root))
      .agg(sum(col("n_docs")), sum(col("sum_dl"))).head()
    val n = st.getLong(0)
    val avgdl = st.getLong(1).toDouble / n
    val terms = query.distinct
    val p0 = spark.read.format("graft-snapshot").option("path", root)
      .load()
      .filter(col("term").isin(terms: _*))
    // tombstoned docs leave the pruned postings BEFORE df is counted,
    // so df/N/avgdl behave as if they were never indexed. The dels
    // set is bounded by removals since the last rebuild; no broadcast
    // hint — AQE measures it (the decontaminate discipline)
    val p =
      if (SnapshotTable.currentVersion(spark, delsRoot(root)) == 0L) p0
      else p0.join(SnapshotTable.read(spark, delsRoot(root))
        .select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti")
    // df(term) = the term's posting count — computed from the same
    // pruned scan the scorer reads; broadcast: at most |query| rows
    val dfT = p.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    p.join(broadcast(dfT), "term")
      .withColumn("idf",
        log(lit(1.0) + (lit(n.toDouble) - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))))
      .withColumn("w",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl") / lit(avgdl))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("w")), 6).as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }
}
