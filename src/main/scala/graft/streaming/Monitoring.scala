package graft.streaming

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Streaming progress monitoring (SURVEY §2.6). The reference polls
  * `query.lastProgress` from an HTTP endpoint for batch counts and
  * rows/sec (`services/streaming-service/api.py:323-338`) — a pull
  * model that misses batches between polls. A `StreamingQueryListener`
  * is the push equivalent: every micro-batch is observed exactly once
  * on the listener bus, with no per-poll driver work, and it scales to
  * any number of concurrent queries on the session.
  */
object Monitoring {

  /** Cumulative per-query stats, updated once per micro-batch.
    * `lastObserved` carries the latest batch's `Dataset.observe`
    * metric rows keyed by observation name (e.g.
    * [[EventPipeline.withQualityMetrics]]'s "graft_quality"). */
  final case class QueryStats(
      name: String,
      batches: Long,
      inputRows: Long,
      lastRowsPerSec: Double,
      lastBatchMs: Long,
      terminated: Boolean,
      error: Option[String],
      lastObserved: Map[String, org.apache.spark.sql.Row] = Map.empty)

  /** Listener accumulating [[QueryStats]] per query id. Thread-safe:
    * the listener bus delivers events from its own thread. */
  final class ProgressMonitor extends StreamingQueryListener {
    private val stats = new ConcurrentHashMap[UUID, QueryStats]()
    // start order per run id: a checkpoint restart reuses the NAME with
    // a fresh run — snapshot must expose the latest run, not whichever
    // map entry iterates last
    private val startSeq = new ConcurrentHashMap[UUID, Long]()
    private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

    override def onQueryStarted(e: QueryStartedEvent): Unit = {
      startSeq.put(e.id, seq.incrementAndGet())
      stats.put(e.id,
        QueryStats(Option(e.name).getOrElse(e.id.toString),
          0L, 0L, 0.0, 0L, terminated = false, error = None))
    }

    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val p = e.progress
      stats.compute(p.id, (_, prev0) => {
        val prev = Option(prev0).getOrElse(
          QueryStats(Option(p.name).getOrElse(p.id.toString),
            0L, 0L, 0.0, 0L, terminated = false, error = None))
        val batchMs = Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue).getOrElse(0L)
        val rps = p.processedRowsPerSecond
        val observed = p.observedMetrics.asScala.toMap
        prev.copy(
          batches = prev.batches + 1,
          inputRows = prev.inputRows + p.numInputRows,
          lastRowsPerSec = if (rps.isNaN) prev.lastRowsPerSec else rps,
          lastBatchMs = batchMs,
          // keep the previous batch's metrics through empty batches
          // (an empty micro-batch reports no observations)
          lastObserved =
            if (observed.isEmpty) prev.lastObserved else observed)
      })
    }

    override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
      stats.computeIfPresent(e.id, (_, prev) =>
        prev.copy(terminated = true, error = e.exception))

    /** Point-in-time view keyed by query name (id string if unnamed);
      * when a name has run more than once (checkpoint restart), the
      * most recently started run wins. */
    def snapshot: Map[String, QueryStats] =
      stats.asScala.toSeq
        .sortBy { case (id, _) => startSeq.getOrDefault(id, 0L) }
        .map { case (_, s) => s.name -> s }
        .toMap // later (higher-seq) entries overwrite earlier ones
  }

  /** Attach a fresh monitor to the session's listener bus. */
  def attach(spark: SparkSession): ProgressMonitor = {
    val m = new ProgressMonitor
    spark.streams.addListener(m)
    m
  }

  def detach(spark: SparkSession, m: ProgressMonitor): Unit =
    spark.streams.removeListener(m)
}
