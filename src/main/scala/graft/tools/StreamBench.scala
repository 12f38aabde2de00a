package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming ingest throughput bench (dev tooling): drives the full
  * parse→flatten→categorize→quality pipeline (graft.streaming
  * .EventPipeline) over synthetic GitHub-archive-shaped JSON events and
  * reports events/second.
  *
  * Context for the number: the reference's ingest path is capped by
  * config at ~33 events/s (BASELINE.md — producer `time.sleep(0.03)`,
  * `api.py`); this measures what the SAME logical pipeline sustains when
  * the transform is declarative Spark running as micro-batches.
  *
  * Usage: runMain graft.tools.StreamBench [events] [batches]
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val nEvents = args.lift(0).map(_.toInt).getOrElse(200000)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val types =
      Array("PushEvent", "IssuesEvent", "PullRequestEvent", "ForkEvent")
    def ev(i: Int): String = {
      val t = types(i % types.length)
      val hh = f"${i % 24}%02d"
      s"""{"id": "$i", "type": "$t", "actor": {"id": ${i % 5000}, """ +
        s""""login": "u${i % 5000}"}, "repo": {"id": ${i % 900}, """ +
        s""""name": "r/${i % 900}"}, "org": null, "payload": """ +
        s"""{"action": "created", "ref": "main"}, "public": true, """ +
        s""""created_at": "2024-01-01T$hh:00:00Z", """ +
        s""""processed_at": "2024-01-01T$hh:00:00Z"}"""
    }

    val stream = MemoryStream[String]
    val q = graft.streaming.EventPipeline.pipeline(stream.toDF())
      .writeStream.format("noop").outputMode("append").start()
    // warmup batch: absorb stream-start + codegen cost outside the clock
    stream.addData(Seq.tabulate(1000)(ev))
    q.processAllAvailable()

    val perBatch = nEvents / nBatches
    val batches =
      Seq.tabulate(nBatches)(b => Seq.tabulate(perBatch)(i => ev(b * perBatch + i)))
    val t0 = System.nanoTime()
    batches.foreach { batch =>
      stream.addData(batch)
      q.processAllAvailable()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    q.stop()
    val total = perBatch * nBatches
    println(s"""{"metric":"stream_ingest","events":$total,""" +
      s""""batches":$nBatches,"sec":$secs,""" +
      s""""events_per_sec":${(total / secs).round}}""")
    spark.stop()
  }
}
