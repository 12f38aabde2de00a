package graft.sources.connector

import org.apache.hadoop.conf.Configuration

/** Java-serializable carrier for the session's Hadoop configuration —
  * captured ONCE on the driver and shipped inside task closures /
  * reader+writer factories, so per-file code never fabricates a bare
  * `new Configuration()` (which re-parses default XML locally and, on
  * a real cluster, silently drops the session's credentials and
  * filesystem implementations). Same shape as Spark's own
  * `SerializableConfiguration`, which is `private[spark]`.
  *
  * The deserialized `value` is one instance PER TASK (closures and V2
  * factories deserialize per task), so read-only use is safe; anything
  * that mutates a conf must take a `new Configuration(value)` copy. */
final class SerializableHadoopConf(@transient var value: Configuration)
  extends Serializable {

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

object SerializableHadoopConf {
  /** The session Hadoop conf as a BROADCAST, captured at call time.
    * Ship the handle (a few bytes) inside factories/closures instead
    * of the conf itself: embedding the ~100 KB conf in every task
    * binary made EVERY task re-deserialize it (measured as a
    * per-task tax across all scan/commit-heavy queries in the r18
    * A/B); a broadcast deserializes once per executor — and in local
    * mode `.value` returns the shared object with no copy at all. */
  def broadcast(spark: org.apache.spark.sql.SparkSession)
  : org.apache.spark.broadcast.Broadcast[SerializableHadoopConf] =
    spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sessionState.newHadoopConf()))
}
