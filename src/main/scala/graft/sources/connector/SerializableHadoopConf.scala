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
