package graft

import org.apache.spark.sql.SparkSession

/** Session-conf isolation for the driver-contract mains: snapshot
  * queries register catalogs and flip feature flags (e.g. v2
  * bucketing) on the shared session, and without restoration a conf
  * set by an earlier query silently perturbs every later plan. One
  * implementation for Bench and Verify, so the restore rules cannot
  * drift between the two. */
object ConfIsolation {
  def restoring[T](spark: SparkSession)(body: => T): T = {
    val before = spark.conf.getAll
    try body finally spark.conf.getAll.foreach { case (k, v) =>
      before.get(k) match {
        case Some(old) if old != v =>
          try spark.conf.set(k, old) catch { case _: Exception => () }
        case None =>
          try spark.conf.unset(k) catch { case _: Exception => () }
        case _ => ()
      }
    }
  }
}
