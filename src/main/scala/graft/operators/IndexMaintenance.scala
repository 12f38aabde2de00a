package graft.operators

import org.apache.spark.sql.SparkSession

import graft.sources.SnapshotTable

/** ENFORCED maintenance-mode exclusivity for the persisted indexes
  * ([[TextIndex]], [[VectorIndex]]): manual `add`/`remove` stamp the
  * index-version timeline, CDC maintenance stamps the SOURCE-version
  * timeline, and the two orderings are incomparable — mixing them on
  * one index silently produces era/cut comparisons between unrelated
  * counters (a remove might fail to kill, or kill a live re-add).
  * Until r16 that line was scaladoc convention; this records the mode
  * as a table property on the FIRST maintaining write and refuses the
  * other mode loudly. A rebuild ([[TextIndex.build]] /
  * [[VectorIndex.build]]) clears the claim — a fresh index may be
  * maintained either way. */
private[operators] object IndexMaintenance {

  val Prop = "graft.index.maintenance" // manual | cdc

  /** Claim `mode` for the index at `root`, or refuse if the OTHER mode
    * already maintains it. Idempotent per mode; the property write
    * happens only on the first claim (one tiny side-file write), so
    * per-micro-batch claims cost a property read. */
  def claim(spark: SparkSession, root: String, mode: String): Unit = {
    require(mode == "manual" || mode == "cdc", s"bad mode '$mode'")
    val p = SnapshotTable.tableProperties(spark, root)
    p.get(Prop) match {
      case Some(m) if m == mode => ()
      case Some(m) => throw new IllegalStateException(
        s"index at $root is maintained in '$m' mode; refusing a '$mode' " +
          "write — manual add/remove (index-version timeline) and CDC " +
          "maintenance (source-version timeline) produce incomparable " +
          "era/cut orderings on one index. Rebuild the index to reset " +
          "its maintenance mode.")
      case None =>
        SnapshotTable.setProperties(spark, root, p + (Prop -> mode))
    }
  }
}
