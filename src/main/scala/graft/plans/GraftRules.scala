package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** The engine's optimizer rules and their runtime attach point (the
  * extensions path — GraftExtensions — injects the same list at session
  * build time; this mutator covers sessions built without extensions,
  * e.g. the driver's Verify/Bench mains). Idempotent. */
object GraftRules {
  val all: Seq[Rule[LogicalPlan]] = Seq(SimilarityRewrite, EventTimePushdown)

  def attach(spark: SparkSession): Unit = all.foreach { r =>
    if (!spark.experimental.extraOptimizations.contains(r))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ r
  }
}
