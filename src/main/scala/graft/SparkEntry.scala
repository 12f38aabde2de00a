package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Sources

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (one named DataFrame pipeline
  * per operator family from SURVEY.md §2 + the M2/M4 extensions);
  * `oracleSql` carries the DuckDB-equivalent ANSI SQL for every
  * deterministic, SQL-expressible query. Non-SQL-expressible ops (hash
  * sketches, LSH, streaming) are present in `queries` with rows-only
  * checks and omitted from `oracleSql` per the contract.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue by region-nation over the full star-schema join path
    * (lineitem⋈orders⋈customer⋈nation⋈region) — exercises broadcast
    * joins + hash aggregation end-to-end. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("star_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EventAnalytics.queries ++ Relational.queries ++ Temporal.queries ++
      TextAnalysis.queries ++ Dedup.queries ++ Similarity.queries ++
      Sources.queries ++ Typed.queries ++ graft.multimodal.Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    EventAnalytics.oracleSql ++ Relational.oracleSql ++ Temporal.oracleSql ++
      TextAnalysis.oracleSql ++ Dedup.oracleSql ++ Similarity.oracleSql ++
      Sources.oracleSql ++ Typed.oracleSql ++
      graft.multimodal.Multimodal.oracleSql
}
