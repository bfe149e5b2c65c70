package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ RelationalExt.queries ++
      Namespace.queries ++ Containers.queries ++ Fso.queries ++ Audit.queries ++
      Entities.queries ++ EventOps.queries ++ Temporal.queries ++
      Dedup.queries ++ Similarity.queries ++ TextOps.queries ++
      Multimodal.queries ++ ImageCodec.queries ++ AudioCodec.queries ++ Pipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ RelationalExt.oracles ++
      Namespace.oracles ++ Containers.oracles ++ Fso.oracles ++ Audit.oracles ++
      Entities.oracles ++ EventOps.oracles ++ Temporal.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ TextOps.oracles ++
      Multimodal.oracles ++ ImageCodec.oracles ++ AudioCodec.oracles ++ Pipeline.oracles
}
