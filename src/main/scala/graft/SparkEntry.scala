package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Each query is
    * wrapped in [[Tables.withQuery]] so construction-time plan choices
    * with measured per-operator outcomes (the scan fan-out allowlist,
    * Tables.fanoutQueries) know which registry query they serve.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (Relational.queries ++ RelationalExt.queries ++
      Namespace.queries ++ Containers.queries ++ Fso.queries ++ Audit.queries ++
      Entities.queries ++ EventOps.queries ++ Temporal.queries ++
      Dedup.queries ++ Similarity.queries ++ TextOps.queries ++
      Multimodal.queries ++ ImageCodec.queries ++ AudioCodec.queries ++
      Pipeline.queries)
      .map { case (name, fn) =>
        name -> ((s: SparkSession, d: String) =>
          Tables.withQuery(name)(fn(s, d)))
      }

  /** CTE heads rewritten to DuckDB's `AS MATERIALIZED` form. DuckDB
    * INLINES every CTE reference by default, so a chain referenced k
    * times re-evaluates its whole upstream k times — the 4-round
    * min-label-propagation oracles went exponential in rounds
    * (pipe_dedup_funnel measured 329 s at sf0.01; materialized, 1.7 s;
    * the full 273-oracle compare 1216 s → ~80 s). The driver's
    * correctness leg runs these strings under a wall budget that the
    * r14/r15 registry outgrew — this is the fix that lets ANY DuckDB
    * consumer (driver, tools/check.py, the sf1 gate) evaluate each CTE
    * exactly once, Spark-style. The guard `AS (\s*SELECT|VALUES` keeps
    * window clauses (`WINDOW w AS (PARTITION …)`) untouched; results are
    * bit-identical (materialization changes evaluation, not semantics).
    */
  private val CteHead =
    """([A-Za-z_][A-Za-z0-9_]*) AS \((\s*)(SELECT|VALUES)""".r
  private[graft] def materializeCtes(sql: String): String =
    CteHead.replaceAllIn(sql, m =>
      scala.util.matching.Regex.quoteReplacement(
        s"${m.group(1)} AS MATERIALIZED (${m.group(2)}${m.group(3)}"))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    (Relational.oracles ++ RelationalExt.oracles ++
      Namespace.oracles ++ Containers.oracles ++ Fso.oracles ++ Audit.oracles ++
      Entities.oracles ++ EventOps.oracles ++ Temporal.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ TextOps.oracles ++
      Multimodal.oracles ++ ImageCodec.oracles ++ AudioCodec.oracles ++
      Pipeline.oracles)
      .view.mapValues(materializeCtes).toMap
}
