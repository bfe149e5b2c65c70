package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact ordered-scan state — global per-group rank and/or
  * exclusive running sum — the scale-safe replacement for
  * `x.over(Window.partitionBy(group).orderBy(order))` when the window input
  * is corpus-sized and the group key is low-cardinality (buckets, sources,
  * strata): that window plan runs ONE sequential pass per group, so its
  * parallelism is capped at the number of groups no matter how many
  * executors the cluster has.
  *
  * Shape (pipe_curriculum's distributed NTILE, generalized): range-shard on
  * (group ++ order) so shard boundaries respect the scan order, then
  * rank/sum locally per (shard, group) — #shards-way parallel — and shift
  * each row by its (group, shard) exclusive offset. The offsets frame is
  * metadata-sized (≤ #shards × #groups rows), computed with a window over
  * AGGREGATED input and broadcast back. Output is bit-identical to the
  * single-window formulation provided the order keys are unique within each
  * group (every caller orders by a unique tie-break, per SURVEY §4). The
  * corpus crosses two exchanges (range shard + the local window's
  * clustering) instead of one, buying unbounded parallelism: at 100 TB two
  * parallel shuffles beat one pass serialized through #groups tasks.
  */
object PrefixScan {

  /** Adds to `df` any of: `rankOut` — 1-based BIGINT rank of the row within
    * its `group`, ordered ascending by `order`; `cumOut` — BIGINT exclusive
    * running sum of `value` in that order (0 for the group's first row);
    * `totalOut` — the group's total row count. `order` must be unique
    * within each group for rank/cum to be well-defined; `value` must be
    * integral.
    */
  def scanState(df: DataFrame, group: Seq[String], order: Seq[Column],
      value: Column, rankOut: Option[String] = None,
      cumOut: Option[String] = None,
      totalOut: Option[String] = None): DataFrame = {
    val g = group.map(col)
    val shard = col("__ps_shard")
    val sharded = df
      .repartitionByRange((g ++ order).map(_.asc): _*)
      .withColumn("__ps_shard", spark_partition_id())
    val localW = Window.partitionBy((shard +: g): _*)
      .orderBy(order.map(_.asc): _*)
    val local = sharded
      .withColumn("__ps_lrank", row_number().over(localW).cast("bigint"))
      .withColumn("__ps_lcum", coalesce(
        sum(value).over(localW.rowsBetween(Window.unboundedPreceding, -1))
          .cast("bigint"),
        lit(0L)))
    // Metadata frame: per-(group, shard) counts/sums → exclusive prefix
    // offsets across shards (shard order = scan order, by the range
    // partitioning) + the group total. Bounded by #shards × #groups rows.
    val offW = Window.partitionBy(g: _*).orderBy(shard.asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy((shard +: g): _*)
      .agg(count(lit(1)).as("__ps_cnt"),
        sum(value).cast("bigint").as("__ps_sum"))
      .withColumn("__ps_roff", coalesce(sum(col("__ps_cnt")).over(offW), lit(0L)))
      .withColumn("__ps_coff", coalesce(sum(col("__ps_sum")).over(offW), lit(0L)))
      .withColumn("__ps_n", sum(col("__ps_cnt")).over(Window.partitionBy(g: _*)))
      .select((shard +: g) ++
        Seq(col("__ps_roff"), col("__ps_coff"), col("__ps_n")): _*)
    val joined = local.join(broadcast(offsets), "__ps_shard" +: group)
    val out1 = rankOut.fold(joined)(n =>
      joined.withColumn(n, col("__ps_roff") + col("__ps_lrank")))
    val out2 = cumOut.fold(out1)(n =>
      out1.withColumn(n, col("__ps_coff") + col("__ps_lcum")))
    val out3 = totalOut.fold(out2)(n => out2.withColumn(n, col("__ps_n")))
    out3.drop("__ps_shard", "__ps_lrank", "__ps_lcum",
      "__ps_roff", "__ps_coff", "__ps_n")
  }
}
