package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-column range pruning
  * (SURVEY §6).
  *
  * A table range-partitioned on ONE column prunes scans filtered on that
  * column only; a filter on any other column touches every file. Writing
  * files clustered by the bit-interleaved z-value of two columns makes each
  * file cover a compact rectangle in (x, y) space, so parquet min/max
  * stats prune file and row-group reads for range predicates on EITHER
  * column — the layout trick behind lakehouse OPTIMIZE ZORDER, applied
  * here as a plain write-path utility: at 100 TB the cost is one range
  * shuffle at write time, repaid on every 2-D-selective scan.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of two non-negative int
    * columns: bit i of x lands at position 2i, bit i of y at 2i+1.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(1).cast("long") * (1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(1).cast("long") * (1L << (2 * i + 1))
    }.reduce(_ + _)

  /** Write `df` as `nFiles` parquet files clustered on the z-value of
    * (cx, cy): range partition on z (one shuffle), sort within partitions,
    * drop the helper column. Each output file then covers a compact 2-D
    * tile, so min/max stats are selective on both columns.
    */
  def writeZOrdered(df: DataFrame, path: String, nFiles: Int,
      cx: String, cy: String): Unit =
    df.withColumn("__z", zValue(col(cx), col(cy)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Comparison layout: range-partitioned + sorted on a single column. */
  def writeLinear(df: DataFrame, path: String, nFiles: Int, c: String): Unit =
    df.repartitionByRange(nFiles, col(c))
      .sortWithinPartitions(c)
      .write.mode("overwrite").parquet(path)
}
