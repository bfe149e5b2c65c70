package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned parquet layout: the standard large-scale event-log
  * organization (one directory per day, hive-style `day=YYYY-MM-DD`
  * paths). A time-ranged query then PRUNES partitions at plan time — the
  * scan's `PartitionFilters` cut whole directories before any I/O, so a
  * one-week query over a year of data reads ~2% of the files regardless
  * of total size. The reference organizes its key namespace the same way
  * for time-scoped listing (data/<year>/<month>/... prefixes); this is
  * the Spark-native write-side twin of that layout.
  *
  * Partition-count discipline at 100 TB: partition by DAY (≤ a few
  * thousand directories), never by high-cardinality keys — each
  * partition should still hold many row groups; within-day file count is
  * controlled by `repartition` before write so small-file explosion
  * (the ns_compaction_plan problem) doesn't happen at write time.
  */
object Partitioned {

  /** Write `df` partitioned by the DATE of `tsCol` (hive layout),
    * `filesPerDay` files per partition.
    */
  def writeByDay(df: DataFrame, tsCol: String, path: String,
      filesPerDay: Int): Unit =
    df.withColumn("day", to_date(col(tsCol)))
      // Co-locate each (day, sub-bucket) group in one task: each day
      // writes ~filesPerDay files, not one file per shuffle partition.
      .withColumn("fb", pmod(hash(col(tsCol)), lit(filesPerDay)))
      .repartition(col("day"), col("fb"))
      .drop("fb")
      .write.mode("overwrite")
      .partitionBy("day")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
