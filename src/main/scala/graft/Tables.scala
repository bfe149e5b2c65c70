package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loaders for the driver-generated TPC-H-ish testdata.
  *
  * Reads go through `spark.read.parquet` so Catalyst can push filters and
  * prune columns down to the scan — callers select/filter on the returned
  * DataFrame and the parquet reader only materializes what the plan needs.
  * At 100 TB these would be the same calls against an object-store path
  * (e.g. `ofs://` via the Hadoop FileSystem API, which is how Spark reads
  * from the reference store — see /root/reference/hadoop-ozone/ozonefs/).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")

  /** `events.ts` normalized to a session-timezone TIMESTAMP, adaptively by
    * the dtype the parquet actually carries. The driver's generator has
    * shipped `ts` both as int64 epoch-NANOSECONDS (requires the
    * `nanosAsLong` legacy read + integer division to µs) and as native
    * `timestamp[us]` (reads as TIMESTAMP_NTZ; a cast under the UTC session
    * reinterprets the same wall-clock micros, and DuckDB's naive read
    * agrees). Handling both here means a future generator revert cannot
    * break the 21 events-derived operators again — every consumer
    * (EventOps, Audit, StreamOps) routes through this one normalizer.
    *
    * The `spark.sql.legacy.parquet.nanosAsLong=true` config in the
    * entrypoint sessions (Bench/Verify/Probe/specs) is retained
    * DELIBERATELY even though current data is µs: it is a no-op for µs
    * parquet, and it is what makes a ns-parquet revert read as LongType
    * (handled here) instead of failing at the scan with an illegal-type
    * error before this normalizer ever runs.
    */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType => // int64 epoch-nanos: truncate to µs exactly as DuckDB does
        df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol DIV 1000")))
      case _ => // timestamp[us] (NTZ on read): same instant under the UTC session
        df.withColumn(tsCol, col(tsCol).cast("timestamp"))
    }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
