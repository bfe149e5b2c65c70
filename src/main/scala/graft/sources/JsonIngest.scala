package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-on-read JSON-lines ingestion — the landing format for event
  * streams before parquet compaction. Discipline for 100 TB intake:
  *
  *  - ALWAYS an explicit schema: schema inference is a second full pass
  *    over the data and silently widens types between batches;
  *  - PERMISSIVE mode with a `_corrupt_record` column: a malformed line
  *    quarantines as data instead of failing the job (or worse, being
  *    dropped silently) — the quarantine split below routes them;
  *  - the parsed stream lands day-partitioned parquet (see
  *    [[Partitioned]]) so downstream queries prune and never re-parse
  *    JSON. JSON decoding is ~10× a parquet read at scale — ingest once,
  *    query columnar.
  */
object JsonIngest {

  /** Read JSON-lines with an explicit schema, keeping malformed lines in
    * `_corrupt_record`.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Split parsed rows from quarantined malformed lines:
    * (clean rows without the corrupt column, corrupt raw lines).
    *
    * The parse is materialized once (localCheckpoint) before splitting —
    * Spark disallows corrupt-column-only projections over a raw JSON scan,
    * and at scale you want both splits written from ONE decode pass, not
    * two scans of the raw text anyway.
    */
  def quarantine(parsed: DataFrame): (DataFrame, DataFrame) = {
    val mat = parsed.localCheckpoint()
    val clean = mat.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val bad = mat.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    (clean, bad)
  }
}
