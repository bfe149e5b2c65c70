package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2.D, mm_decode_stub).
  *
  * Pattern for 100 TB image/audio pipelines: payloads are opaque BINARY
  * columns with a typed metadata struct alongside; decode / feature-extract
  * runs per-partition so a real decoder (libjpeg, ffmpeg, …) amortizes its
  * init across a whole batch instead of paying it per row. The decode body
  * here is a clearly-marked deterministic STUB (the container ships no
  * image/audio libs — builder prompt allows faking the decode); everything
  * Spark-side — schema, binary encoding, partition batching, typed Dataset
  * encoders, the aggregation after — is real and tested.
  */
object Multimodal {

  /** Per-image features the (stubbed) decoder emits. */
  case class ImageFeatures(doc_id: Long, byte_len: Long, checksum: Long,
    width: Int, height: Int, mean_brightness: Double)

  /** Binary "image" payloads synthesized from document text + a metadata
    * struct — stands in for a real image column read from the store.
    */
  def payloads(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        lit("fake/raw").as("format")).as("meta"))

  /** STUB decode: a real implementation would parse the codec header and
    * decode pixels here (per partition, reusing decoder state). The fake
    * derives deterministic features from the raw bytes so the plumbing is
    * testable end-to-end.
    */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    val ss = spark
    import ss.implicits._
    payloads(spark, dir)
      .select(col("doc_id"), col("payload"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        // --- STUB: stands in for decoder init (once per partition) ---
        rows.map { case (id, bytes, w, h) =>
          var sum = 0L
          var i = 0
          while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
          val mean = if (bytes.isEmpty) 0.0
            else math.round(sum.toDouble / bytes.length * 1e6) / 1e6
          ImageFeatures(id, bytes.length.toLong, sum, w, h, mean)
        }
      }
      .toDF()
  }

  /** mm_decode_stub: features + rollup. The brightness average goes
    * through exact integer micro-units (Σ round(mean·1e6) as LONG, divided
    * once at the end) so the result is FP-order-independent and the
    * deterministic fake decode can be held to a full DuckDB oracle — the
    * plumbing (binary payloads, typed mapPartitions, rollup) is gated, not
    * just row-counted.
    */
  def mmDecodeStub(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(spark, dir)
      .groupBy((col("doc_id") % 10).as("shard"))
      .agg(
        count(lit(1)).as("n_images"),
        sum(col("byte_len")).as("total_bytes"),
        sum(round(col("mean_brightness") * 1e6).cast("long")).as("micro"))
      .select(col("shard"), col("n_images"), col("total_bytes"),
        round(col("micro").cast("double") / col("n_images") / 1e6, 6)
          .as("avg_brightness"))
      .orderBy(col("shard").asc)

  /** The oracle re-derives the fake decode arithmetically: the corpus is
    * pure ASCII, so UTF-8 byte_len = length(text) and the byte checksum is
    * the per-character codepoint sum.
    */
  val mmDecodeStubSql: String =
    """WITH feats AS (
      |  SELECT doc_id,
      |    CAST(length(text) AS BIGINT) AS byte_len,
      |    CASE WHEN length(text) = 0 THEN 0
      |      ELSE CAST(round(CAST(list_sum(list_transform(string_split(text, ''),
      |        c -> CAST(ascii(c) AS BIGINT))) AS DOUBLE)
      |        / length(text) * 1000000) AS BIGINT) END AS mb_micro
      |  FROM documents
      |)
      |SELECT doc_id % 10 AS shard, COUNT(*) AS n_images,
      |  CAST(SUM(byte_len) AS BIGINT) AS total_bytes,
      |  round(CAST(SUM(mb_micro) AS DOUBLE) / COUNT(*) / 1000000, 6) AS avg_brightness
      |FROM feats GROUP BY shard ORDER BY shard ASC""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_stub" -> mmDecodeStub)

  val oracles: Map[String, String] = Map(
    "mm_decode_stub" -> mmDecodeStubSql)
}
