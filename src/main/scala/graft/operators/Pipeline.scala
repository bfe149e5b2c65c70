package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation flow as ONE declarative plan
  * (SURVEY §2.D composition): exact dedup (fold-hash fingerprint groups) →
  * near-dup canonicalization (MinHash LSH → Jaccard verify → label
  * propagation) → quality filter. Per doc: why it was kept or dropped.
  *
  * This is the query a 100 TB curation run actually executes — the stages
  * share scans and exchanges (Catalyst reuses the doc scan; the LSH
  * pipeline appears once), rather than three separate jobs writing
  * intermediate datasets.
  */
object Pipeline {

  private val QualityMin = 0.85

  def pipeCurate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val exact = Dedup.fingerprints(docs)
      .withColumn("grp_min",
        min(col("doc_id")).over(Window.partitionBy(col("h1"), col("h2"))))
      .select(col("doc_id"), (col("doc_id") =!= col("grp_min")).as("is_exact_dup"))
    val near = Dedup.canonicalLabels(docs)
      .select(col("doc_id"), (col("doc_id") =!= col("label")).as("is_near_dup"))
    val quality = TextOps.txQuality(spark, dir).select("doc_id", "quality_score")
    exact.join(near, "doc_id").join(quality, "doc_id")
      .withColumn("kept",
        !col("is_exact_dup") && !col("is_near_dup") &&
          col("quality_score") >= QualityMin)
      .select("doc_id", "is_exact_dup", "is_near_dup", "quality_score", "kept")
      .orderBy(col("doc_id").asc)
  }

  val pipeCurateSql: String =
    s"""WITH ${Dedup.canonicalCtes}, ${Dedup.fingerprintsSql}, exact AS (
       |  SELECT doc_id,
       |    doc_id <> MIN(doc_id) OVER (PARTITION BY h1, h2) AS is_exact_dup
       |  FROM fp
       |), near AS (
       |  SELECT doc_id, doc_id <> label AS is_near_dup FROM lab3
       |), quality AS (
       |  SELECT doc_id, quality_score FROM (${TextOps.txQualitySql}) q
       |)
       |SELECT e.doc_id, e.is_exact_dup, n.is_near_dup, q.quality_score,
       |  (NOT e.is_exact_dup) AND (NOT n.is_near_dup)
       |    AND q.quality_score >= $QualityMin AS kept
       |FROM exact e
       |JOIN near n ON e.doc_id = n.doc_id
       |JOIN quality q ON e.doc_id = q.doc_id
       |ORDER BY e.doc_id ASC""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_curate" -> pipeCurate)

  val oracles: Map[String, String] = Map(
    "pipe_curate" -> pipeCurateSql)
}
