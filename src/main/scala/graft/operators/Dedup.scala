package graft.operators

import graft.Tables
import graft.functions.Codes
import graft.functions.Codes._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines (SURVEY §2.D).
  *
  * Scale design (SURVEY §5): exact dedup is one shuffle on the normalized
  * text; MinHash is O(n·k) map work + one shuffle on (band, signature) with
  * bounded fanout — candidate pairs are generated only *within* LSH buckets,
  * never all-pairs; Jaccard verification touches only those candidates.
  * Only dd_embed_cosine does a (broadcast) all-pairs scan — it is the exact
  * baseline; the LSH-bucketed scale path is [[Similarity.simKnnLsh]].
  */
object Dedup {

  private val NumHashes = 8
  private val Bands = 4 // 4 bands x 2 rows

  // --- dd_exact: normalize -> group -> canonical min doc_id --------------
  def ddExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(lower(trim(col("text"))).as("norm_text"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_docs"))
      .select(col("canonical_id"), col("n_docs"),
        (col("n_docs") - 1).as("n_duplicates"))
      .orderBy(col("canonical_id").asc)

  val ddExactSql: String =
    """SELECT canonical_id, n_docs, n_docs - 1 AS n_duplicates FROM (
      |  SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS n_docs
      |  FROM documents GROUP BY lower(trim(text))
      |) t ORDER BY canonical_id ASC""".stripMargin

  /** Per-doc MinHash signature columns mh0..mh7 over word-3gram shingles. */
  private[graft] def signatures(docs: DataFrame): DataFrame = {
    val sh = docs
      .select(col("doc_id"), explode(shingles3(tokens(col("text")))).as("sh"))
      .withColumn("x", strCode(col("sh")))
    val mins = (0 until NumHashes).map(i => min(Codes.hash(i, col("x"))).as(s"mh$i"))
    sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** The matching DuckDB CTE chain: doc_sh(doc_id, x), sigs(doc_id, mh0..7). */
  private val signaturesSql: String = {
    val mins = (0 until NumHashes)
      .map(i => s"MIN(${hashSql(i, "x")}) AS mh$i").mkString(", ")
    s"""toks AS (
       |  SELECT doc_id, ${tokensSql("text")} AS ts FROM documents
       |), doc_sh AS (
       |  SELECT DISTINCT doc_id, ${strCodeSql("sh")} AS x
       |  FROM (SELECT doc_id, unnest(${shingles3Sql("ts")}) AS sh FROM toks) u
       |), sigs AS (
       |  SELECT doc_id, $mins FROM doc_sh GROUP BY doc_id
       |)""".stripMargin
  }

  /** LSH candidate pairs: docs sharing any of the 4 (mh2i, mh2i+1) bands.
    * One shuffle on the band signature; pairs form only inside buckets.
    */
  private[graft] def lshPairs(sigs: DataFrame): DataFrame = {
    val bands = (0 until Bands).map { b =>
      sigs.select(lit(b).as("band"), col(s"mh${2 * b}").as("h1"),
        col(s"mh${2 * b + 1}").as("h2"), col("doc_id"))
    }.reduce(_ union _)
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.h1") === col("b.h1") &&
          col("a.h2") === col("b.h2") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  private val lshPairsSql: String = {
    val bandSelects = (0 until Bands)
      .map(b => s"SELECT $b AS band, mh${2 * b} AS h1, mh${2 * b + 1} AS h2, doc_id FROM sigs")
      .mkString("\nUNION ALL\n")
    s"""bands AS (
       |$bandSelects
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2
       |    AND a.doc_id < b.doc_id
       |)""".stripMargin
  }

  // --- dd_minhash_lsh: candidate near-dup pairs ---------------------------
  def ddMinhashLsh(spark: SparkSession, dir: String): DataFrame =
    lshPairs(signatures(Tables.documents(spark, dir)))
      .orderBy(col("doc_a").asc, col("doc_b").asc)

  val ddMinhashLshSql: String =
    s"""WITH $signaturesSql, $lshPairsSql
       |SELECT doc_a, doc_b FROM cand ORDER BY doc_a ASC, doc_b ASC""".stripMargin

  // --- dd_ngram_jaccard: exact verify over LSH candidates -----------------
  def ddNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sets = docs.select(col("doc_id"),
      shingles3(tokens(col("text"))).as("sg"))
    val cand = lshPairs(signatures(docs))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sg").as("sg_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sg").as("sg_b")), "doc_b")
      .withColumn("n_inter", size(array_intersect(col("sg_a"), col("sg_b"))))
      .withColumn("n_union",
        size(col("sg_a")) + size(col("sg_b")) - col("n_inter"))
      .withColumn("jaccard",
        round(col("n_inter").cast("double") / col("n_union"), 6))
      .filter(col("jaccard") >= 0.6)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy(col("doc_a").asc, col("doc_b").asc)
  }

  val ddNgramJaccardSql: String =
    s"""WITH $signaturesSql, $lshPairsSql, sets AS (
       |  SELECT doc_id, ${shingles3Sql("ts")} AS sg FROM toks
       |), scored AS (
       |  SELECT c.doc_a, c.doc_b,
       |    round(CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) /
       |      (len(sa.sg) + len(sb.sg) - len(list_intersect(sa.sg, sb.sg))), 6) AS jaccard
       |  FROM cand c
       |  JOIN sets sa ON c.doc_a = sa.doc_id
       |  JOIN sets sb ON c.doc_b = sb.doc_id
       |)
       |SELECT doc_a, doc_b, jaccard FROM scored
       |WHERE jaccard >= 0.6 ORDER BY doc_a ASC, doc_b ASC""".stripMargin

  // --- dd_simhash: 16-bit simhash + bucket sizes ---------------------------
  def ddSimhash(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .distinct()
      .withColumn("h", Codes.hash(0, strCode(col("t"))))
    val sumCols = (0 until 16).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1L)
        .otherwise(-1L)).as(s"s$j")
    }
    val bitSums = tok.groupBy(col("doc_id")).agg(sumCols.head, sumCols.tail: _*)
    val simhash = (0 until 16)
      .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L))
      .reduce(_ + _)
    val withHash = bitSums.select(col("doc_id"), simhash.as("simhash"))
    withHash
      .withColumn("bucket_size",
        count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("simhash"))))
      .orderBy(col("doc_id").asc)
  }

  val ddSimhashSql: String = {
    val bitSums = (0 until 16)
      .map(j => s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j")
      .mkString(", ")
    val simhash = (0 until 16)
      .map(j => s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    s"""WITH tok AS (
       |  SELECT DISTINCT doc_id, ${hashSql(0, strCodeSql("t"))} AS h
       |  FROM (SELECT doc_id, unnest(${tokensSql("text")}) AS t FROM documents) u
       |), bitsums AS (
       |  SELECT doc_id, $bitSums FROM tok GROUP BY doc_id
       |), sh AS (
       |  SELECT doc_id, CAST($simhash AS BIGINT) AS simhash FROM bitsums
       |)
       |SELECT doc_id, simhash,
       |  CAST(COUNT(*) OVER (PARTITION BY simhash) AS BIGINT) AS bucket_size
       |FROM sh ORDER BY doc_id ASC""".stripMargin
  }

  // --- dd_embed_cosine: exact cosine near-dup pairs (quantized ints) ------
  /** Embeddings quantized to round(x*1000) ints so dot products are exact
    * integer sums — order-independent, hence engine-independent (SURVEY §4).
    */
  private[graft] def quantized(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).select(
      col("vec_id"), col("label"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1000).cast("long")).as("q"))
      .withColumn("n2",
        aggregate(col("q"), lit(0L), (acc, v) => acc + v * v))

  private[graft] val quantizedSql: String =
    """qv AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
      |  FROM embeddings
      |), nm AS (
      |  SELECT vec_id, label, q,
      |    CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2
      |  FROM qv
      |)""".stripMargin

  private[graft] def cosine(qa: Column, qb: Column, na: Column, nb: Column): Column = {
    val dot = aggregate(zip_with(qa, qb, (a, b) => a * b), lit(0L), (acc, v) => acc + v)
    dot.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))
  }

  private[graft] def cosineSql(qa: String, qb: String, na: String, nb: String): String =
    s"CAST(list_sum(list_transform(range(1, len($qa) + 1), i -> $qa[i] * $qb[i])) AS DOUBLE)" +
      s" / (sqrt(CAST($na AS DOUBLE)) * sqrt(CAST($nb AS DOUBLE)))"

  def ddEmbedCosine(spark: SparkSession, dir: String): DataFrame = {
    val nm = quantized(spark, dir)
    val a = nm.select(col("vec_id").as("vec_a"), col("q").as("qa"), col("n2").as("na"))
    val b = nm.select(col("vec_id").as("vec_b"), col("q").as("qb"), col("n2").as("nb"))
    a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos_sim",
        round(cosine(col("qa"), col("qb"), col("na"), col("nb")), 6))
      .filter(col("cos_sim") >= 0.4)
      .select("vec_a", "vec_b", "cos_sim")
      .orderBy(col("vec_a").asc, col("vec_b").asc)
  }

  val ddEmbedCosineSql: String =
    s"""WITH $quantizedSql
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  round(${cosineSql("a.q", "b.q", "a.n2", "b.n2")}, 6) AS cos_sim
       |FROM nm a JOIN nm b ON a.vec_id < b.vec_id
       |WHERE round(${cosineSql("a.q", "b.q", "a.n2", "b.n2")}, 6) >= 0.4
       |ORDER BY vec_a ASC, vec_b ASC""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_exact" -> ddExact,
    "dd_minhash_lsh" -> ddMinhashLsh,
    "dd_ngram_jaccard" -> ddNgramJaccard,
    "dd_simhash" -> ddSimhash,
    "dd_embed_cosine" -> ddEmbedCosine)

  val oracles: Map[String, String] = Map(
    "dd_exact" -> ddExactSql,
    "dd_minhash_lsh" -> ddMinhashLshSql,
    "dd_ngram_jaccard" -> ddNgramJaccardSql,
    "dd_simhash" -> ddSimhashSql,
    "dd_embed_cosine" -> ddEmbedCosineSql)
}
