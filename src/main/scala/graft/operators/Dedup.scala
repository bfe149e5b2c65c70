package graft.operators

import graft.Tables
import graft.functions.Codes
import graft.functions.Codes._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines (SURVEY §2.D).
  *
  * Scale design (SURVEY §5): exact dedup shuffles an 8-byte fingerprint of
  * the normalized text (never the text itself); MinHash is O(n·64) map work
  * + ONE aggregation — candidate pairs are emitted by grouping band
  * signatures into buckets and expanding pairs inside each bucket, so the
  * signature computation is never repeated across a self-join and buckets
  * above [[Dedup.MaxBucket]] are dropped (skew guard, mirrored in the
  * oracle). Jaccard verification touches only those candidates.
  * dd_embed_cosine blocks by 2 bands of 8 random-hyperplane sign bits and
  * exact-cosine-verifies only intra-bucket pairs — no all-pairs product
  * anywhere (VERDICT r2 #1).
  */
object Dedup {

  private[graft] val Bands = 16 // 16 bands x 4 rows = 64 hashes
  private val RowsPerBand = NumHashes / Bands

  /** Skew guard: LSH buckets larger than this emit no pairs (a bucket this
    * size at 100 TB is a degenerate shingle set, not a dedup signal).
    */
  private[graft] val MaxBucket = 100

  /** Embed-cosine bucket cap (per 8-bit sign bucket and band). */
  private val EmbedMaxBucket = 500

  // --- dd_exact: fingerprint -> group -> canonical min doc_id -------------
  /** Exact dedup keyed on two independent full-string fold hashes of the
    * normalized text — the shuffle carries 16 bytes per doc instead of the
    * document body (VERDICT r2 #2); the hash pair makes a false merge a
    * ~2^-62 event.
    */
  /** Per-doc dual fold-hash fingerprints of the normalized text. */
  private[graft] def fingerprints(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), lower(trim(col("text"))).as("norm"))
      .select(col("doc_id"),
        Codes.foldCode(col("norm"), 31L, P).as("h1"),
        Codes.foldCode(col("norm"), 131L, P2).as("h2"))

  private[graft] val fingerprintsSql: String = {
    val norm = "lower(trim(text))"
    s"""fp AS (
       |  SELECT doc_id,
       |    ${foldCodeSql(norm, 31L, P)} AS h1,
       |    ${foldCodeSql(norm, 131L, P2)} AS h2
       |  FROM documents
       |)""".stripMargin
  }

  def ddExact(spark: SparkSession, dir: String): DataFrame = {
    fingerprints(Tables.documents(spark, dir))
      .groupBy(col("h1"), col("h2"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_docs"))
      .select(col("canonical_id"), col("n_docs"),
        (col("n_docs") - 1).as("n_duplicates"))
      .orderBy(col("canonical_id").asc)
  }

  val ddExactSql: String =
    s"""WITH $fingerprintsSql
       |SELECT canonical_id, n_docs, n_docs - 1 AS n_duplicates FROM (
       |  SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS n_docs
       |  FROM fp GROUP BY h1, h2
       |) t ORDER BY canonical_id ASC""".stripMargin

  /** Per-doc 64-column minhash signature, computed MAP-SIDE by the
    * [[graft.functions.MinHash64Expr]] kernel — one compiled traversal of
    * the shingle-code array per doc. The previous explode → 64×min
    * aggregate paid a docs-sized exchange (partial-agg hashmap + one
    * 64-long row per doc on the wire) in EVERY LSH consumer; this form
    * shuffles nothing. The three-stage projection keeps each kernel input
    * an attribute, not an inlined expression (the CollapseProject trap:
    * a non-cheap producer referenced 64 times must stay materialized).
    */
  private[graft] def signatures(docs: DataFrame): DataFrame = {
    // The shingle-set-nonempty guard is expressed as token count AT THE
    // SCAN (< 3 tokens ⟺ zero shingles): a filter on the scs column would
    // be predicate-pushed below the projections and re-evaluate the whole
    // interpreted shingle lambda per row — with the token codes inlined
    // per element, the O(tokens²) txContamination trap.
    val sh = docs
      .filter(size(tokens(col("text"))) >= 3)
      .select(col("doc_id"), strCodes(tokens(col("text"))).as("tcs"))
      .select(col("doc_id"), shingleCodes3(col("tcs")).as("scs"))
      .select(col("doc_id"), Codes.minHash64(col("scs")).as("mh"))
    sh.select(col("doc_id") +:
      (0 until NumHashes).map(i => col("mh").getItem(i).as(s"mh$i")): _*)
  }

  /** The matching DuckDB CTE chain: sc(doc_id, scs), sigs(doc_id, mh0..63). */
  private val signaturesSql: String = {
    val mins = (0 until NumHashes)
      .map(i => s"list_min(list_transform(scs, x -> ${hashSql(i, "x")})) AS mh$i")
      .mkString(", ")
    s"""toks AS (
       |  SELECT doc_id, ${tokensSql("text")} AS ts FROM documents
       |), tc AS (
       |  SELECT doc_id, ${strCodesSql("ts")} AS tcs FROM toks
       |), sc AS (
       |  SELECT doc_id, ${shingleCodes3Sql("tcs")} AS scs FROM tc
       |), sigs AS (
       |  SELECT doc_id, $mins FROM sc WHERE len(scs) > 0
       |)""".stripMargin
  }

  /** Band signature: the 4 row hashes of band b folded into one value. */
  private[graft] def bandSig(b: Int): Column =
    (0 until RowsPerBand).map(r => col(s"mh${RowsPerBand * b + r}"))
      .reduce((acc, h) => (acc * 31L + h) % P)

  private def bandSigSql(b: Int): String =
    (0 until RowsPerBand).map(r => s"mh${RowsPerBand * b + r}")
      .reduce((acc, h) => s"(($acc * 31 + $h) % $P)")

  /** LSH candidate pairs: docs sharing any of the 16 band signatures.
    * One shuffle on (band, sig); buckets expand to pairs in place via
    * [[Codes.pairs]] — no self-join, signatures computed exactly once;
    * buckets over [[MaxBucket]] are dropped (skew guard).
    */
  /** (band, sig, doc_id) rows — one explode over an array of (band, sig)
    * structs, so the 64 minhash columns in `sigs` are computed exactly once
    * per doc (a 16-way union of selects would re-run the signature
    * projection per band).
    */
  private[graft] def bandRows(sigs: DataFrame): DataFrame = {
    val bandStructs = array((0 until Bands).map(b =>
      struct(lit(b).as("band"), bandSig(b).as("sig"))): _*)
    sigs
      .select(col("doc_id"), explode(bandStructs).as("bs"))
      .select(col("bs.band").as("band"), col("bs.sig").as("sig"), col("doc_id"))
  }

  private[graft] def lshPairs(sigs: DataFrame): DataFrame = {
    val bands = bandRows(sigs)
    bands.groupBy(col("band"), col("sig"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, MaxBucket))
      .select(explode(Codes.pairs(col("ids"))).as("pr"))
      .select(col("pr.doc_a").as("doc_a"), col("pr.doc_b").as("doc_b"))
      .distinct()
  }

  private val lshPairsSql: String = {
    val bandSelects = (0 until Bands)
      .map(b => s"SELECT $b AS band, ${bandSigSql(b)} AS sig, doc_id FROM sigs")
      .mkString("\nUNION ALL\n")
    s"""bands AS (
       |$bandSelects
       |), bcnt AS (
       |  SELECT band, sig, doc_id,
       |    COUNT(*) OVER (PARTITION BY band, sig) AS n FROM bands
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bcnt a JOIN bcnt b
       |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
       |    AND a.n <= $MaxBucket AND b.n <= $MaxBucket
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
  /** Jaccard-verified near-dup edges (≥ 0.6 over LSH candidates). */
  private[graft] def verifiedPairs(docs: DataFrame): DataFrame = {
    // Two-stage projection: shingleCodes3's lambda must read an attribute,
    // not an inlined token-code expression (see signatures()).
    val sets = docs
      .select(col("doc_id"), strCodes(tokens(col("text"))).as("tcs"))
      .select(col("doc_id"), shingleCodes3(col("tcs")).as("sg"))
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
  }

  /** Shared CTE chain ending in scored(doc_a, doc_b, jaccard). */
  private val scoredSqlCtes: String =
    s"""$signaturesSql, $lshPairsSql, sets AS (
       |  SELECT doc_id, scs AS sg FROM sc
       |), scored AS (
       |  SELECT c.doc_a, c.doc_b,
       |    round(CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) /
       |      (len(sa.sg) + len(sb.sg) - len(list_intersect(sa.sg, sb.sg))), 6) AS jaccard
       |  FROM cand c
       |  JOIN sets sa ON c.doc_a = sa.doc_id
       |  JOIN sets sb ON c.doc_b = sb.doc_id
       |)""".stripMargin

  def ddNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    verifiedPairs(Tables.documents(spark, dir))
      .select("doc_a", "doc_b", "jaccard")
      .orderBy(col("doc_a").asc, col("doc_b").asc)

  val ddNgramJaccardSql: String =
    s"""WITH $scoredSqlCtes
       |SELECT doc_a, doc_b, jaccard FROM scored
       |WHERE jaccard >= 0.6 ORDER BY doc_a ASC, doc_b ASC""".stripMargin

  // --- dd_containment: asymmetric overlap over LSH candidates -------------
  /** Containment-scored candidate pairs — the ASYMMETRIC complement of the
    * Jaccard gate: c(A→B) = |A∩B| / |A|, the fraction of A's shingles that
    * also appear in B. A short document quoted wholly inside a longer one
    * has c(A→B) ≈ 1 while Jaccard ≈ |A|/|B| sits under the near-dup
    * threshold — exactly the pair the ≥0.6 gate drops and a curation run
    * still wants flagged (keep the superset, drop the quote). Per pair:
    * shingle-set sizes, intersection, jaccard and both containments in
    * exact integer ppm, and a relation class (near_dup when jaccard ≥
    * 0.6; containment when either direction ≥ 0.9; else overlap — pairs
    * below 0.5 max-containment are not emitted).
    *
    * Recall caveat (inherent, documented): candidates come from the SAME
    * MinHash-LSH banding as the near-dup family, whose collision
    * probability tracks JACCARD — a tiny-doc-in-huge-doc pair at j ≈ 0.05
    * rarely shares a band. This operator scores asymmetry among
    * near-dup-SCALE candidates (j ≳ 0.3, where the 16×4 banding still
    * fires); true small-in-big containment search is a suffix/substring
    * indexing problem, a different operator family.
    *
    * Shape: rides the existing candidate machinery unchanged — the one
    * corpus-sized exchange is the 3-column band projection, pair
    * expansion stays inside MaxBucket-capped buckets, and the two
    * shingle-set joins ship only candidate doc_ids' arrays.
    */
  def ddContainment(spark: SparkSession, dir: String): DataFrame =
    containmentScores(Tables.documents(spark, dir))
      .orderBy(col("doc_a").asc, col("doc_b").asc)

  /** The generic scoring core over any documents frame (doc_id, text) —
    * spec-injected with a constructed quoted-inside pair, so the emit
    * floor and relation classifier are exercised through the SAME code
    * the registered query runs.
    */
  private[graft] def containmentScores(docs: DataFrame): DataFrame = {
    val sets = docs
      .select(col("doc_id"), strCodes(tokens(col("text"))).as("tcs"))
      .select(col("doc_id"), shingleCodes3(col("tcs")).as("sg"))
    lshPairs(signatures(docs))
      .join(sets.select(col("doc_id").as("doc_a"), col("sg").as("sg_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sg").as("sg_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(col("sg_a")).cast("long").as("size_a"),
        size(col("sg_b")).cast("long").as("size_b"),
        size(array_intersect(col("sg_a"), col("sg_b"))).cast("long")
          .as("n_inter"))
      .withColumn("jaccard_ppm",
        expr("n_inter * 1000000 DIV greatest(size_a + size_b - n_inter, 1)"))
      .withColumn("cont_a_ppm",
        expr("n_inter * 1000000 DIV greatest(size_a, 1)"))
      .withColumn("cont_b_ppm",
        expr("n_inter * 1000000 DIV greatest(size_b, 1)"))
      .filter(greatest(col("cont_a_ppm"), col("cont_b_ppm")) >= 500000L)
      .withColumn("relation",
        when(col("jaccard_ppm") >= 600000L, "near_dup")
          .when(greatest(col("cont_a_ppm"), col("cont_b_ppm")) >= 900000L,
            "containment")
          .otherwise("overlap"))
  }

  val ddContainmentSql: String =
    s"""WITH $signaturesSql, $lshPairsSql, sets AS (
       |  SELECT doc_id, scs AS sg FROM sc
       |), pairs AS (
       |  SELECT c.doc_a, c.doc_b,
       |    CAST(len(sa.sg) AS BIGINT) AS size_a,
       |    CAST(len(sb.sg) AS BIGINT) AS size_b,
       |    CAST(len(list_intersect(sa.sg, sb.sg)) AS BIGINT) AS n_inter
       |  FROM cand c
       |  JOIN sets sa ON c.doc_a = sa.doc_id
       |  JOIN sets sb ON c.doc_b = sb.doc_id
       |), scored AS (
       |  SELECT doc_a, doc_b, size_a, size_b, n_inter,
       |    CAST(n_inter * 1000000 // greatest(size_a + size_b - n_inter, 1)
       |      AS BIGINT) AS jaccard_ppm,
       |    CAST(n_inter * 1000000 // greatest(size_a, 1) AS BIGINT)
       |      AS cont_a_ppm,
       |    CAST(n_inter * 1000000 // greatest(size_b, 1) AS BIGINT)
       |      AS cont_b_ppm
       |  FROM pairs
       |)
       |SELECT doc_a, doc_b, size_a, size_b, n_inter,
       |  jaccard_ppm, cont_a_ppm, cont_b_ppm,
       |  CASE WHEN jaccard_ppm >= 600000 THEN 'near_dup'
       |       WHEN greatest(cont_a_ppm, cont_b_ppm) >= 900000
       |         THEN 'containment'
       |       ELSE 'overlap' END AS relation
       |FROM scored
       |WHERE greatest(cont_a_ppm, cont_b_ppm) >= 500000
       |ORDER BY doc_a ASC, doc_b ASC""".stripMargin

  // --- dd_rep_selection: cluster-representative policy audit --------------
  /** Which copy survives dedup — the min-id canonical ([[canonicalLabels]]'
    * label, the arbitrary-but-deterministic pick `dd_canonical` reports)
    * versus the BEST representative (most tokens, doc_id tie-break): per
    * near-dup cluster of ≥ 2 docs, both picks' ids and token counts and
    * the tokens a keep-the-longest policy would gain. The question a
    * curation run answers before committing a dedup pass — dropping the
    * long original and keeping a truncated mirror is a silent data loss
    * the min-id policy permits.
    *
    * Shape: ONE label-keyed aggregation over the (doc_id, label, nt)
    * frame computes all three facts at once, map-side combined — the
    * cluster size (count), the canonical as the cluster's MIN-ID MEMBER
    * (min(doc_id) + min_by for its tokens — NOT the label value itself:
    * the bounded 3-round propagation can leave a group whose label is a
    * doc the rounds moved to a smaller label, so "label is a member of
    * its own group" does not hold in general; the min member is a member
    * by construction and equals the label at convergence), and the best
    * pick as a lexicographic max(struct(nt, −doc_id)) (identical
    * selection to a (nt DESC, doc_id ASC) rank-1 window, without the
    * sort or the join-back). No window, no self-joins; the singleton
    * filter happens after the aggregate on the cluster-sized frame.
    */
  def ddRepSelection(spark: SparkSession, dir: String): DataFrame =
    repSelection(Tables.documents(spark, dir))

  /** The generic core over any documents frame (doc_id, text) —
    * spec-injected with constructed clusters of known best picks.
    */
  private[graft] def repSelection(docs: DataFrame): DataFrame = {
    val lab = canonicalLabels(docs)
    val meta = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("nt"))
    lab.join(meta, Seq("doc_id"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("canonical_id"),
        expr("min_by(nt, doc_id)").as("canon_tokens"),
        max(struct(col("nt"), (-col("doc_id")).as("neg"))).as("b"))
      .filter(col("n_docs") >= 2)
      .select(col("canonical_id"), col("n_docs"),
        col("canon_tokens"), (-col("b.neg")).as("best_id"),
        col("b.nt").as("best_tokens"),
        (col("b.nt") - col("canon_tokens")).as("gained_tokens"))
      .orderBy(col("canonical_id").asc)
  }

  // lazy: canonicalCtes is declared later in this object; a strict val
  // here would interpolate null at object-init time. The oracles map (the
  // last val) forces it after every CTE builder exists.
  lazy val ddRepSelectionSql: String =
    s"""WITH $canonicalCtes, meta AS (
       |  SELECT doc_id, CAST(len(${Codes.tokensSql("text")}) AS BIGINT) AS nt
       |  FROM documents
       |), j AS (
       |  SELECT l.doc_id, l.label, m.nt FROM lab3 l
       |  JOIN meta m ON l.doc_id = m.doc_id
       |), grp AS (
       |  SELECT label, COUNT(*) AS n_docs,
       |    CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
       |    CAST(min_by(nt, doc_id) AS BIGINT) AS canon_tokens
       |  FROM j GROUP BY label HAVING COUNT(*) >= 2
       |), best AS (
       |  SELECT label, doc_id AS best_id, nt AS best_tokens FROM (
       |    SELECT label, doc_id, nt, ROW_NUMBER() OVER (PARTITION BY label
       |      ORDER BY nt DESC, doc_id ASC) AS rk FROM j
       |  ) t WHERE rk = 1
       |)
       |SELECT g.canonical_id, g.n_docs, g.canon_tokens,
       |  b.best_id, b.best_tokens,
       |  b.best_tokens - g.canon_tokens AS gained_tokens
       |FROM grp g
       |JOIN best b ON g.label = b.label
       |ORDER BY canonical_id ASC""".stripMargin

  // --- dd_source_dup_matrix: cross-source duplication matrix --------------
  /** WHICH sources duplicate WHICH — the mixture-curation question behind
    * per-source deweighting (a source that mostly mirrors another should
    * lose epochs, not the original): the Jaccard-verified near-dup pairs
    * rolled up to an unordered SOURCE×SOURCE matrix (direction normalized
    * by source name so each unordered pair is one row), with the
    * within-source flag and each cell's share of all verified pairs in
    * integer ppm. Shape: the verify pipeline runs once; the rollup and
    * the share window run over the ≤|sources|² matrix frame —
    * metadata-sized at any corpus scale.
    */
  def ddSourceDupMatrix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val src = docs.select(col("doc_id"), col("source"))
    val cells = verifiedPairs(docs).select("doc_a", "doc_b")
      .join(src.select(col("doc_id").as("doc_a"),
        col("source").as("source_a")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"),
        col("source").as("source_b")), "doc_b")
      .select(least(col("source_a"), col("source_b")).as("source_x"),
        greatest(col("source_a"), col("source_b")).as("source_y"))
      .groupBy(col("source_x"), col("source_y"))
      .agg(count(lit(1)).as("n_pairs"))
    cells
      .withColumn("total",
        sum(col("n_pairs")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("within_source", col("source_x") === col("source_y"))
      .withColumn("pair_share_ppm", expr("n_pairs * 1000000 DIV total"))
      .select("source_x", "source_y", "within_source", "n_pairs",
        "pair_share_ppm")
      .orderBy(col("source_x").asc, col("source_y").asc)
  }

  val ddSourceDupMatrixSql: String =
    s"""WITH $scoredSqlCtes, vp AS (
       |  SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.6
       |), cells AS (
       |  SELECT least(da.source, db.source) AS source_x,
       |    greatest(da.source, db.source) AS source_y,
       |    COUNT(*) AS n_pairs
       |  FROM vp
       |  JOIN documents da ON vp.doc_a = da.doc_id
       |  JOIN documents db ON vp.doc_b = db.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT source_x, source_y, source_x = source_y AS within_source,
       |  n_pairs,
       |  CAST(n_pairs * 1000000 // SUM(n_pairs) OVER () AS BIGINT)
       |    AS pair_share_ppm
       |FROM cells ORDER BY source_x ASC, source_y ASC""".stripMargin

  // --- dd_canonical: cluster canonicalization over verified edges ---------
  /** Canonical doc per near-dup cluster: min-label propagation over the
    * verified-pair graph for a FIXED 3 rounds (both engines run the same
    * horizon, so results agree even on chains that haven't converged; a
    * production run iterates to fixpoint with checkpoints between rounds).
    * The per-round edge subplan is byte-identical, so Spark's
    * ReuseExchange materializes the edge shuffle once across rounds.
    */
  /** The label-propagation stage: (doc_id, label) after 3 rounds.
    *
    * Propagation runs ONLY over edge-endpoint docs: a doc with no verified
    * edge never receives a neighbor minimum, so its label provably stays
    * `doc_id` through every round. At 100 TB the near-dup graph touches a
    * small fraction of the corpus, so the 3 rounds operate on a frame
    * orders of magnitude smaller than the corpus (AQE turns the round
    * joins into broadcasts), and the full corpus is joined exactly once at
    * the end to attach identity labels.
    */
  /** The symmetrized verified-edge frame of [[canonicalLabels]] BEFORE its
    * localCheckpoint (the PLANS_r{n} pre-checkpoint probe,
    * `dd_canonical__pre_ckpt`): the whole MinHash/LSH/Jaccard verify
    * pipeline lives in this prefix, invisible to the registered query's
    * physical plan once the checkpoint truncates it.
    */
  private[graft] def canonicalEdgesRaw(docs: DataFrame): DataFrame =
    verifiedPairs(docs).select("doc_a", "doc_b")
      // Symmetrize via explode, not union — a union of (a,b) and (b,a)
      // selects would run the whole verify pipeline twice.
      .select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

  private[graft] def canonicalLabels(docs: DataFrame): DataFrame = {
    // The edge set is localCheckpoint'ed: it appears in all 3 propagation
    // rounds, and exchange reuse alone doesn't stop the MinHash/Jaccard
    // verify pipeline from re-executing per round (measured 4.6s → edge
    // materialization cuts the rounds to pure id-join work).
    val edges = canonicalEdgesRaw(docs).localCheckpoint()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("label"))
    for (_ <- 1 to 3) {
      val nbr = edges
        .join(labels.select(col("doc_id").as("dst"), col("label")), "dst")
        .groupBy(col("src")).agg(min(col("label")).as("nbr_min"))
      labels = labels
        .join(nbr.select(col("src").as("doc_id"), col("nbr_min")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
    }
    docs.select(col("doc_id"))
      .join(labels.withColumnRenamed("label", "lp"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lp"), col("doc_id")).as("label"))
  }

  def ddCanonical(spark: SparkSession, dir: String): DataFrame =
    canonicalLabels(Tables.documents(spark, dir))
      .select(col("doc_id"), col("label").as("canonical_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("canonical_id"))))
      .orderBy(col("doc_id").asc)

  /** CTE chain ending in lab3(doc_id, label) — shared with the curation
    * pipeline oracle.
    */
  private[graft] val canonicalCtes: String = {
    val rounds = (1 to 3).map { i =>
      s"""nm$i AS (
         |  SELECT e.src, MIN(l.label) AS nbr_min
         |  FROM edges e JOIN lab${i - 1} l ON e.dst = l.doc_id
         |  GROUP BY e.src
         |), lab$i AS (
         |  SELECT l.doc_id,
         |    least(l.label, coalesce(n.nbr_min, l.label)) AS label
         |  FROM lab${i - 1} l LEFT JOIN nm$i n ON l.doc_id = n.src
         |)""".stripMargin
    }.mkString(", ")
    s"""$scoredSqlCtes, verified AS (
       |  SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.6
       |), edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM verified
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM verified
       |), lab0 AS (
       |  SELECT doc_id, doc_id AS label FROM documents
       |), $rounds""".stripMargin
  }

  val ddCanonicalSql: String =
    s"""WITH $canonicalCtes
       |SELECT doc_id, label AS canonical_id,
       |  CAST(COUNT(*) OVER (PARTITION BY label) AS BIGINT) AS cluster_size
       |FROM lab3 ORDER BY doc_id ASC""".stripMargin

  // --- dd_cluster_sizes: near-dup cluster-size distribution ---------------
  /** How duplicated is the corpus? Distribution of near-dup cluster sizes
    * (clusters from [[canonicalLabels]], size 1 = unique doc): per size,
    * the cluster count and total docs bound up in clusters of that size —
    * the report that decides whether near-dedup is worth its cost on a
    * corpus and catches pathological super-clusters before canonicalize-
    * and-drop runs. Two tiny aggregates over the label frame; the heavy
    * lifting (LSH → verify → propagation) is the shared canonical subplan.
    */
  def ddClusterSizes(spark: SparkSession, dir: String): DataFrame =
    canonicalLabels(Tables.documents(spark, dir))
      .groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("n_docs"))
      .orderBy(col("cluster_size").asc)

  val ddClusterSizesSql: String =
    s"""WITH $canonicalCtes, cl AS (
       |  SELECT label, COUNT(*) AS cluster_size FROM lab3 GROUP BY label
       |)
       |SELECT cluster_size, COUNT(*) AS n_clusters,
       |  CAST(SUM(cluster_size) AS BIGINT) AS n_docs
       |FROM cl GROUP BY cluster_size ORDER BY cluster_size ASC""".stripMargin

  // --- dd_components: fixpoint connected components over verified edges ---
  /** Connected components of the verified near-dup graph to FIXPOINT
    * (SURVEY §6's open item; [[ddCanonical]] runs a fixed 3-round horizon).
    * Min-label propagation iterates until no label changes; every round
    * `localCheckpoint`s the label frame, truncating the lineage so round N
    * replans against a materialized N-1 (the Pregel discipline — without
    * it the plan doubles per round and the driver OOMs on analysis long
    * before the executors move data). The edge set is checkpointed once —
    * the whole MinHash/LSH/Jaccard verify pipeline runs exactly once, not
    * once per round. Convergence needs ≤ graph-diameter rounds; the
    * emptiness probe per round is a count on an id-keyed join, and labels
    * only ever decrease, so the loop terminates deterministically with the
    * exact per-component minimum — which is what the oracle's recursive
    * transitive closure computes.
    */
  private[graft] def componentLabels(docs: DataFrame): DataFrame = {
    // Same pre-checkpoint edge frame as canonicalLabels — probed once
    // under dd_canonical__pre_ckpt (identical subtree).
    val edges = canonicalEdgesRaw(docs).localCheckpoint()
    // Fixpoint iteration over edge-endpoint docs only (isolated docs can
    // never change label — see canonicalLabels); the convergence probe and
    // every round's joins run on the small endpoint frame.
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("label"))
      .localCheckpoint()
    var converged = false
    var rounds = 0
    while (!converged && rounds < 50) {
      val nbr = edges
        .join(labels.select(col("doc_id").as("dst"), col("label")), "dst")
        .groupBy(col("src")).agg(min(col("label")).as("nbr_min"))
      val next = labels
        .join(nbr.select(col("src").as("doc_id"), col("nbr_min")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        .localCheckpoint()
      converged = next
        .join(labels.withColumnRenamed("label", "prev"), "doc_id")
        .filter(col("label") =!= col("prev"))
        .isEmpty
      labels = next
      rounds += 1
    }
    docs.select(col("doc_id"))
      .join(labels.withColumnRenamed("label", "lp"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lp"), col("doc_id")).as("label"))
  }

  def ddComponents(spark: SparkSession, dir: String): DataFrame =
    componentLabels(Tables.documents(spark, dir))
      .select(col("doc_id"), col("label").as("component_id"))
      .withColumn("component_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("component_id"))))
      .orderBy(col("doc_id").asc)

  /** Oracle: exact components via recursive transitive closure — the
    * fixpoint the Spark loop converges to, stated declaratively.
    */
  val ddComponentsSql: String =
    s"""WITH RECURSIVE $scoredSqlCtes, verified AS (
       |  SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.6
       |), edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM verified
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM verified
       |), reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
       |), comp AS (
       |  SELECT d.doc_id,
       |    least(d.doc_id, coalesce(MIN(r.dst), d.doc_id)) AS component_id
       |  FROM documents d LEFT JOIN reach r ON d.doc_id = r.src
       |  GROUP BY d.doc_id
       |)
       |SELECT doc_id, component_id,
       |  CAST(COUNT(*) OVER (PARTITION BY component_id) AS BIGINT) AS component_size
       |FROM comp ORDER BY doc_id ASC""".stripMargin

  // --- dd_minhash_est: signature-agreement Jaccard estimate ----------------
  /** Estimated Jaccard for every LSH candidate pair straight from the
    * MinHash signatures: the fraction of the 64 components that agree is
    * an unbiased Jaccard estimator, so candidates can be thresholded
    * WITHOUT touching the shingle sets again — at 100 TB the verify step
    * reads 64 longs per doc instead of re-shuffling full shingle arrays
    * (cf. [[ddNgramJaccard]], which computes the exact value). The
    * signature frame is checkpointed once and feeds both the LSH bucketing
    * and the per-pair lookup; agreement counts are integers, so the
    * estimate is bit-identical across engines.
    */
  def ddMinhashEst(spark: SparkSession, dir: String): DataFrame = {
    // The signature subplan feeds both the LSH bucketing and the per-pair
    // lookup; its exchange is byte-identical in both branches, so
    // ReuseExchange materializes the MinHash scan+partial-agg once (no
    // blocking checkpoint needed — measured faster without one).
    val sigs = signatures(Tables.documents(spark, dir))
    val sigArr = sigs.select(col("doc_id"),
      array((0 until NumHashes).map(i => col(s"mh$i")): _*).as("sig"))
    lshPairs(sigs)
      .join(sigArr.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")),
        "doc_a")
      .join(sigArr.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")),
        "doc_b")
      .withColumn("n_eq", org.apache.spark.sql.GraftBridge.column(
        graft.functions.EqCountExpr(
          org.apache.spark.sql.GraftBridge.expression(col("sig_a")),
          org.apache.spark.sql.GraftBridge.expression(col("sig_b")))))
      .withColumn("est_jaccard",
        round(col("n_eq").cast("double") / NumHashes, 6))
      .select("doc_a", "doc_b", "n_eq", "est_jaccard")
      .orderBy(col("doc_a").asc, col("doc_b").asc)
  }

  val ddMinhashEstSql: String = {
    val agree = (0 until NumHashes)
      .map(i => s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH $signaturesSql, $lshPairsSql
       |SELECT doc_a, doc_b, n_eq,
       |  round(CAST(n_eq AS DOUBLE) / $NumHashes, 6) AS est_jaccard
       |FROM (
       |  SELECT c.doc_a, c.doc_b, CAST($agree AS BIGINT) AS n_eq
       |  FROM cand c
       |  JOIN sigs a ON c.doc_a = a.doc_id
       |  JOIN sigs b ON c.doc_b = b.doc_id
       |) t ORDER BY doc_a ASC, doc_b ASC""".stripMargin
  }

  // --- dd_lsh_audit: candidate-stage precision / estimate-error report ----
  /** One-row audit of the banded-LSH candidate stage — the go/no-go gauge
    * for the dedup recipe's blocking parameters: candidate count, how many
    * survive the verify stage's predicate (round(jaccard, 6) ≥ 0.6 — the
    * SAME rounded-double test [[verifiedPairs]] filters on, so n_verified
    * equals the verify-stage pair count BY CONSTRUCTION even at the
    * round-to-6 boundary reachable once n_union exceeds ~2M shingles), and
    * how far the 64-hash signature estimate strays from exact Jaccard
    * (mean/max absolute error in ppm — integer arithmetic end-to-end).
    * Candidates too LOW precision → widen bands; estimate error
    * too HIGH → more hashes. Shape: the candidate frame joins shingle sets
    * and signatures by doc key (both exchanges reused from the dd_* family
    * subplans), then ONE aggregate — the report never materializes
    * anything pair-quadratic beyond the bucket-capped candidates.
    */
  def ddLshAudit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sigs = signatures(docs)
    val sigArr = sigs.select(col("doc_id"),
      array((0 until NumHashes).map(i => col(s"mh$i")): _*).as("sig"))
    val sets = docs
      .select(col("doc_id"), strCodes(tokens(col("text"))).as("tcs"))
      .select(col("doc_id"), shingleCodes3(col("tcs")).as("sg"))
    val err = abs(col("est_ppm") - col("exact_ppm"))
    lshPairs(sigs)
      .join(sets.select(col("doc_id").as("doc_a"), col("sg").as("sg_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sg").as("sg_b")), "doc_b")
      .join(sigArr.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigArr.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("n_inter",
        size(array_intersect(col("sg_a"), col("sg_b"))).cast("bigint"))
      .withColumn("n_union",
        size(col("sg_a")) + size(col("sg_b")) - col("n_inter"))
      .withColumn("n_eq", org.apache.spark.sql.GraftBridge.column(
        graft.functions.EqCountExpr(
          org.apache.spark.sql.GraftBridge.expression(col("sig_a")),
          org.apache.spark.sql.GraftBridge.expression(col("sig_b")))))
      .withColumn("exact_ppm", expr("n_inter * 1000000 DIV n_union"))
      .withColumn("est_ppm", expr(s"n_eq * 1000000 DIV $NumHashes"))
      .withColumn("jaccard",
        round(col("n_inter").cast("double") / col("n_union"), 6))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("jaccard") >= 0.6, 1L).otherwise(0L))
          .as("n_verified"),
        sum(err).as("sum_err"),
        max(err).as("max_abs_err_ppm"))
      .withColumn("precision_ppm", expr("n_verified * 1000000 DIV n_candidates"))
      .withColumn("mean_abs_err_ppm", expr("sum_err DIV n_candidates"))
      .select("n_candidates", "n_verified", "precision_ppm",
        "mean_abs_err_ppm", "max_abs_err_ppm")
  }

  val ddLshAuditSql: String = {
    val agree = (0 until NumHashes)
      .map(i => s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH $signaturesSql, $lshPairsSql, sets AS (
       |  SELECT doc_id, scs AS sg FROM sc
       |), p AS (
       |  SELECT
       |    CAST(len(list_intersect(sa.sg, sb.sg)) AS BIGINT) AS n_inter,
       |    CAST(len(sa.sg) + len(sb.sg)
       |      - len(list_intersect(sa.sg, sb.sg)) AS BIGINT) AS n_union,
       |    CAST($agree AS BIGINT) AS n_eq
       |  FROM cand c
       |  JOIN sets sa ON c.doc_a = sa.doc_id
       |  JOIN sets sb ON c.doc_b = sb.doc_id
       |  JOIN sigs a ON c.doc_a = a.doc_id
       |  JOIN sigs b ON c.doc_b = b.doc_id
       |), e AS (
       |  SELECT n_inter * 1000000 // n_union AS exact_ppm,
       |    n_eq * 1000000 // $NumHashes AS est_ppm,
       |    round(CAST(n_inter AS DOUBLE) / n_union, 6) AS jaccard
       |  FROM p
       |)
       |SELECT COUNT(*) AS n_candidates,
       |  CAST(SUM(CASE WHEN jaccard >= 0.6 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_verified,
       |  CAST(SUM(CASE WHEN jaccard >= 0.6 THEN 1 ELSE 0 END)
       |    * 1000000 // COUNT(*) AS BIGINT) AS precision_ppm,
       |  CAST(SUM(ABS(est_ppm - exact_ppm)) // COUNT(*) AS BIGINT)
       |    AS mean_abs_err_ppm,
       |  CAST(MAX(ABS(est_ppm - exact_ppm)) AS BIGINT) AS max_abs_err_ppm
       |FROM e""".stripMargin
  }

  // --- dd_shingle_hist: duplicate-shingle-level histogram ------------------
  /** Corpus duplication profile at the shingle level: how many distinct
    * word-3gram shingles occur in exactly k documents, with each level's
    * share of the distinct-shingle vocabulary in integer ppm — the
    * dataset-card duplication curve (a long high-df tail ⇒ boilerplate /
    * templated text; df=1 mass ⇒ unique content). Shape: per-doc distinct
    * shingle codes (two-stage projection, see [[signatures]]; the arrays
    * are array_distinct per doc, so the exploded (doc, code) stream needs
    * NO dedup exchange) → one aggregate to document frequency per code
    * (map-side partial counts; the shuffle carries 8-byte codes, never
    * text) → histogram + share over the ≤|distinct df| row frame.
    * Complements [[graft.operators.TextOps]]'s tx_crossdup scalar with the
    * full distribution.
    */
  def ddShingleHist(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), strCodes(tokens(col("text"))).as("tcs"))
      .select(col("doc_id"), explode(shingleCodes3(col("tcs"))).as("x"))
    val dfreq = sh.groupBy(col("x")).agg(count(lit(1)).as("df"))
    dfreq.groupBy(col("df")).agg(count(lit(1)).as("n_shingles"))
      .withColumn("share_ppm", expr(
        "n_shingles * 1000000 DIV sum(n_shingles) OVER ()"))
      .select("df", "n_shingles", "share_ppm")
      .orderBy(col("df").asc)
  }

  val ddShingleHistSql: String =
    s"""WITH $signaturesSql, sh AS (
       |  SELECT doc_id, unnest(scs) AS x FROM sc
       |), dfreq AS (
       |  SELECT x, COUNT(*) AS df FROM sh GROUP BY x
       |), hist AS (
       |  SELECT df, COUNT(*) AS n_shingles FROM dfreq GROUP BY df
       |)
       |SELECT df, n_shingles,
       |  CAST(n_shingles * 1000000 // SUM(n_shingles) OVER () AS BIGINT)
       |    AS share_ppm
       |FROM hist ORDER BY df ASC""".stripMargin

  // --- dd_semantic_clusters: components over embedding near-dup pairs -----
  /** SEMANTIC dedup clustering — the embedding-space counterpart of
    * [[ddCanonical]] (SemDeDup-style): min-label propagation (fixed
    * 3-round horizon, both engines) over the cosine-verified near-dup
    * pairs from [[ddEmbedCosine]], labeling each vector with its
    * cluster's minimum vec_id plus the cluster size. Same scale shape as
    * the text-side canonicalization: the edge set is localCheckpoint'ed
    * once (the hyperplane-banding + cosine-verify pipeline runs exactly
    * once, not per round), propagation touches only edge-endpoint
    * vectors, and the full corpus joins once at the end for identity
    * labels — the rounds scale with the semantic-dup graph, not the
    * embedding count.
    */
  /** Pre-checkpoint edge frame of [[ddSemanticClusters]] (PLANS probe
    * `dd_semantic_clusters__pre_ckpt`) — carries the hyperplane-banding +
    * cosine-verify pipeline the checkpoint truncates away.
    */
  private[graft] def semanticEdgesRaw(spark: SparkSession,
      dir: String): DataFrame =
    ddEmbedCosine(spark, dir).select("vec_a", "vec_b")
      .select(explode(array(
        struct(col("vec_a").as("src"), col("vec_b").as("dst")),
        struct(col("vec_b").as("src"), col("vec_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

  def ddSemanticClusters(spark: SparkSession, dir: String): DataFrame = {
    val edges = semanticEdgesRaw(spark, dir).localCheckpoint()
    var labels = edges.select(col("src").as("vec_id")).distinct()
      .select(col("vec_id"), col("vec_id").as("label"))
    for (_ <- 1 to 3) {
      val nbr = edges
        .join(labels.select(col("vec_id").as("dst"), col("label")), "dst")
        .groupBy(col("src")).agg(min(col("label")).as("nbr_min"))
      labels = labels
        .join(nbr.select(col("src").as("vec_id"), col("nbr_min")),
          Seq("vec_id"), "left")
        .select(col("vec_id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
    }
    Tables.embeddings(spark, dir).select(col("vec_id"))
      .join(labels.withColumnRenamed("label", "lp"), Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("lp"), col("vec_id")).as("cluster_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("cluster_id"))))
      .orderBy(col("vec_id").asc)
  }

  // lazy: ddEmbedCosineSql is declared later in the file (object vals
  // initialize in declaration order — eager interpolation would read null).
  lazy val ddSemanticClustersSql: String = {
    val rounds = (1 to 3).map { i =>
      s"""vn$i AS (
         |  SELECT e.src, MIN(l.label) AS nbr_min
         |  FROM vedges e JOIN vlab${i - 1} l ON e.dst = l.vec_id
         |  GROUP BY e.src
         |), vlab$i AS (
         |  SELECT l.vec_id,
         |    least(l.label, coalesce(n.nbr_min, l.label)) AS label
         |  FROM vlab${i - 1} l LEFT JOIN vn$i n ON l.vec_id = n.src
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH vpairs AS (
       |  SELECT vec_a, vec_b FROM ($ddEmbedCosineSql) p
       |), vedges AS (
       |  SELECT vec_a AS src, vec_b AS dst FROM vpairs
       |  UNION ALL
       |  SELECT vec_b AS src, vec_a AS dst FROM vpairs
       |), vlab0 AS (
       |  SELECT vec_id, vec_id AS label FROM embeddings
       |), $rounds
       |SELECT vec_id, label AS cluster_id,
       |  CAST(COUNT(*) OVER (PARTITION BY label) AS BIGINT) AS cluster_size
       |FROM vlab3 ORDER BY vec_id ASC""".stripMargin
  }

  // --- dd_threshold_sweep: pair yield per Jaccard threshold ----------------
  private val SweepThresholds = Seq(50, 60, 70, 80, 90)

  /** Threshold-tuning sweep for the near-dup verify stage: how many
    * candidate pairs survive exact Jaccard ≥ t for t ∈ {0.5 … 0.9}, with
    * each level's share of the candidate set in integer ppm — the report a
    * curation run reads before committing to a dedup threshold (too low ⇒
    * distinct documents merged, too high ⇒ near-dups kept). ONE aggregate
    * of conditional sums over the scored candidate frame (the ≥ t tests
    * are the division-free 2·n_inter ≥ n_union form), exploded to 5 rows;
    * nothing beyond the bucket-capped candidates is ever materialized.
    */
  def ddThresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sets = docs
      .select(col("doc_id"), strCodes(tokens(col("text"))).as("tcs"))
      .select(col("doc_id"), shingleCodes3(col("tcs")).as("sg"))
    val scored = lshPairs(signatures(docs))
      .join(sets.select(col("doc_id").as("doc_a"), col("sg").as("sg_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sg").as("sg_b")), "doc_b")
      .withColumn("n_inter",
        size(array_intersect(col("sg_a"), col("sg_b"))).cast("bigint"))
      .withColumn("n_union",
        size(col("sg_a")) + size(col("sg_b")) - col("n_inter"))
    val aggCols = count(lit(1)).as("n_candidates") +:
      SweepThresholds.map(t =>
        sum(when(col("n_inter") * 100 >= col("n_union") * t, 1L)
          .otherwise(0L)).as(s"ge$t"))
    val agg = scored.agg(aggCols.head, aggCols.tail: _*)
    agg.select(explode(array(SweepThresholds.map(t =>
        struct(lit(t.toLong).as("threshold_pct"), col(s"ge$t").as("n_pairs"),
          col("n_candidates"))): _*)).as("s"))
      .select(col("s.threshold_pct").as("threshold_pct"),
        col("s.n_pairs").as("n_pairs"),
        expr("s.n_pairs * 1000000 DIV s.n_candidates").as("pairs_ppm"))
      .orderBy(col("threshold_pct").asc)
  }

  val ddThresholdSweepSql: String = {
    val conds = SweepThresholds
      .map(t => s"CAST(SUM(CASE WHEN n_inter * 100 >= n_union * $t " +
        s"THEN 1 ELSE 0 END) AS BIGINT) AS ge$t")
      .mkString(",\n       |    ")
    val rows = SweepThresholds
      .map(t => s"SELECT $t AS threshold_pct, ge$t AS n_pairs, " +
        s"n_candidates FROM agg")
      .mkString("\n       |  UNION ALL\n       |  ")
    s"""WITH $signaturesSql, $lshPairsSql, sets AS (
       |  SELECT doc_id, scs AS sg FROM sc
       |), p AS (
       |  SELECT
       |    CAST(len(list_intersect(sa.sg, sb.sg)) AS BIGINT) AS n_inter,
       |    CAST(len(sa.sg) + len(sb.sg)
       |      - len(list_intersect(sa.sg, sb.sg)) AS BIGINT) AS n_union
       |  FROM cand c
       |  JOIN sets sa ON c.doc_a = sa.doc_id
       |  JOIN sets sb ON c.doc_b = sb.doc_id
       |), agg AS (
       |  SELECT COUNT(*) AS n_candidates,
       |    $conds
       |  FROM p
       |), rows AS (
       |  $rows
       |)
       |SELECT CAST(threshold_pct AS BIGINT) AS threshold_pct, n_pairs,
       |  CAST(n_pairs * 1000000 // n_candidates AS BIGINT) AS pairs_ppm
       |FROM rows ORDER BY threshold_pct ASC""".stripMargin
  }

  // --- dd_modality_agreement: lexical vs semantic near-dup overlap ---------
  /** Do the TEXT near-dups and the EMBEDDING near-dups agree? One-row
    * audit joining the Jaccard-verified pair set (dd_ngram_jaccard
    * semantics) against the cosine-verified pair set (dd_embed_cosine,
    * vec_id ≡ doc_id in the driver data): pairs found by both, by text
    * only, by embedding only, and the pair-set Jaccard agreement in ppm.
    * Low agreement flags a miscalibrated threshold on one side (or
    * embeddings that don't track surface text — paraphrase-heavy
    * corpora); the per-modality audits are dd_lsh_audit and
    * sim_recall_report. Shape: FULL OUTER equi-join of two near-dup-graph-
    * sized pair frames (both bucket-capped) + one aggregate.
    */
  def ddModalityAgreement(spark: SparkSession, dir: String): DataFrame = {
    val tp = verifiedPairs(Tables.documents(spark, dir))
      .select(col("doc_a"), col("doc_b"), lit(1L).as("t"))
    val ep = ddEmbedCosine(spark, dir)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"),
        lit(1L).as("e"))
    tp.join(ep, Seq("doc_a", "doc_b"), "full_outer")
      .agg(sum(coalesce(col("t"), lit(0L))).as("n_text_pairs"),
        sum(coalesce(col("e"), lit(0L))).as("n_embed_pairs"),
        sum(when(col("t") === 1L && col("e") === 1L, 1L).otherwise(0L))
          .as("n_both"))
      .withColumn("text_only", col("n_text_pairs") - col("n_both"))
      .withColumn("embed_only", col("n_embed_pairs") - col("n_both"))
      .withColumn("agreement_ppm", expr(
        "n_both * 1000000 DIV greatest(n_text_pairs + n_embed_pairs - n_both, 1L)"))
      .select("n_text_pairs", "n_embed_pairs", "n_both", "text_only",
        "embed_only", "agreement_ppm")
  }

  lazy val ddModalityAgreementSql: String =
    s"""WITH $scoredSqlCtes, verified AS (
       |  SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.6
       |), ep AS (
       |  SELECT vec_a AS doc_a, vec_b AS doc_b FROM ($ddEmbedCosineSql) e
       |), j AS (
       |  SELECT CASE WHEN v.doc_a IS NOT NULL THEN 1 ELSE 0 END AS t,
       |    CASE WHEN p.doc_a IS NOT NULL THEN 1 ELSE 0 END AS e
       |  FROM verified v FULL OUTER JOIN ep p
       |    ON v.doc_a = p.doc_a AND v.doc_b = p.doc_b
       |)
       |SELECT CAST(SUM(t) AS BIGINT) AS n_text_pairs,
       |  CAST(SUM(e) AS BIGINT) AS n_embed_pairs,
       |  CAST(SUM(t * e) AS BIGINT) AS n_both,
       |  CAST(SUM(t) - SUM(t * e) AS BIGINT) AS text_only,
       |  CAST(SUM(e) - SUM(t * e) AS BIGINT) AS embed_only,
       |  CAST(SUM(t * e) * 1000000
       |    // greatest(SUM(t) + SUM(e) - SUM(t * e), 1) AS BIGINT)
       |    AS agreement_ppm
       |FROM j""".stripMargin

  // --- dd_simhash: 16-bit simhash + bucket sizes ---------------------------
  /** Array-native: per-doc distinct token-hash array, 16 sign sums as
    * array aggregates — map-only until the bucket-size window (the one
    * shuffle, on the 16-bit simhash key). The r2 version exploded tokens
    * through a distinct + 16-column aggregate (two shuffles).
    */
  def ddSimhash(spark: SparkSession, dir: String): DataFrame = {
    val hs = array_distinct(transform(
      strCodes(tokens(col("text"))), x => Codes.hash(0, x)))
    val withHs = Tables.documents(spark, dir)
      .select(col("doc_id"), hs.as("hs"))
    // All 16 bit balances in one compiled traversal (SimHash16Expr) — the
    // declarative form ran 16 interpreted aggregate(transform(...))
    // passes over the same array. The SQL twin below stays the per-bit
    // semantic definition both engines share.
    withHs.select(col("doc_id"), Codes.simHash16(col("hs")).as("simhash"))
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

  // --- dd_embed_cosine: LSH-blocked exact cosine near-dup pairs -----------
  /** Embeddings quantized to round(x*1000) ints so dot products are exact
    * integer sums — order-independent, hence engine-independent (SURVEY §4).
    */
  private[graft] def quantized(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).select(
      col("vec_id"), col("label"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1000).cast("long")).as("q"))
      .withColumn("n2", org.apache.spark.sql.GraftBridge.column(
        graft.functions.DotLongExpr(
          org.apache.spark.sql.GraftBridge.expression(col("q")),
          org.apache.spark.sql.GraftBridge.expression(col("q")))))

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

  /** Exact-integer cosine via the compiled dot kernel (the zip_with +
    * aggregate form evaluates interpreted per candidate pair — the hot
    * path of every similarity verify).
    */
  private[graft] def cosine(qa: Column, qb: Column, na: Column, nb: Column): Column = {
    val dot = org.apache.spark.sql.GraftBridge.column(
      graft.functions.DotLongExpr(
        org.apache.spark.sql.GraftBridge.expression(qa),
        org.apache.spark.sql.GraftBridge.expression(qb)))
    dot.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))
  }

  private[graft] def cosineSql(qa: String, qb: String, na: String, nb: String): String =
    s"CAST(list_sum(list_transform(range(1, len($qa) + 1), i -> $qa[i] * $qb[i])) AS DOUBLE)" +
      s" / (sqrt(CAST($na AS DOUBLE)) * sqrt(CAST($nb AS DOUBLE)))"

  /** Near-dup pairs at cos ≥ 0.4, blocked by 2 bands of 8 random-hyperplane
    * sign bits (planes shared with [[Similarity]]): candidates must agree
    * on all 8 signs of at least one band; exact cosine runs only on those.
    * Shape: 2 bucket aggregations + an id-keyed join back for vectors —
    * no CartesianProduct / BroadcastNestedLoopJoin at any size.
    */
  /** The scored candidate stage shared by [[ddEmbedCosine]] and
    * [[ddCosineSweep]]: every bucket-capped LSH candidate pair with its
    * exact cosine, UNFILTERED.
    */
  private def embedScoredPairs(spark: SparkSession, dir: String): DataFrame = {
    val nm = quantized(spark, dir)
    // One explode over the two (band, bucket) structs — the 16 hyperplane
    // dot products run once per vector, not once per band-union branch.
    val banded = nm
      .select(col("vec_id"), explode(array(
        struct(lit(0).as("band"),
          Similarity.bandBucket(col("q"), 0 until 8).as("bkt")),
        struct(lit(1).as("band"),
          Similarity.bandBucket(col("q"), 8 until 16).as("bkt")))).as("bs"))
      .select(col("bs.band").as("band"), col("bs.bkt").as("bkt"), col("vec_id"))
    val cand = banded.groupBy(col("band"), col("bkt"))
      .agg(sort_array(collect_list(col("vec_id"))).as("ids"))
      .filter(size(col("ids")).between(2, EmbedMaxBucket))
      .select(explode(Codes.pairs(col("ids"))).as("pr"))
      .select(col("pr.doc_a").as("vec_a"), col("pr.doc_b").as("vec_b"))
      .distinct()
    cand
      .join(nm.select(col("vec_id").as("vec_a"), col("q").as("qa"), col("n2").as("na")), "vec_a")
      .join(nm.select(col("vec_id").as("vec_b"), col("q").as("qb"), col("n2").as("nb")), "vec_b")
      .withColumn("cos_sim",
        round(cosine(col("qa"), col("qb"), col("na"), col("nb")), 6))
  }

  /** CTE chain ending in escored(vec_a, vec_b, cos_sim) — the SQL twin of
    * [[embedScoredPairs]].
    */
  private val embedScoredSqlCtes: String = {
    val band0 = Similarity.bandBucketSql("q", 0 until 8)
    val band1 = Similarity.bandBucketSql("q", 8 until 16)
    // CTE names are e-prefixed: dd_modality_agreement splices this chain
    // NEXT TO the text-side lshPairsSql (bands/bcnt/cand) in one WITH
    // list, and duplicate aliases — legal when DuckDB inlines — become a
    // binder error once the oracles are CTE-materialized.
    s"""$quantizedSql, ebanded AS (
       |  SELECT 0 AS band, $band0 AS bkt, vec_id FROM nm
       |  UNION ALL
       |  SELECT 1 AS band, $band1 AS bkt, vec_id FROM nm
       |), ebcnt AS (
       |  SELECT band, bkt, vec_id,
       |    COUNT(*) OVER (PARTITION BY band, bkt) AS n FROM ebanded
       |), ecand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM ebcnt a JOIN ebcnt b
       |    ON a.band = b.band AND a.bkt = b.bkt AND a.vec_id < b.vec_id
       |    AND a.n <= $EmbedMaxBucket AND b.n <= $EmbedMaxBucket
       |), escored AS (
       |  SELECT c.vec_a, c.vec_b,
       |    round(${cosineSql("a.q", "b.q", "a.n2", "b.n2")}, 6) AS cos_sim
       |  FROM ecand c
       |  JOIN nm a ON c.vec_a = a.vec_id
       |  JOIN nm b ON c.vec_b = b.vec_id
       |)""".stripMargin
  }

  def ddEmbedCosine(spark: SparkSession, dir: String): DataFrame =
    embedScoredPairs(spark, dir)
      .filter(col("cos_sim") >= 0.4)
      .select("vec_a", "vec_b", "cos_sim")
      .orderBy(col("vec_a").asc, col("vec_b").asc)

  val ddEmbedCosineSql: String =
    s"""WITH $embedScoredSqlCtes
       |SELECT vec_a, vec_b, cos_sim FROM escored
       |WHERE cos_sim >= 0.4
       |ORDER BY vec_a ASC, vec_b ASC""".stripMargin

  // --- dd_cosine_sweep: pair yield per cosine threshold --------------------
  private val CosineSweep = Seq(30, 40, 50, 60, 70)

  /** The embedding-side twin of [[ddThresholdSweep]]: candidate pairs
    * surviving exact cosine ≥ t for t ∈ {0.30 … 0.70}, with each level's
    * candidate share in integer ppm — the threshold-tuning table for the
    * semantic near-dup verify. ONE conditional-sum aggregate over the
    * shared scored candidate frame ([[embedScoredPairs]] — the banding +
    * cosine pipeline runs once), exploded to 5 rows.
    */
  def ddCosineSweep(spark: SparkSession, dir: String): DataFrame = {
    val aggCols = count(lit(1)).as("n_candidates") +:
      CosineSweep.map(t =>
        sum(when(col("cos_sim") >= t / 100.0, 1L).otherwise(0L))
          .as(s"ge$t"))
    val agg = embedScoredPairs(spark, dir).agg(aggCols.head, aggCols.tail: _*)
    agg.select(explode(array(CosineSweep.map(t =>
        struct(lit(t.toLong).as("threshold_pct"), col(s"ge$t").as("n_pairs"),
          col("n_candidates"))): _*)).as("s"))
      .select(col("s.threshold_pct").as("threshold_pct"),
        col("s.n_pairs").as("n_pairs"),
        expr("s.n_pairs * 1000000 DIV greatest(s.n_candidates, 1L)")
          .as("pairs_ppm"))
      .orderBy(col("threshold_pct").asc)
  }

  val ddCosineSweepSql: String = {
    val conds = CosineSweep
      .map(t => s"CAST(SUM(CASE WHEN cos_sim >= ${t / 100.0} " +
        s"THEN 1 ELSE 0 END) AS BIGINT) AS ge$t")
      .mkString(",\n       |    ")
    val rows = CosineSweep
      .map(t => s"SELECT $t AS threshold_pct, ge$t AS n_pairs, " +
        s"n_candidates FROM agg")
      .mkString("\n       |  UNION ALL\n       |  ")
    s"""WITH $embedScoredSqlCtes, agg AS (
       |  SELECT COUNT(*) AS n_candidates,
       |    $conds
       |  FROM escored
       |), rows AS (
       |  $rows
       |)
       |SELECT CAST(threshold_pct AS BIGINT) AS threshold_pct, n_pairs,
       |  CAST(n_pairs * 1000000 // greatest(n_candidates, 1) AS BIGINT)
       |    AS pairs_ppm
       |FROM rows ORDER BY threshold_pct ASC""".stripMargin
  }

  // --- dd_dup_bytes: storage-savings report for exact dedup ---------------
  /** What exact dedup would SAVE, per source — the capacity question a
    * storage owner asks before running the dedup job at all: docs and
    * bytes per source, the redundant docs/bytes (every fingerprint-group
    * member except the minimum doc_id), and the byte savings in exact
    * ppm. Shape: the 16-byte dual-fingerprint shuffle of [[ddExact]] with
    * the canonical pick as a per-group min window, rolled up per source
    * with map-side partials — the report frame is ≤|sources| rows, text
    * never moves.
    */
  def ddDupBytes(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    fingerprints(docs)
      .join(docs.select(col("doc_id"), col("source"), col("n_chars")),
        "doc_id")
      .withColumn("grp_min",
        min(col("doc_id")).over(Window.partitionBy(col("h1"), col("h2"))))
      .withColumn("is_dup", col("doc_id") =!= col("grp_min"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_bytes"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("dup_docs"),
        sum(when(col("is_dup"), col("n_chars")).otherwise(0L))
          .as("dup_bytes"))
      .withColumn("save_ppm",
        expr("dup_bytes * 1000000 DIV greatest(total_bytes, 1L)"))
      .orderBy(col("source").asc)
  }

  val ddDupBytesSql: String =
    s"""WITH $fingerprintsSql, marked AS (
       |  SELECT d.source, d.n_chars,
       |    f.doc_id <> MIN(f.doc_id) OVER (PARTITION BY f.h1, f.h2)
       |      AS is_dup
       |  FROM fp f JOIN documents d ON f.doc_id = d.doc_id
       |)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
       |  CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
       |  CAST(SUM(CASE WHEN is_dup THEN n_chars ELSE 0 END) AS BIGINT)
       |    AS dup_bytes,
       |  CAST(SUM(CASE WHEN is_dup THEN n_chars ELSE 0 END) * 1000000
       |    // greatest(SUM(n_chars), 1) AS BIGINT) AS save_ppm
       |FROM marked GROUP BY source ORDER BY source ASC""".stripMargin

  // --- dd_incremental: new-batch ingest gate vs the corpus index ----------

  /** "New batch" binding for the incremental gate: every 10th doc_id plays
    * the day's ingest; the rest is the already-indexed corpus.
    */
  private[graft] val IncrMod = 10L

  /** The candidate-bucket frame of [[ddIncremental]] BEFORE its
    * localCheckpoint — exposed so the PLANS_r{n} plan-shape gate can count
    * the pre-checkpoint stages: the eager checkpoint truncates the
    * physical plan, so drift in this prefix (the corpus band scan, the
    * broadcast of the batch bands, the (band, sig) repartition) would
    * otherwise be invisible to the exchange-regression gate. Probed under
    * the key `dd_incremental__pre_ckpt` by [[graft.PlanProbe.extraPlans]].
    */
  private[graft] def ddIncrementalRawCand(spark: SparkSession,
      dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val isNew = col("doc_id") % IncrMod === lit(IncrMod - 1)
    incrementalRawCand(docs.filter(isNew), docs.filter(!isNew))
  }

  private[graft] def incrementalRawCand(newDocs: DataFrame,
      corpus: DataFrame): DataFrame =
    bandRows(signatures(corpus))
      .join(broadcast(bandRows(signatures(newDocs))
        .withColumnRenamed("doc_id", "new_id")), Seq("band", "sig"))
      .select(col("band"), col("sig"), col("doc_id").as("corp_id"),
        col("new_id"))
      .repartition(col("band"), col("sig"))

  /** The gate's core, parameterized over the batch and the index — shared
    * by the registered [[ddIncremental]] binding (doc_id % [[IncrMod]]
    * split) and the per-micro-batch streaming twin
    * ([[graft.streaming.StreamOps.ingestGateStream]]). `newDocs` and
    * `corpus` both carry (doc_id, text).
    */
  private[graft] def incrementalVerdicts(newDocs: DataFrame,
      corpus: DataFrame): DataFrame = {
    val exactHits = fingerprints(corpus)
      .join(broadcast(fingerprints(newDocs).withColumnRenamed("doc_id", "new_id")),
        Seq("h1", "h2"))
      .select(col("new_id")).distinct()
      .withColumn("is_exact_dup", lit(true))

    // Matched (band, sig) buckets only, batch-bucket-sized: localCheckpoint
    // cuts the double corpus scan that bn + cand deriving from the same
    // join would otherwise cost (the ns_snapshot_diff_chain precedent).
    // The pre-checkpoint repartition pins the preserved partitioning to
    // (band, sig) — one small-frame exchange that both bn aggregation
    // stages then satisfy for free (the map-only signature kernel no
    // longer leaves a reusable hash partitioning behind).
    val rawCand = incrementalRawCand(newDocs, corpus).localCheckpoint()
    // Every corpus member of a matched bucket is present in rawCand, so
    // the skew-guard bucket size is recoverable without touching the
    // full index.
    val bn = rawCand.groupBy(col("band"), col("sig"))
      .agg(countDistinct(col("corp_id")).as("n"))
      .filter(col("n") <= MaxBucket)
    val cand = rawCand.join(bn.select("band", "sig"), Seq("band", "sig"))
      .select(col("new_id"), col("corp_id")).distinct()

    def sets(d: DataFrame): DataFrame = d
      .select(col("doc_id"), strCodes(tokens(col("text"))).as("tcs"))
      .select(col("doc_id"), shingleCodes3(col("tcs")).as("sg"))
    val nearHits = cand
      .join(sets(newDocs).select(col("doc_id").as("new_id"), col("sg").as("sg_a")),
        "new_id")
      .join(sets(corpus).select(col("doc_id").as("corp_id"), col("sg").as("sg_b")),
        "corp_id")
      .withColumn("n_inter", size(array_intersect(col("sg_a"), col("sg_b"))))
      .withColumn("jaccard", round(col("n_inter").cast("double") /
        (size(col("sg_a")) + size(col("sg_b")) - col("n_inter")), 6))
      .filter(col("jaccard") >= 0.6)
      .select(col("new_id")).distinct()
      .withColumn("is_near_dup", lit(true))

    newDocs.select(col("doc_id"))
      .join(exactHits.withColumnRenamed("new_id", "doc_id"), Seq("doc_id"),
        "left")
      .join(nearHits.withColumnRenamed("new_id", "doc_id"), Seq("doc_id"),
        "left")
      .select(col("doc_id"),
        coalesce(col("is_exact_dup"), lit(false)).as("is_exact_dup"),
        coalesce(col("is_near_dup"), lit(false)).as("is_near_dup"))
      .withColumn("verdict",
        when(col("is_exact_dup"), "REJECT_EXACT")
          .when(col("is_near_dup"), "REJECT_NEAR")
          .otherwise("ADMIT"))
      .orderBy(col("doc_id").asc)
  }

  /** Incremental-ingest dedup gate: dedup TODAY'S batch against the
    * already-indexed corpus — never re-dedup the corpus itself. This is
    * the production shape of dedup at 100 TB: the corpus's fingerprint and
    * LSH-band tables are materialized once (here recomputed from the
    * corpus split — the test binding's stand-in for the index), and a
    * daily ingest is admitted by (1) an exact fingerprint lookup — the
    * batch's 16-byte fingerprints BROADCAST against the corpus index, the
    * corpus side never shuffles — and (2) an LSH-band lookup (batch bands
    * broadcast against the corpus band index) whose candidates are
    * Jaccard-verified at the same ≥ 0.6 threshold as [[ddNgramJaccard]].
    * Corpus buckets over [[MaxBucket]] emit no candidates (the lshPairs
    * skew guard: a bucket that hot is boilerplate, not a dup signal) —
    * the guard counts are recovered from the matched buckets themselves,
    * so no corpus-wide bucket aggregation runs. Per new doc: the exact /
    * near flags and the ADMIT / REJECT_EXACT / REJECT_NEAR verdict.
    * Asymmetric by design: new-vs-new duplicates are NOT flagged here —
    * they are the next index build's problem (matching the incremental
    * contract: the gate answers "is this already in the corpus?").
    */
  def ddIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val isNew = col("doc_id") % IncrMod === lit(IncrMod - 1)
    incrementalVerdicts(docs.filter(isNew), docs.filter(!isNew))
  }

  val ddIncrementalSql: String = {
    val bandSelects = (0 until Bands)
      .map(b => s"SELECT $b AS band, ${bandSigSql(b)} AS sig, doc_id FROM sigs")
      .mkString("\nUNION ALL\n")
    val newPred = s"doc_id % $IncrMod = ${IncrMod - 1}"
    s"""WITH $signaturesSql, $fingerprintsSql, exact_m AS (
       |  SELECT DISTINCT n.doc_id FROM fp n JOIN fp c
       |    ON n.h1 = c.h1 AND n.h2 = c.h2
       |  WHERE n.$newPred AND NOT c.$newPred
       |), bands AS (
       |$bandSelects
       |), rawc AS (
       |  SELECT cb.band, cb.sig, cb.doc_id AS corp_id, nb.doc_id AS new_id
       |  FROM bands cb JOIN bands nb
       |    ON cb.band = nb.band AND cb.sig = nb.sig
       |  WHERE NOT cb.$newPred AND nb.$newPred
       |), bn AS (
       |  SELECT band, sig FROM rawc GROUP BY band, sig
       |  HAVING COUNT(DISTINCT corp_id) <= $MaxBucket
       |), cand AS (
       |  SELECT DISTINCT r.new_id, r.corp_id FROM rawc r
       |  JOIN bn ON r.band = bn.band AND r.sig = bn.sig
       |), sets AS (
       |  SELECT doc_id, scs AS sg FROM sc
       |), near_m AS (
       |  SELECT DISTINCT c.new_id AS doc_id
       |  FROM cand c JOIN sets sa ON c.new_id = sa.doc_id
       |  JOIN sets sb ON c.corp_id = sb.doc_id
       |  WHERE round(CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) /
       |    (len(sa.sg) + len(sb.sg) - len(list_intersect(sa.sg, sb.sg))), 6)
       |    >= 0.6
       |)
       |SELECT d.doc_id,
       |  (e.doc_id IS NOT NULL) AS is_exact_dup,
       |  (m.doc_id IS NOT NULL) AS is_near_dup,
       |  CASE WHEN e.doc_id IS NOT NULL THEN 'REJECT_EXACT'
       |       WHEN m.doc_id IS NOT NULL THEN 'REJECT_NEAR'
       |       ELSE 'ADMIT' END AS verdict
       |FROM documents d
       |LEFT JOIN exact_m e ON d.doc_id = e.doc_id
       |LEFT JOIN near_m m ON d.doc_id = m.doc_id
       |WHERE d.$newPred
       |ORDER BY d.doc_id ASC""".stripMargin
  }

  // --- dd_sig_width_sweep: signature-width estimate-error sweep -----------
  /** Estimate-error curve across MinHash signature widths — the third axis
    * of the dedup tuning triad (banding → [[ddBandSweep]], verify
    * threshold → [[ddThresholdSweep]], signature width → this): per width
    * w ∈ {8, 16, 32, 64} hashes, the mean/max |signature-estimate − exact
    * Jaccard| over the LSH candidates, in integer ppm. Each width's
    * estimate reads the FIRST w positions of the same 64-hash signature
    * (a prefix of independent hashes IS a w-hash signature), so the whole
    * sweep costs one candidate frame + four compiled [[graft.functions.CodeKernels.eqCount]]
    * prefix passes — no recomputation per width. Storing 8 bytes × width
    * per doc is the index-size axis this curve prices against accuracy.
    */
  private[graft] val SigWidths = Seq(8, 16, 32, 64)

  def ddSigWidthSweep(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val docs = Tables.documents(spark, dir)
    val sigs = signatures(docs)
    val sigArr = sigs.select(col("doc_id"),
      array((0 until NumHashes).map(i => col(s"mh$i")): _*).as("sig"))
    val sets = docs
      .select(col("doc_id"), strCodes(tokens(col("text"))).as("tcs"))
      .select(col("doc_id"), shingleCodes3(col("tcs")).as("sg"))
    def eqPrefix(w: Int): Column = GraftBridge.column(
      graft.functions.EqCountExpr(
        GraftBridge.expression(slice(col("sig_a"), 1, w)),
        GraftBridge.expression(slice(col("sig_b"), 1, w))))
    val base = lshPairs(sigs)
      .join(sets.select(col("doc_id").as("doc_a"), col("sg").as("sg_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sg").as("sg_b")), "doc_b")
      .join(sigArr.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigArr.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("n_inter",
        size(array_intersect(col("sg_a"), col("sg_b"))).cast("bigint"))
      .withColumn("n_union",
        size(col("sg_a")) + size(col("sg_b")) - col("n_inter"))
      .withColumn("exact_ppm", expr("n_inter * 1000000 DIV n_union"))
    val withEq = SigWidths.foldLeft(base)((df, w) =>
      df.withColumn(s"n_eq_$w", eqPrefix(w)))
    withEq
      .select(col("exact_ppm"), explode(array(SigWidths.map(w =>
        struct(lit(w.toLong).as("width"),
          expr(s"n_eq_$w * 1000000 DIV $w").as("est_ppm"))): _*)).as("we"))
      .select(col("we.width").as("width"), col("we.est_ppm").as("est_ppm"),
        col("exact_ppm"))
      .withColumn("err", abs(col("est_ppm") - col("exact_ppm")))
      .groupBy(col("width"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(col("err")).as("sum_err"), max(col("err")).as("max_abs_err_ppm"))
      .withColumn("mean_abs_err_ppm", expr("sum_err DIV n_candidates"))
      .select("width", "n_candidates", "mean_abs_err_ppm", "max_abs_err_ppm")
      .orderBy(col("width").asc)
  }

  val ddSigWidthSweepSql: String = {
    def agree(w: Int): String = (0 until w)
      .map(i => s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val eqCols = SigWidths
      .map(w => s"CAST(${agree(w)} AS BIGINT) AS n_eq_$w").mkString(",\n    ")
    val widthRows = SigWidths.map(w =>
      s"SELECT $w AS width, n_eq_$w * 1000000 // $w AS est_ppm, exact_ppm FROM e")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH $signaturesSql, $lshPairsSql, sets AS (
       |  SELECT doc_id, scs AS sg FROM sc
       |), p AS (
       |  SELECT
       |    CAST(len(list_intersect(sa.sg, sb.sg)) AS BIGINT) AS n_inter,
       |    CAST(len(sa.sg) + len(sb.sg)
       |      - len(list_intersect(sa.sg, sb.sg)) AS BIGINT) AS n_union,
       |    $eqCols
       |  FROM cand c
       |  JOIN sets sa ON c.doc_a = sa.doc_id
       |  JOIN sets sb ON c.doc_b = sb.doc_id
       |  JOIN sigs a ON c.doc_a = a.doc_id
       |  JOIN sigs b ON c.doc_b = b.doc_id
       |), e AS (
       |  SELECT n_inter * 1000000 // n_union AS exact_ppm,
       |    ${SigWidths.map(w => s"n_eq_$w").mkString(", ")}
       |  FROM p
       |), t AS (
       |  $widthRows
       |)
       |SELECT CAST(width AS BIGINT) AS width, COUNT(*) AS n_candidates,
       |  CAST(SUM(ABS(est_ppm - exact_ppm)) // COUNT(*) AS BIGINT)
       |    AS mean_abs_err_ppm,
       |  CAST(MAX(ABS(est_ppm - exact_ppm)) AS BIGINT) AS max_abs_err_ppm
       |FROM t GROUP BY width ORDER BY width ASC""".stripMargin
  }

  // --- dd_band_sweep: LSH banding-configuration tuning sweep --------------
  /** Candidate-volume / precision curve across LSH banding configurations
    * of the SAME 64 minhashes — 4×16, 8×8, 16×4 (bands × rows-per-band) —
    * the tuning run an operator does BEFORE committing a 100 TB dedup to
    * one banding: more bands ⇒ lower match threshold ⇒ more candidates to
    * verify (recall↑, precision↓). Per config: candidate-pair count,
    * exact-Jaccard-verified count (≥ 0.6, [[ddNgramJaccard]]'s predicate
    * verbatim — the 16-band row of this sweep reconciles with
    * dd_minhash_lsh / dd_ngram_jaccard counts by construction), and
    * integer precision ppm.
    *
    * Scale shape: ALL 28 band signatures (4+8+16 across the three
    * configs) fan out of ONE signature projection via a single explode —
    * one corpus scan, one minhash kernel pass, ONE (g, sig) shuffle with
    * the [[MaxBucket]] skew guard per config — where `g` is a GLOBAL band
    * id over the concatenated configs, so the corpus-sized exchange rows
    * stay as narrow as a single config's (the config tag is re-derived
    * from g's range after the bucket aggregate, on the candidate-sized
    * frame). The three tagged candidate sets union BEFORE verification,
    * so the shingle-set join (the expensive stage — set payloads move)
    * also runs ONCE over all configs. Reference anchor: the banding
    * trade-off documented for [[lshPairs]] (SURVEY §2.D).
    */
  private[graft] val SweepBands = Seq(4, 8, 16)

  def ddBandSweep(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // Global band ids: config nb's bands occupy [offset, offset + nb).
    val offsets = SweepBands.scanLeft(0)(_ + _)
    val allStructs = array(SweepBands.zip(offsets).flatMap { case (nb, off) =>
      val rows = NumHashes / nb
      def sig(b: Int): Column = (0 until rows).map(r => col(s"mh${rows * b + r}"))
        .reduce((acc, h) => (acc * 31L + h) % P)
      (0 until nb).map(b => struct(lit(off + b).as("g"), sig(b).as("sig")))
    }: _*)
    val bandsOfG = SweepBands.zip(offsets).tail.foldLeft(
      when(col("g") < SweepBands.head + offsets.head, SweepBands.head)) {
      case (acc, (nb, off)) => acc.when(col("g") < nb + off, nb)
    }
    val candAll = signatures(docs)
      .select(col("doc_id"), explode(allStructs).as("bs"))
      .select(col("bs.g").as("g"), col("bs.sig").as("sig"), col("doc_id"))
      .groupBy(col("g"), col("sig"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, MaxBucket))
      .select(col("g"), explode(Codes.pairs(col("ids"))).as("pr"))
      .select(bandsOfG.as("bands"), col("pr.doc_a").as("doc_a"),
        col("pr.doc_b").as("doc_b"))
      .distinct()
    val sets = docs
      .select(col("doc_id"), strCodes(tokens(col("text"))).as("tcs"))
      .select(col("doc_id"), shingleCodes3(col("tcs")).as("sg"))
    candAll
      .join(sets.select(col("doc_id").as("doc_a"), col("sg").as("sg_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sg").as("sg_b")), "doc_b")
      .withColumn("n_inter", size(array_intersect(col("sg_a"), col("sg_b"))))
      .withColumn("jaccard", round(col("n_inter").cast("double") /
        (size(col("sg_a")) + size(col("sg_b")) - col("n_inter")), 6))
      .groupBy(col("bands"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("jaccard") >= 0.6, 1L).otherwise(0L)).as("n_verified"))
      .withColumn("rows_per_band", lit(NumHashes.toLong) / col("bands"))
      .withColumn("rows_per_band", col("rows_per_band").cast("bigint"))
      .withColumn("precision_ppm",
        expr("n_verified * 1000000 DIV n_candidates"))
      .select(col("bands").cast("bigint").as("bands"), col("rows_per_band"),
        col("n_candidates"), col("n_verified"), col("precision_ppm"))
      .orderBy(col("bands").asc)
  }

  val ddBandSweepSql: String = {
    def bandSigSqlC(b: Int, rows: Int): String =
      (0 until rows).map(r => s"mh${rows * b + r}")
        .reduce((acc, h) => s"(($acc * 31 + $h) % $P)")
    val candCtes = SweepBands.map { nb =>
      val rows = NumHashes / nb
      val bandSelects = (0 until nb)
        .map(b => s"SELECT $b AS band, ${bandSigSqlC(b, rows)} AS sig, doc_id FROM sigs")
        .mkString("\nUNION ALL\n")
      s"""bands_$nb AS (
         |$bandSelects
         |), bcnt_$nb AS (
         |  SELECT band, sig, doc_id,
         |    COUNT(*) OVER (PARTITION BY band, sig) AS n FROM bands_$nb
         |), cand_$nb AS (
         |  SELECT DISTINCT $nb AS bands, a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bcnt_$nb a JOIN bcnt_$nb b
         |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
         |    AND a.n <= $MaxBucket AND b.n <= $MaxBucket
         |)""".stripMargin
    }.mkString(", ")
    val candUnion = SweepBands
      .map(nb => s"SELECT * FROM cand_$nb").mkString("\nUNION ALL\n")
    s"""WITH $signaturesSql, $candCtes, candall AS (
       |$candUnion
       |), sets AS (
       |  SELECT doc_id, scs AS sg FROM sc
       |), scored AS (
       |  SELECT c.bands,
       |    round(CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) /
       |      (len(sa.sg) + len(sb.sg) - len(list_intersect(sa.sg, sb.sg))), 6)
       |      AS jaccard
       |  FROM candall c
       |  JOIN sets sa ON c.doc_a = sa.doc_id
       |  JOIN sets sb ON c.doc_b = sb.doc_id
       |)
       |SELECT CAST(bands AS BIGINT) AS bands,
       |  CAST($NumHashes // bands AS BIGINT) AS rows_per_band,
       |  COUNT(*) AS n_candidates,
       |  CAST(SUM(CASE WHEN jaccard >= 0.6 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_verified,
       |  CAST(SUM(CASE WHEN jaccard >= 0.6 THEN 1 ELSE 0 END) * 1000000
       |    // COUNT(*) AS BIGINT) AS precision_ppm
       |FROM scored GROUP BY bands ORDER BY bands ASC""".stripMargin
  }

  // --- dd_edit_distance: Levenshtein verify over prefix-bucket pairs -----
  /** Edit-distance verification of candidate near-duplicates: documents
    * sharing a 12-char lowercase prefix pair up, and each pair is scored by
    * Levenshtein distance over a bounded 60-char window (O(60²) per pair —
    * the standard cost cap that keeps the verify stage linear in the pair
    * count rather than quadratic in document length). sim_ppm is the exact
    * integer (maxlen − dist)·10⁶ // maxlen, so both engines hash
    * identically. Complements the minhash/simhash families with the one
    * character-level metric they can't express (reference test suites pin
    * dedup verify stages on exactly this metric).
    *
    * Scale: the self-join is key-partitioned on the prefix bucket, and
    * buckets larger than [[MaxBucket]] docs are dropped as stop-prefixes
    * (the same skew guard every other candidate-pair family carries,
    * mirrored in the oracle) — a boilerplate-heavy corpus where millions
    * of documents share one 12-char opening would otherwise go quadratic
    * in that one bucket. With the cap, pair count is ≤ C(MaxBucket,2) per
    * bucket and the 60-char window caps per-pair CPU.
    */
  def ddEditDistance(spark: SparkSession, dir: String): DataFrame =
    editPairs(Tables.documents(spark, dir))

  /** The bucket-pair + windowed-Levenshtein core over any frame with
    * `(doc_id, text)` (exposed for constructed-input specs).
    */
  private[graft] def editPairs(docs: DataFrame): DataFrame = {
    // Empty texts are excluded BEFORE the join: they would all share the
    // '' bucket (quadratic pair blowup) and max_len = 0 divides — where
    // Spark's double `/` yields NaN→0 but DuckDB's integer `//` yields
    // NULL, a silent gate divergence. With the filter, max_len > 0 always
    // and integer `div` matches the oracle's `//` exactly.
    val d = docs.select(col("doc_id"),
      lower(substring(col("text"), 1, 60)).as("w"),
      lower(substring(col("text"), 1, 12)).as("bkt"))
      .filter(length(col("w")) > 0)
    // Stop-prefix guard: one window count on the bucket key (the same
    // exchange the join needs anyway — ReuseExchange collapses them), then
    // hot buckets are dropped BEFORE pair expansion.
    val sized = d.withColumn("n",
        count(lit(1)).over(Window.partitionBy(col("bkt"))))
      .filter(col("n") <= MaxBucket)
    val a = sized.select(col("doc_id").as("doc_a"), col("w").as("wa"), col("bkt"))
    val b = sized.select(col("doc_id").as("doc_b"), col("w").as("wb"), col("bkt"))
    // Sort BEFORE the Levenshtein projection: a global orderBy is two
    // passes (range-bound sampling + the sort), and with the O(60²)
    // verify inside the sorted subtree the sampling pass re-ran it —
    // measured 2× the whole operator at the 10× scale (44 s → 23 s).
    // Sorting on the join keys first leaves the sample pass reading only
    // (doc_a, doc_b, wa, wb); the verify runs once, above the sort,
    // order preserved by the projection.
    a.join(b, Seq("bkt"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("wa"), col("wb"))
      .orderBy(col("doc_a").asc, col("doc_b").asc)
      .withColumn("lev_dist", levenshtein(col("wa"), col("wb")).cast("bigint"))
      .withColumn("max_len",
        greatest(length(col("wa")), length(col("wb"))).cast("bigint"))
      .withColumn("sim_ppm",
        expr("(max_len - lev_dist) * 1000000 div max_len").cast("bigint"))
      .select(col("doc_a"), col("doc_b"), col("lev_dist"), col("sim_ppm"))
  }

  /** Candidate-pair accounting for [[editPairs]] (VERDICT r16 #2): one row
    * of measured counters — emitted pairs, dropped stop-prefix buckets and
    * docs, and the analytic worst-case bound Σ_b min(n_b, MaxBucket) ·
    * (MaxBucket − 1) / 2 — so the O(N·MaxBucket) claim is an asserted
    * number, not prose. `candidate_pairs` here is computed from the bucket
    * HISTOGRAM (Σ_kept n·(n−1)/2), which equals the join's output count by
    * construction; a spec pins that identity and the bound, and
    * ScalingProbe stamps these counters into the SCALING artifact at the
    * 10× replica. Cost: one map-side-combined groupBy over (12-char
    * prefix) — no pair expansion.
    */
  private[graft] def editPairStats(docs: DataFrame): DataFrame =
    docs.filter(length(col("text")) > 0)
      .select(lower(substring(col("text"), 1, 12)).as("bkt"))
      .groupBy(col("bkt")).agg(count(lit(1)).as("n"))
      .agg(
        sum(col("n")).cast("bigint").as("n_docs"),
        count(lit(1)).as("n_buckets"),
        sum(when(col("n") > MaxBucket, 1L).otherwise(0L)).cast("bigint")
          .as("dropped_buckets"),
        sum(when(col("n") > MaxBucket, col("n")).otherwise(0L)).cast("bigint")
          .as("dropped_docs"),
        // n(n−1) is even, so the summed halves are exact in integer math
        // (the `/` operator would detour through double).
        expr(s"sum(CASE WHEN n <= $MaxBucket THEN n * (n - 1) ELSE 0 END) div 2")
          .cast("bigint").as("candidate_pairs"),
        expr(s"sum(least(n, $MaxBucket) * ${MaxBucket - 1}) div 2")
          .cast("bigint").as("pair_bound"))

  val ddEditDistanceSql: String =
    s"""WITH d AS (
      |  SELECT doc_id, lower(substr(text, 1, 60)) AS w,
      |    lower(substr(text, 1, 12)) AS bkt
      |  FROM documents WHERE length(text) > 0
      |), sized AS (
      |  SELECT doc_id, w, bkt, COUNT(*) OVER (PARTITION BY bkt) AS n FROM d
      |)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(levenshtein(a.w, b.w) AS BIGINT) AS lev_dist,
      |  CAST((greatest(length(a.w), length(b.w)) - levenshtein(a.w, b.w))
      |    * 1000000 // greatest(length(a.w), length(b.w)) AS BIGINT) AS sim_ppm
      |FROM sized a JOIN sized b ON a.bkt = b.bkt AND a.doc_id < b.doc_id
      |  AND a.n <= $MaxBucket AND b.n <= $MaxBucket
      |ORDER BY doc_a ASC, doc_b ASC""".stripMargin

  // --- dd_editdist_prefix_stats: prefix-index health gauge ---------------
  /** Bucket-size histogram of [[ddEditDistance]]'s 12-char-prefix index —
    * the [[ddWinnowStats]]-style shape audit for the edit-distance
    * blocking key: healthy corpora put the mass at bucket size 1–2;
    * buckets past [[MaxBucket]] are flagged `capped` — exactly the
    * stop-prefixes the pair join drops. Run this before trusting an
    * edit-distance dedup pass: a heavy capped tail means a boilerplate
    * opening is hiding near-dups from the verify stage.
    *
    * Scale: two map-side-combined aggregations over (12-char prefix,
    * long) pairs; the histogram is a ≤max-bucket-row report.
    */
  def ddEditdistPrefixStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(length(col("text")) > 0)
      .select(lower(substring(col("text"), 1, 12)).as("bkt"))
      .groupBy(col("bkt")).agg(count(lit(1)).as("bucket_size"))
      .groupBy(col("bucket_size")).agg(count(lit(1)).as("n_buckets"))
      .withColumn("capped", col("bucket_size") > MaxBucket)
      .orderBy(col("bucket_size").asc)

  val ddEditdistPrefixStatsSql: String =
    s"""WITH d AS (
       |  SELECT lower(substr(text, 1, 12)) AS bkt
       |  FROM documents WHERE length(text) > 0
       |), b AS (
       |  SELECT bkt, COUNT(*) AS bucket_size FROM d GROUP BY bkt
       |)
       |SELECT bucket_size, COUNT(*) AS n_buckets,
       |  bucket_size > $MaxBucket AS capped
       |FROM b GROUP BY bucket_size ORDER BY bucket_size ASC""".stripMargin

  // --- dd_candidate_graph: LSH candidate-graph degree histogram ----------
  /** Degree distribution of the MinHash-LSH candidate graph — the shape
    * audit that tells a dedup operator whether the banding is healthy
    * (mass at degree 0–2) or collapsing into hub clusters (a heavy tail
    * means a hot shingle pattern is flooding the verify stage). Degree-0
    * docs are counted explicitly via a left join from the corpus, so the
    * histogram partitions the whole corpus.
    *
    * Scale: rides the existing banded candidate machinery (MaxBucket caps
    * bucket blowups); the degree aggregate shuffles (doc_id, long) pairs
    * with map-side combine; the histogram is a ≤max-degree-row report.
    */
  def ddCandidateGraph(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val cand = lshPairs(signatures(docs))
    val deg = cand.select(col("doc_a").as("doc_id"))
      .unionAll(cand.select(col("doc_b").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("degree"))
    docs.select(col("doc_id")).join(deg, Seq("doc_id"), "left")
      .withColumn("degree", coalesce(col("degree"), lit(0L)))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("degree").asc)
  }

  val ddCandidateGraphSql: String =
    s"""WITH $signaturesSql, $lshPairsSql, deg AS (
       |  SELECT doc_id, COUNT(*) AS degree FROM (
       |    SELECT doc_a AS doc_id FROM cand
       |    UNION ALL
       |    SELECT doc_b AS doc_id FROM cand
       |  ) GROUP BY doc_id
       |)
       |SELECT coalesce(g.degree, 0) AS degree, COUNT(*) AS n_docs
       |FROM documents d LEFT JOIN deg g ON d.doc_id = g.doc_id
       |GROUP BY coalesce(g.degree, 0)
       |ORDER BY degree ASC""".stripMargin

  // --- dd_substring_containment: winnowed-fingerprint containment --------
  /** Winnow window: every run of [[WinnowW]] consecutive shingle codes
    * contributes its minimum to the doc's fingerprint set.
    */
  private[graft] val WinnowW = 8

  /** Per-doc winnow frame: distinct shingle set `sg` (the verify-stage
    * currency) and winnowed fingerprint set `fps` (the blocking currency),
    * the latter via the compiled [[Codes.winnowMins]] monotonic-deque
    * kernel — the declarative slice-per-window form re-copies the array
    * per window in the interpreted evaluator (measured ~90 s at sf0.01 vs
    * <1 s compiled). Docs under 3 tokens have no shingles and are
    * excluded on both sides.
    */
  private[graft] def winnowBase(docs: DataFrame): DataFrame =
    docs
      // Shingle-nonempty guard AT THE SCAN (< 3 tokens ⟺ zero shingles),
      // exactly like [[signatures]] — and COMPILED KERNELS end-to-end:
      // sg and fps both come straight off the token-code array. An
      // intermediate `transform`-built shingle stream looked harmless
      // (each projection stage an attribute) but the optimizer inlines
      // it into downstream Generate/Filter consumers, where the
      // interpreted evaluator re-runs element_at's inlined producer PER
      // ELEMENT — the O(tokens²) txContamination trap (measured 15+ s at
      // sf0.1 for a 54k-row index vs ~0.5 s with the fused kernels).
      .filter(size(tokens(col("text"))) >= 3)
      .select(col("doc_id"), strCodes(tokens(col("text"))).as("tcs"))
      .select(col("doc_id"),
        Codes.shingle3SetFast(col("tcs")).as("sg"),
        Codes.winnowShingles3(col("tcs"), WinnowW).as("fps"))

  /** The shared DuckDB CTE chain: toks → tc → ps → base(doc_id, sg, fps).
    * DuckDB list slices are 1-based and end-inclusive, so `psc[j:j+7]` is
    * the same 8-element (clamped) window as Spark's `slice(psc, j, 8)`.
    */
  private val winnowBaseSqlCtes: String =
    s"""toks AS (
       |  SELECT doc_id, ${tokensSql("text")} AS ts FROM documents
       |), tc AS (
       |  SELECT doc_id, ${strCodesSql("ts")} AS tcs FROM toks
       |), ps AS (
       |  SELECT doc_id,
       |    [ ((tcs[i] * 8191 + tcs[i+1]) % $P * 8191 + tcs[i+2]) % $P
       |      for i in range(1, greatest(len(tcs) - 1, 1)) ] AS psc
       |  FROM tc
       |), base AS (
       |  SELECT doc_id, list_distinct(psc) AS sg,
       |    list_distinct([ list_min(psc[j:j+${WinnowW - 1}])
       |      for j in range(1, greatest(len(psc) - ${WinnowW - 1}, 1) + 1) ]) AS fps
       |  FROM ps WHERE len(psc) > 0
       |)""".stripMargin

  /** TRUE small-in-big containment detection — the blocking family
    * [[ddContainment]] documents itself as structurally missing
    * (VERDICT r14 "what's missing" #2): its LSH candidates track JACCARD,
    * so a short document quoted verbatim inside a long one
    * (j ≈ |A|/|B| ≈ 0.05) never shares a band. This operator blocks on
    * WINNOWED fingerprints of the positional shingle stream instead
    * (Schleimer, Wilkerson & Aiken, "Winnowing: Local Algorithms for
    * Document Fingerprinting", SIGMOD 2003 — see PAPERS.md): each
    * [[WinnowW]]-window of consecutive word-3-gram codes contributes its
    * minimum, and docs meet when they share a fingerprint. Recall is
    * STRUCTURAL, not probabilistic: a contained run of
    * ≥ WinnowW + 2 tokens (= WinnowW consecutive shingles) pins one
    * fully-aligned window in both docs, whose minimum is selected on both
    * sides — so a verbatim-contained small doc of ≥ 10 tokens ALWAYS
    * meets its container, regardless of how small j is. Candidates are
    * verified by EXACT shingle-set containment in integer ppm; pairs emit
    * only with strong containment (≥ 0.9) and genuine size asymmetry
    * (2·|A| ≤ |B| ⟹ j ≤ ½ — disjoint from the near-dup gate by
    * construction).
    *
    * Scale: the fingerprint index is ~2/(W+1) of the shingle stream
    * (winnow density), shuffled as (fp, doc_id, sz) longs — never text;
    * posting lists above [[MaxBucket]] docs are dropped as
    * stop-fingerprints (mirrored in the oracle), capping bucket expansion
    * exactly like the LSH family; the verify join ships shingle arrays
    * for candidate docs only. No all-pairs product anywhere.
    */
  def ddSubstringContainment(spark: SparkSession, dir: String): DataFrame =
    substringContainment(Tables.documents(spark, dir))

  /** The full block → verify core over any (doc_id, text) frame —
    * spec-injected with a constructed quoted-inside pair at j ≈ 0.05 that
    * [[containmentScores]]' LSH blocking provably drops.
    */
  private[graft] def substringContainment(docs: DataFrame): DataFrame = {
    val base = winnowBase(docs)
    val idx = base.select(col("doc_id"), size(col("sg")).cast("long").as("sz"),
      explode(col("fps")).as("fp"))
    // In-bucket (small, big) expansion: 2·sz_a ≤ sz_b implies sz_a < sz_b,
    // so a doc can never pair with itself and every pair is emitted in
    // exactly one orientation.
    val cand = idx.groupBy(col("fp"))
      .agg(collect_list(struct(col("doc_id"), col("sz"))).as("ds"))
      .filter(size(col("ds")) <= MaxBucket)
      .select(explode(col("ds")).as("a"), col("ds"))
      .select(col("a"), explode(col("ds")).as("b"))
      .filter(col("a.sz") * 2 <= col("b.sz"))
      .select(col("a.doc_id").as("doc_small"), col("b.doc_id").as("doc_big"),
        col("a.sz").as("size_small"), col("b.sz").as("size_big"))
      .distinct()
    cand
      .join(base.select(col("doc_id").as("doc_small"), col("sg").as("sg_s")),
        "doc_small")
      .join(base.select(col("doc_id").as("doc_big"), col("sg").as("sg_b")),
        "doc_big")
      .withColumn("n_inter",
        size(array_intersect(col("sg_s"), col("sg_b"))).cast("long"))
      .withColumn("cont_ppm",
        expr("n_inter * 1000000 DIV greatest(size_small, 1)"))
      .withColumn("jaccard_ppm",
        expr("n_inter * 1000000 DIV greatest(size_small + size_big - n_inter, 1)"))
      .filter(col("cont_ppm") >= 900000L)
      .select(col("doc_small"), col("doc_big"), col("size_small"),
        col("size_big"), col("n_inter"), col("cont_ppm"), col("jaccard_ppm"))
      .orderBy(col("doc_small").asc, col("doc_big").asc)
  }

  val ddSubstringContainmentSql: String =
    s"""WITH $winnowBaseSqlCtes, idx AS (
       |  SELECT doc_id, CAST(len(sg) AS BIGINT) AS sz, unnest(fps) AS fp
       |  FROM base
       |), ok_fp AS (
       |  SELECT fp FROM idx GROUP BY fp HAVING COUNT(*) <= $MaxBucket
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_small, b.doc_id AS doc_big,
       |    a.sz AS size_small, b.sz AS size_big
       |  FROM idx a JOIN idx b ON a.fp = b.fp JOIN ok_fp o ON a.fp = o.fp
       |  WHERE a.sz * 2 <= b.sz
       |), scored AS (
       |  SELECT c.doc_small, c.doc_big, c.size_small, c.size_big,
       |    CAST(len(list_intersect(s.sg, g.sg)) AS BIGINT) AS n_inter
       |  FROM cand c JOIN base s ON c.doc_small = s.doc_id
       |  JOIN base g ON c.doc_big = g.doc_id
       |)
       |SELECT doc_small, doc_big, size_small, size_big, n_inter,
       |  CAST(n_inter * 1000000 // greatest(size_small, 1) AS BIGINT)
       |    AS cont_ppm,
       |  CAST(n_inter * 1000000 // greatest(size_small + size_big - n_inter, 1)
       |    AS BIGINT) AS jaccard_ppm
       |FROM scored
       |WHERE n_inter * 1000000 // greatest(size_small, 1) >= 900000
       |ORDER BY doc_small ASC, doc_big ASC""".stripMargin

  // --- dd_winnow_stats: fingerprint-index health audit --------------------
  /** Posting-list-size histogram of the winnowed fingerprint index — the
    * shape audit that tells [[ddSubstringContainment]] whether its
    * blocking is healthy (mass at posting size 1–2) or a hot template
    * fingerprint is flooding the candidate stage; postings past
    * [[MaxBucket]] are flagged `capped` — exactly the rows the candidate
    * join drops as stop-fingerprints. Twin of [[ddCandidateGraph]] for
    * the containment family.
    *
    * Scale: two map-side-combined aggregations over (fp, long) pairs; the
    * histogram is a ≤max-posting-row report.
    */
  def ddWinnowStats(spark: SparkSession, dir: String): DataFrame =
    winnowBase(Tables.documents(spark, dir))
      .select(explode(col("fps")).as("fp"))
      .groupBy(col("fp")).agg(count(lit(1)).as("posting_size"))
      .groupBy(col("posting_size"))
      .agg(count(lit(1)).as("n_fingerprints"))
      .withColumn("capped", col("posting_size") > MaxBucket)
      .orderBy(col("posting_size").asc)

  val ddWinnowStatsSql: String =
    s"""WITH $winnowBaseSqlCtes, pl AS (
       |  SELECT fp, COUNT(*) AS posting_size
       |  FROM (SELECT doc_id, unnest(fps) AS fp FROM base) GROUP BY fp
       |)
       |SELECT posting_size, COUNT(*) AS n_fingerprints,
       |  posting_size > $MaxBucket AS capped
       |FROM pl GROUP BY posting_size ORDER BY posting_size ASC""".stripMargin

  // --- dd_phrase_hotlist: most document-frequent 3-gram phrases -----------
  /** The boilerplate detector: the 20 word-3-gram phrases appearing in the
    * most DOCUMENTS (each doc counts a phrase once — [[shingles3]] is
    * distinct-per-doc), with how many sources carry them and the corpus
    * doc-share in exact ppm. A phrase near share 1e6 is a template/header
    * to strip before training; the (df DESC, phrase ASC) total order makes
    * the rank-20 cut deterministic.
    *
    * Scale: the (phrase, source) aggregate partial-combines map-side so
    * the one corpus-sized exchange carries each distinct (phrase, source)
    * once per map partition; the phrase-level rollup and the TakeOrdered
    * top-20 then run on the distinct-phrase frame. The corpus doc count
    * rides a broadcast 1-row scalar (the ct_balancer_moves hoist) — no
    * corpus re-scan for the share denominator.
    */
  def ddPhraseHotlist(spark: SparkSession, dir: String): DataFrame =
    phraseHotlistOf(Tables.documents(spark, dir))

  /** The hotlist core over any documents-shaped frame (doc_id, source,
    * text) — spec seam for constructed boilerplate corpora.
    *
    * The corpus-wide count runs entirely over 8-byte shingle CODES via the
    * compiled kernels ([[strCodes]] → [[shingle3SetFast]]) — the original
    * string-shingle form (`explode(shingles3(tokens(text)))`) evaluated
    * the interpreted HOF with the token array re-computed per element
    * (the txContamination trap: O(tokens²) per doc — measured 104 s at
    * sf1 vs ~4 s for this form). Readable phrase strings are recovered
    * for the 20 WINNERS only: each winning code carries its min doc_id,
    * those ≤20 docs are re-shingled interpreted (cheap at 20 docs), and
    * each phrase re-hashed by the same 3-token fold for the join back.
    * Should two distinct phrases collide on a code, both engines merge
    * them identically (df sums, min phrase displays) by construction.
    */
  private[graft] def phraseHotlistOf(docs: DataFrame): DataFrame = {
    val sh = docs
      .select(col("doc_id"), col("source"),
        explode_outer(shingle3SetFast(strCodes(tokens(col("text")))))
          .as("code"))
      .filter(col("code").isNotNull)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val top = sh.groupBy(col("code"), col("source"))
      .agg(count(lit(1)).as("c"), min(col("doc_id")).as("md"))
      .groupBy(col("code"))
      .agg(sum(col("c")).as("df"), count(lit(1)).as("n_sources"),
        min(col("md")).as("rep_doc"))
      .orderBy(col("df").desc, col("code").asc)
      .limit(20)
    // Phrase recovery over the ≤20 representative docs only.
    val phrases = docs
      .join(broadcast(top.select(col("rep_doc"))),
        col("doc_id") === col("rep_doc"))
      .select(explode(shingles3(tokens(col("text")))).as("phrase"))
      .distinct()
      .withColumn("tc", strCodes(split(col("phrase"), " ")))
      // The exact shingleCodes3 fold over the phrase's 3 token codes.
      .withColumn("pcode", expr(
        s"((element_at(tc, 1) * 8191 + element_at(tc, 2)) % ${Codes.P}" +
          s" * 8191 + element_at(tc, 3)) % ${Codes.P}"))
      .groupBy(col("pcode")).agg(min(col("phrase")).as("phrase"))
    top.join(broadcast(phrases), col("code") === col("pcode"), "left")
      .crossJoin(broadcast(nDocs))
      .withColumn("share_ppm", expr("df * 1000000 div n_docs"))
      .select(col("code"), col("phrase"), col("df"), col("n_sources"),
        col("share_ppm"))
      .orderBy(col("df").desc, col("code").asc)
  }

  val ddPhraseHotlistSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, source, ${tokensSql("text")} AS ts FROM documents
       |), htc AS (
       |  SELECT doc_id, source, ${strCodesSql("ts")} AS tcs FROM toks
       |), sh AS (
       |  SELECT doc_id, source,
       |    unnest(${shingleCodes3Sql("tcs")}) AS code
       |  FROM htc
       |), pss AS (
       |  SELECT code, source, COUNT(*) AS c, MIN(doc_id) AS md
       |  FROM sh GROUP BY code, source
       |), agg AS (
       |  SELECT code, CAST(SUM(c) AS BIGINT) AS df,
       |    CAST(COUNT(*) AS BIGINT) AS n_sources, MIN(md) AS rep_doc
       |  FROM pss GROUP BY code
       |), top AS (
       |  SELECT * FROM agg ORDER BY df DESC, code ASC LIMIT 20
       |), ph AS (
       |  SELECT DISTINCT unnest(${shingles3Sql("t.ts")}) AS phrase
       |  FROM toks t JOIN top ON t.doc_id = top.rep_doc
       |), pc AS (
       |  SELECT phrase,
       |    ((tc[1] * 8191 + tc[2]) % $P * 8191 + tc[3]) % $P AS pcode
       |  FROM (SELECT phrase,
       |    ${strCodesSql("string_split(phrase, ' ')")} AS tc FROM ph)
       |), pmin AS (
       |  SELECT pcode, MIN(phrase) AS phrase FROM pc GROUP BY pcode
       |), nd AS (SELECT COUNT(*) AS n_docs FROM documents)
       |SELECT top.code, pmin.phrase, top.df, top.n_sources,
       |  CAST(top.df * 1000000 // nd.n_docs AS BIGINT) AS share_ppm
       |FROM top LEFT JOIN pmin ON top.code = pmin.pcode, nd
       |ORDER BY df DESC, code ASC""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_phrase_hotlist" -> ddPhraseHotlist,
    "dd_substring_containment" -> ddSubstringContainment,
    "dd_winnow_stats" -> ddWinnowStats,
    "dd_edit_distance" -> ddEditDistance,
    "dd_editdist_prefix_stats" -> ddEditdistPrefixStats,
    "dd_candidate_graph" -> ddCandidateGraph,
    "dd_band_sweep" -> ddBandSweep,
    "dd_sig_width_sweep" -> ddSigWidthSweep,
    "dd_source_dup_matrix" -> ddSourceDupMatrix,
    "dd_incremental" -> ddIncremental,
    "dd_dup_bytes" -> ddDupBytes,
    "dd_exact" -> ddExact,
    "dd_minhash_lsh" -> ddMinhashLsh,
    "dd_minhash_est" -> ddMinhashEst,
    "dd_ngram_jaccard" -> ddNgramJaccard,
    "dd_containment" -> ddContainment,
    "dd_rep_selection" -> ddRepSelection,
    "dd_simhash" -> ddSimhash,
    "dd_embed_cosine" -> ddEmbedCosine,
    "dd_canonical" -> ddCanonical,
    "dd_cluster_sizes" -> ddClusterSizes,
    "dd_lsh_audit" -> ddLshAudit,
    "dd_shingle_hist" -> ddShingleHist,
    "dd_threshold_sweep" -> ddThresholdSweep,
    "dd_semantic_clusters" -> ddSemanticClusters,
    "dd_modality_agreement" -> ddModalityAgreement,
    "dd_cosine_sweep" -> ddCosineSweep,
    "dd_components" -> ddComponents)

  val oracles: Map[String, String] = Map(
    "dd_phrase_hotlist" -> ddPhraseHotlistSql,
    "dd_substring_containment" -> ddSubstringContainmentSql,
    "dd_winnow_stats" -> ddWinnowStatsSql,
    "dd_edit_distance" -> ddEditDistanceSql,
    "dd_editdist_prefix_stats" -> ddEditdistPrefixStatsSql,
    "dd_candidate_graph" -> ddCandidateGraphSql,
    "dd_band_sweep" -> ddBandSweepSql,
    "dd_sig_width_sweep" -> ddSigWidthSweepSql,
    "dd_source_dup_matrix" -> ddSourceDupMatrixSql,
    "dd_incremental" -> ddIncrementalSql,
    "dd_dup_bytes" -> ddDupBytesSql,
    "dd_exact" -> ddExactSql,
    "dd_minhash_lsh" -> ddMinhashLshSql,
    "dd_minhash_est" -> ddMinhashEstSql,
    "dd_ngram_jaccard" -> ddNgramJaccardSql,
    "dd_containment" -> ddContainmentSql,
    "dd_rep_selection" -> ddRepSelectionSql,
    "dd_simhash" -> ddSimhashSql,
    "dd_embed_cosine" -> ddEmbedCosineSql,
    "dd_canonical" -> ddCanonicalSql,
    "dd_cluster_sizes" -> ddClusterSizesSql,
    "dd_lsh_audit" -> ddLshAuditSql,
    "dd_shingle_hist" -> ddShingleHistSql,
    "dd_threshold_sweep" -> ddThresholdSweepSql,
    "dd_semantic_clusters" -> ddSemanticClustersSql,
    "dd_modality_agreement" -> ddModalityAgreementSql,
    "dd_cosine_sweep" -> ddCosineSweepSql,
    "dd_components" -> ddComponentsSql)
}
