package graft

import graft.operators.{Dedup, EventOps, Pipeline, RelationalExt, Similarity, TextOps}
import org.apache.spark.sql.functions._

/** Invariants for the r9 audit/report operators beyond the DuckDB oracle
  * gate: sliding windows vs Spark's built-in hopping `window()`, budget
  * selection vs a locally-recomputed greedy reference, and internal
  * consistency between each audit report and the frames it audits.
  */
class ReportOpsSpec extends SparkSpec {

  test("ev_sliding_counts matches the built-in hopping window() formulation") {
    val builtin = EventOps.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"))
    val mine = EventOps.evSlidingCounts(spark, sf)
      .select("window_start", "event_type", "n_events")
    assert(mine.exceptAll(builtin).isEmpty, "rows not in built-in window()")
    assert(builtin.exceptAll(mine).isEmpty, "built-in window() rows missing")
  }

  test("ev_session_stats agrees with the sessionize frame") {
    val stats = EventOps.evSessionStats(spark, sf).collect().head
    val sessions = EventOps.evSessionize(spark, sf)
    assert(stats.getAs[Long]("n_sessions") == sessions.count())
    assert(stats.getAs[Long]("n_single_event") ==
      sessions.filter(col("n_events") === 1).count())
    assert(stats.getAs[Long]("p50_events") <= stats.getAs[Long]("p90_events"))
    assert(stats.getAs[Long]("p50_duration_s") <=
      stats.getAs[Long]("p90_duration_s"))
  }

  test("pipe_token_budget matches a locally-recomputed greedy reference") {
    val rows = Pipeline.pipeTokenBudget(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    val budget = total * 60 / 100
    var cum = 0L
    rows.sortBy(r => (-r.getAs[Double]("quality_score"), r.getAs[Long]("doc_id")))
      .foreach { r =>
        assert(r.getAs[Long]("cum_before") == cum,
          s"doc ${r.getAs[Long]("doc_id")} cum_before")
        val n = r.getAs[Long]("n_tokens")
        assert(r.getAs[Boolean]("selected") == (cum + n <= budget),
          s"doc ${r.getAs[Long]("doc_id")} selected")
        cum += n
      }
    val selectedTokens = rows.filter(_.getAs[Boolean]("selected"))
      .map(_.getAs[Long]("n_tokens")).sum
    assert(selectedTokens <= budget, "selection overshoots the budget")
  }

  test("sim_cluster_purity partitions every vector and bounds purity") {
    val purity = Similarity.simClusterPurity(spark, sf)
    val nVecs = Tables.embeddings(spark, sf).count()
    val summed = purity.agg(sum(col("n_vectors"))).collect().head.getLong(0)
    assert(summed == nVecs, "cells do not partition the vector set")
    assert(purity.filter(col("purity_ppm") <= 0 ||
      col("purity_ppm") > 1000000).isEmpty)
    assert(purity.filter(col("n_labels") < 1).isEmpty)
  }

  test("sim_ivf_balance partitions the corpus; load is share x cells") {
    val bal = Similarity.simIvfBalance(spark, sf).collect()
    val corpus = Tables.embeddings(spark, sf)
      .filter(col("vec_id") >= 10).count()
    assert(bal.map(_.getAs[Long]("n_vecs")).sum == corpus,
      "cells must partition the corpus vectors")
    // The served index has 16 trained centroids; at this sf every cell
    // is populated, so the row count equals the load denominator. A
    // future data change that empties a cell must fail here loudly (the
    // denominator is the model's cell count, not the non-empty count).
    assert(bal.length == 16, s"expected all 16 cells populated, got ${bal.length}")
    val nCells = 16L
    val shareSum = bal.map(_.getAs[Long]("share_ppm")).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - nCells,
      s"floored shares must sum to within $nCells ppm of 1e6, got $shareSum")
    bal.foreach { r =>
      val (share, load) =
        (r.getAs[Long]("share_ppm"), r.getAs[Long]("load_ppm"))
      assert(math.abs(load - share * nCells) < nCells,
        s"load_ppm must be share x n_cells up to flooring: $load vs $share x $nCells")
    }
    // Sorted hottest-first; the hottest cell is at or above uniform load.
    assert(bal.head.getAs[Long]("load_ppm") >= 1000000L - nCells)
    assert(bal.map(_.getAs[Long]("n_vecs")).toSeq ==
      bal.map(_.getAs[Long]("n_vecs")).toSeq.sorted.reverse)
  }

  test("dd_lsh_audit is consistent with the candidate and verify stages") {
    val audit = Dedup.ddLshAudit(spark, sf).collect().head
    val nCand = Dedup.ddMinhashLsh(spark, sf).count()
    assert(audit.getAs[Long]("n_candidates") == nCand)
    val nVerified = Dedup.ddNgramJaccard(spark, sf).count()
    assert(audit.getAs[Long]("n_verified") == nVerified,
      "ppm-floored >= 0.6 must agree with the rounded-double verify")
    assert(audit.getAs[Long]("mean_abs_err_ppm") <=
      audit.getAs[Long]("max_abs_err_ppm"))
  }

  test("sim_range_search mean recall clears the 70% floor its gauge gates") {
    // The r10 weak grade: 2x6-plane Hamming-1 probing recalled ~39% mean.
    // The shipped Hamming-<=2 multi-probe must hold >= 700000 ppm mean.
    // Floor derivation (ADVICE r11): measured ~810000 ppm at sf0.001 and
    // sf0.01 and ~770000 ppm at sf0.1 — the floor is the WORST measured
    // sf minus 70000 ppm headroom for testdata-regeneration drift, and
    // both the tuning sf (0.1) and the cheap sf (0.001) are asserted so
    // the margin claim itself stays tested, not just documented.
    Seq(sf, "/root/testdata/sf0.1").foreach { d =>
      val audit = Similarity.simRangeAudit(spark, d)
        .agg(avg(col("recall_ppm"))).collect().head.getDouble(0)
      assert(audit >= 700000.0, s"mean range recall $audit ppm < 700000 at $d")
    }
  }

  test("sim_knn_ivfpq ranks are well-formed and audited in the recall report") {
    val res = Similarity.simKnnIvfPq(spark, sf).collect()
    res.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      val ranks = rows.map(_.getAs[Long]("rk")).sorted
      assert(ranks.length <= 3 && ranks.sameElements(1L to ranks.length),
        s"query $q ranks: ${ranks.mkString(",")}")
      val byRank = rows.sortBy(_.getAs[Long]("rk"))
        .map(_.getAs[Double]("approx_cos"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"query $q scores not non-increasing")
    }
    val methods = Similarity.simRecallReport(spark, sf)
      .select("method").distinct().collect().map(_.getString(0)).toSet
    assert(methods == Set("lsh", "ivf", "pq", "ivfpq"))
  }

  /** The sweep's nprobe=2 row IS the production simKnnIvf pipeline (same
    * centroids, probe rule, top-3): its hit count must equal the recall
    * report's summed ivf hits. Across depths, recall and scanned fraction
    * are monotone non-decreasing in nprobe — the curve the sweep exists
    * to expose.
    */
  test("sim_probe_sweep reconciles with simKnnIvf recall and is monotone") {
    val rows = Similarity.simProbeSweep(spark, sf).collect()
      .map(r => r.getAs[Long]("nprobe") ->
        (r.getAs[Long]("n_hits"), r.getAs[Long]("n_scanned"))).toMap
    assert(rows.keySet == Set(1L, 2L, 4L))
    val ivfHits = Similarity.simRecallReport(spark, sf)
      .filter(org.apache.spark.sql.functions.col("method") === "ivf")
      .agg(org.apache.spark.sql.functions.sum("n_hits")).collect()(0).getLong(0)
    assert(rows(2L)._1 == ivfHits,
      s"nprobe=2 hits ${rows(2L)._1} != recall report ivf hits $ivfHits")
    assert(rows(1L)._1 <= rows(2L)._1 && rows(2L)._1 <= rows(4L)._1,
      s"recall not monotone: $rows")
    assert(rows(1L)._2 < rows(2L)._2 && rows(2L)._2 < rows(4L)._2,
      s"scan cost not strictly growing: $rows")
  }

  /** More PQ subspaces must reconstruct better on average (the curve the
    * sweep prices), every config covers the whole corpus, and ppm values
    * stay in [-1e6, 1e6].
    */
  test("sim_pq_m_sweep distortion falls monotonically with subspace count") {
    val rows = Similarity.simPqMSweep(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L))
    val n = rows.head._2._1
    assert(rows.forall(_._2._1 == n), s"corpus coverage differs: $rows")
    val means = rows.map(_._2._2)
    assert(means.zip(means.tail).forall { case (a, b) => a <= b },
      s"mean recon not monotone in M: ${means.mkString(",")}")
    assert(rows.forall { case (_, (_, mean, mn)) =>
      mean.abs <= 1000000L && mn.abs <= 1000000L && mn <= mean })
  }

  test("q_histogram_equidepth buckets are equal-depth and value-ordered") {
    val rows = RelationalExt.qHistogramEquidepth(spark, sf)
      .collect().sortBy(_.getAs[Long]("bucket"))
    val counts = rows.map(_.getAs[Long]("n_rows"))
    assert(counts.sum == Tables.lineitem(spark, sf).count())
    assert(counts.max - counts.min <= 1, "buckets not equal-depth")
    rows.foreach(r => assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi")))
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"),
        "bucket value ranges overlap")
    }
  }

  test("ev_inactive_users anchors at the latest activity") {
    val rows = EventOps.evInactiveUsers(spark, sf).collect()
    assert(rows.exists(_.getAs[Long]("days_inactive") == 0L),
      "some user must carry the stream's latest event")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("churned") ==
        (r.getAs[Long]("days_inactive") >= 30L))
    }
  }

  test("tx_gopher_rules verdict is the conjunction of its flags") {
    val rows = TextOps.txGopherRules(spark, sf).collect()
    rows.foreach { r =>
      val expected = r.getAs[Boolean]("f_word_count") &&
        r.getAs[Boolean]("f_mean_word_len") &&
        r.getAs[Boolean]("f_alpha_ratio") && r.getAs[Boolean]("f_stopwords")
      assert(r.getAs[Boolean]("pass") == expected,
        s"doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Long]("alpha_words") <= r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("stop_hits") <= r.getAs[Long]("n_words"))
    }
    assert(rows.exists(_.getAs[Boolean]("pass")),
      "no document passes — thresholds are miscalibrated for the corpus")
  }

  test("tx_rarity token counts and rank bounds hold") {
    val rarity = TextOps.txRarity(spark, sf)
    val counts = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(graft.functions.Codes.tokens(col("text"))).cast("bigint")
          .as("expected"))
    val joined = rarity.join(counts, "doc_id")
    assert(joined.filter(col("n_tokens") =!= col("expected")).isEmpty,
      "per-doc token count must match the tokenizer")
    val vocabSize = Tables.documents(spark, sf)
      .select(explode(graft.functions.Codes.tokens(col("text"))).as("t"))
      .agg(countDistinct(col("t"))).collect().head.getLong(0)
    assert(rarity.filter(col("mean_rank") < 1.0 ||
      col("mean_rank") > vocabSize.toDouble).isEmpty)
  }
}
