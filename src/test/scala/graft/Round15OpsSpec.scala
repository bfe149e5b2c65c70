package graft

import graft.operators.{Audit, Containers, Dedup, EventOps, RelationalExt,
  Similarity, TextOps}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Constructed-input specs for the round-15 operators, pinning the exact
  * semantics the DuckDB hash gate can only witness, not explain: the
  * skyline running-max formulation against the quadratic dominance
  * definition, a hand-computed chi-square, hand-counted vowel groups,
  * the burst-vs-mean hot flag, and the conservation laws of the k-NN
  * graph and read-load reports.
  */
class Round15OpsSpec extends SparkSpec {
  import spark.implicits._

  // --- q_skyline -----------------------------------------------------------

  /** Quadratic NOT-EXISTS dominance skyline — the definition, not the
    * algorithm: p survives iff no q has price ≤ AND size ≥ with one strict.
    */
  private def naiveSkyline(parts: org.apache.spark.sql.DataFrame) = {
    val pts = parts.groupBy(
      (col("p_retailprice").cast("decimal(12,2)") * 100).cast("bigint")
        .as("price_cents"),
      col("p_size").cast("bigint").as("psize"))
      .agg(count(lit(1)).as("n_parts"), min(col("p_partkey")).as("min_partkey"))
    val q = pts.select(col("price_cents").as("q_price"), col("psize").as("q_size"))
    pts.join(q,
        col("q_price") <= col("price_cents") && col("q_size") >= col("psize") &&
          (col("q_price") < col("price_cents") || col("q_size") > col("psize")),
        "left_anti")
      .select("price_cents", "psize", "n_parts", "min_partkey")
  }

  test("q_skyline equals the quadratic dominance definition on ties-in-both-dims input") {
    val parts = Seq(
      (1L, 1.00, 10), // frontier (cheapest at size 10 tier? see below)
      (2L, 1.00, 10), // duplicate point — stays, n_parts = 2
      (3L, 1.00, 5),  // same price, smaller — dominated by (1.00, 10)
      (4L, 2.00, 10), // more expensive, same size — dominated by (1.00, 10)
      (5L, 2.00, 15), // frontier: bigger than anything cheaper
      (6L, 0.50, 3),  // frontier: cheapest overall
      (7L, 3.00, 15)  // dominated by (2.00, 15)
    ).toDF("p_partkey", "p_retailprice", "p_size")
    val got = RelationalExt.skylineOf(parts)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = naiveSkyline(parts)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSet == want.toSet)
    assert(got.toSet == Set((50L, 3L, 1L, 6L), (100L, 10L, 2L, 1L),
      (200L, 15L, 1L, 5L)))
  }

  test("q_skyline equals the quadratic dominance definition on the real part table") {
    val parts = Tables.part(spark, sf)
    val got = RelationalExt.skylineOf(parts).drop("n_parts").collect().toSet
    val want = naiveSkyline(parts).drop("n_parts").collect().toSet
    assert(got == want && got.nonEmpty)
  }

  // --- q_revenue_drawdown --------------------------------------------------

  test("q_revenue_drawdown hand-computed series and monotone peak") {
    val d = (day: String, v: Double) =>
      (Timestamp.valueOf(s"$day 00:00:00"), v)
    val orders = Seq(
      d("1995-01-01", 0.10), d("1995-01-02", 0.05),
      d("1995-01-03", 0.20), d("1995-01-04", 0.07))
      .toDF("o_orderdate", "o_totalprice")
    val rows = RelationalExt.drawdownOf(orders).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      ("1995-01-01", 10L, 10L, 0L), ("1995-01-02", 5L, 10L, 5L),
      ("1995-01-03", 20L, 20L, 0L), ("1995-01-04", 7L, 20L, 13L)))
    val real = RelationalExt.qRevenueDrawdown(spark, sf).collect()
    real.sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(0).getAs[Long]("peak_cents") <= w(1).getAs[Long]("peak_cents"),
          "peak must be monotone non-decreasing")
    }
    real.foreach { r =>
      assert(r.getAs[Long]("drawdown_cents") ==
        r.getAs[Long]("peak_cents") - r.getAs[Long]("revenue_cents"))
    }
  }

  // --- ev_ab_significance --------------------------------------------------

  /** Reference arm assignment in exact BigInt arithmetic — the semantics
    * the DECIMAL(38,0)/HUGEINT-widened hash must reproduce for ANY int64
    * id (a plain Long multiply wraps past u ≈ 3.47e9).
    */
  private def arm(u: Long): String =
    if ((BigInt(u) * 2654435761L) % 4294967296L % 100 < 50) "A" else "B"

  test("ev_ab_significance matches a hand-computed chi-square") {
    // Pick deterministic arm members from the same Knuth-hash assignment.
    val as = (0L until 200L).filter(arm(_) == "A").take(10)
    val bs = (0L until 200L).filter(arm(_) == "B").take(10)
    assert(as.size == 10 && bs.size == 10)
    // A: 8 of 10 convert (>= 14 purchases); B: 2 of 10 convert.
    def evs(users: Seq[Long], nConvert: Int): Seq[(Long, String)] =
      users.zipWithIndex.flatMap { case (u, i) =>
        val n = if (i < nConvert) 14 else 1
        Seq.fill(n)((u, "purchase")) :+ ((u, "view"))
      }
    val ev = (evs(as, 8) ++ evs(bs, 2)).toDF("user_id", "event_type")
    val r = EventOps.abSignificanceOf(ev).collect().head
    val (a, b, c, d) = (8L, 2L, 2L, 8L)
    val n = a + b + c + d
    val num = BigInt(n) * BigInt(a * d - b * c).pow(2) * 1000
    val den = BigInt(a + b) * (c + d) * (a + c) * (b + d)
    val chi2Milli = (num / den).toLong // 20*(64-4)^2*1000/10^4 = 7200
    assert(r.getAs[Long]("n_users_a") == 10L && r.getAs[Long]("n_users_b") == 10L)
    assert(r.getAs[Long]("conv_a") == a && r.getAs[Long]("conv_b") == c)
    assert(r.getAs[Long]("chi2_milli") == chi2Milli && chi2Milli == 7200L)
    assert(r.getAs[String]("significant_95") == "y")
    assert(r.getAs[Long]("lift_ppm") == 600000L)
  }

  test("ev_ab_significance degenerate margin yields NULL, not an error") {
    // Everyone converts: b = d = 0 zeroes the (b+d) margin.
    val ev = (0L until 20L).flatMap(u => Seq.fill(14)((u, "purchase")))
      .toDF("user_id", "event_type")
    val r = EventOps.abSignificanceOf(ev).collect().head
    assert(r.isNullAt(r.fieldIndex("chi2_milli")))
    assert(r.getAs[String]("significant_95") == "n")
  }

  test("arm hash matches exact BigInt arithmetic at 2^62-scale ids") {
    // VERDICT r15 #3: in LongType the Knuth multiply wraps past
    // u ≈ 3.47e9 (Spark silently, DuckDB promotes) — the widened hash
    // must agree with exact arithmetic across the whole int64 domain.
    val base = 1L << 62
    val ids = (0L until 64L).map(base + _) ++
      Seq(3470000000L, 4294967295L, 4294967296L, Long.MaxValue - 1)
    val ev = ids.map(u => (u, "view")).toDF("user_id", "event_type")
    val r = EventOps.abSignificanceOf(ev).collect().head
    val expA = ids.count(arm(_) == "A").toLong
    assert(r.getAs[Long]("n_users_a") == expA,
      s"widened hash diverges from BigInt reference at huge ids")
    assert(r.getAs[Long]("n_users_b") == ids.size - expA)
  }

  // --- tx_readability ------------------------------------------------------

  test("tx_readability hand-counted vowel groups and exact formula") {
    val docs = Seq(("en", "banana split")).toDF("lang", "text")
    val r = TextOps.readabilityOf(docs).collect().head
    // "banana": groups a,a,a = 3; "split": i = 1 → 4 syllables, 2 words.
    assert(r.getAs[Long]("n_words") == 2L && r.getAs[Long]("n_syllables") == 4L)
    assert(r.getAs[Long]("wpd_milli") == 2000L)
    assert(r.getAs[Long]("spw_milli") == 2000L)
    assert(r.getAs[Long]("flesch_milli") == 206835L - 2030L - 169200L)
  }

  test("tx_readability consecutive vowels collapse to one group") {
    val docs = Seq(("en", "queue aeiou xyz")).toDF("lang", "text")
    val r = TextOps.readabilityOf(docs).collect().head
    // "queue" = q+ueue → 1 group; "aeiou" → 1; "xyz" → y → 1.
    assert(r.getAs[Long]("n_syllables") == 3L)
  }

  // --- dd_phrase_hotlist ---------------------------------------------------

  test("dd_phrase_hotlist finds the planted boilerplate once per doc") {
    val docs = Seq(
      (1L, "the quick brown fox alpha", "s1"),
      (2L, "the quick brown fox beta", "s1"),
      (3L, "intro the quick brown fox", "s2"),
      // Phrase repeated INSIDE one doc still counts once (distinct-per-doc).
      (4L, "the quick brown the quick brown", "s2"),
      (5L, "completely different words here", "s3"))
      .toDF("doc_id", "text", "source")
    val rows = Dedup.phraseHotlistOf(docs).collect()
    val top = rows.head
    assert(top.getAs[String]("phrase") == "the quick brown")
    assert(top.getAs[Long]("df") == 4L)
    assert(top.getAs[Long]("n_sources") == 2L)
    assert(top.getAs[Long]("share_ppm") == 4L * 1000000L / 5L)
    // Every winner recovers a readable phrase, and the recovered phrase
    // re-hashes to its own code (the kernel and the 3-token fold agree).
    rows.foreach(r => assert(r.getAs[String]("phrase") != null))
    // df is non-increasing down the list and ties break code-ascending.
    rows.sliding(2).foreach { w =>
      if (w.length == 2) {
        val (p, n) = (w(0), w(1))
        assert(p.getAs[Long]("df") > n.getAs[Long]("df") ||
          (p.getAs[Long]("df") == n.getAs[Long]("df") &&
            p.getAs[Long]("code") < n.getAs[Long]("code")))
      }
    }
  }

  // --- q_customer_deciles --------------------------------------------------

  test("q_customer_deciles partitions customers, conserves revenue, and " +
      "its decile 0 equals the topdecile report") {
    val dec = RelationalExt.qCustomerDeciles(spark, sf).collect()
    assert(dec.nonEmpty && dec.length <= 10)
    val perCust = Tables.orders(spark, sf).groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")).as("cents"))
    assert(dec.map(_.getAs[Long]("n_customers")).sum == perCust.count())
    val totalCents = perCust.agg(sum(col("cents"))).collect().head.getLong(0)
    assert(dec.map(_.getAs[Long]("revenue_cents")).sum == totalCents)
    // Rank-descending deal: a decile's floor spend >= the next's ceiling.
    dec.sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(0).getAs[Long]("min_cents") >= w(1).getAs[Long]("max_cents"))
    }
    // Cumulative share is monotone and ends within rounding of 1e6.
    val cums = dec.map(_.getAs[Long]("cum_share_ppm"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(cums.last <= 1000000L && cums.last > 1000000L - dec.length)
    // Cross-operator law: decile 0 IS the topdecile report row (both
    // membership closed forms reduce to ceil(n/10)).
    val top = RelationalExt.qRevenueTopdecile(spark, sf).collect().head
    val d0 = dec.head
    assert(d0.getAs[Long]("decile") == 0L)
    assert(d0.getAs[Long]("n_customers") == top.getAs[Long]("n_top"))
    assert(d0.getAs[Long]("revenue_cents") == top.getAs[Long]("top_cents"))
  }

  // --- ns_prefix_hotspot ---------------------------------------------------

  test("ns_prefix_hotspot hot flag is peak-vs-mean, not volume") {
    def e(min: String, op: String, pfx: String): (Timestamp, String, String,
        String, String, String, String) =
      (Timestamp.valueOf(s"2024-01-01 $min:00"), "u1", op, "SUCCESS",
        "vol0", "b0", pfx)
    val audit = (
      // bursty: 10 reads in one minute, 1 in each of two others → 30 > 24
      Seq.fill(10)(e("00:01", "READ_KEY", "data/2024/01")) ++
        Seq(e("00:02", "READ_KEY", "data/2024/01"),
          e("00:03", "COMMIT_KEY", "data/2024/01")) ++
        // flat: 4 per minute across 3 minutes → peak·m = 12 ≤ 2·total = 24.
        Seq.fill(4)(e("01:01", "READ_KEY", "data/2024/02")) ++
        Seq.fill(4)(e("01:02", "READ_KEY", "data/2024/02")) ++
        Seq.fill(4)(e("01:03", "LIST_KEYS", "data/2024/02"))
      ).toDF("ts_minute", "user", "op", "result", "volume", "bucket", "prefix")
    val rows = Audit.prefixHotspotOf(audit).collect()
      .map(r => r.getAs[String]("prefix") -> r).toMap
    val hot = rows("data/2024/01")
    assert(hot.getAs[Long]("n_requests") == 12L)
    assert(hot.getAs[Long]("n_reads") == 11L && hot.getAs[Long]("n_writes") == 1L)
    assert(hot.getAs[Long]("peak_per_minute") == 10L)
    assert(hot.getAs[Long]("active_minutes") == 3L)
    assert(hot.getAs[String]("hot_flag") == "y") // 10·3 = 30 > 2·12 = 24
    val flat = rows("data/2024/02")
    assert(flat.getAs[Long]("n_requests") == 12L)
    assert(flat.getAs[String]("hot_flag") == "n") // 4·3 = 12 ≤ 24
  }

  // --- ct_read_load --------------------------------------------------------

  test("ct_read_load shares are a floored partition of 1e6 over ≤20 nodes") {
    val rows = Containers.ctReadLoad(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getAs[Long]("node_id")).distinct.length == rows.length)
    rows.foreach { r =>
      val id = r.getAs[Long]("node_id")
      assert(id >= 0 && id < 20)
      assert(r.getAs[Long]("read_exposure") > 0L)
      assert(r.getAs[Long]("n_container_replicas") > 0L)
    }
    val share = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(share <= 1000000L && share > 1000000L - rows.length,
      s"floored shares must sum to within ${rows.length} ppm of 1e6, got $share")
  }

  // --- sim_knn_graph -------------------------------------------------------

  test("sim_knn_graph conserves nodes and edges; mutuality is symmetric") {
    val rows = Similarity.simKnnGraph(spark, sf).collect()
    assert(rows.nonEmpty)
    val nNodes = rows.map(_.getAs[Long]("n_nodes")).sum
    val sample = Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 256).count()
    assert(nNodes == sample, "labels partition the node sample")
    val nEdges = rows.map(_.getAs[Long]("n_edges")).sum
    assert(nEdges == 5L * nNodes, "every node emits exactly k out-edges")
    val mutual = rows.map(_.getAs[Long]("mutual_edges")).sum
    assert(mutual % 2 == 0, "mutual ordered edges come in pairs globally")
    rows.foreach { r =>
      assert(r.getAs[Long]("mutual_edges") <= r.getAs[Long]("n_edges"))
      assert(r.getAs[Long]("same_label_edges") <= r.getAs[Long]("n_edges"))
      assert(r.getAs[Long]("reciprocity_ppm") <= 1000000L)
      assert(r.getAs[Long]("homophily_ppm") <= 1000000L)
    }
  }
}
