package graft

/** Results must be BIT-IDENTICAL across cluster layouts — the property the
  * whole oracle discipline rests on (SURVEY §4): decimal sums are
  * associative, every rank/top-k has a unique tie-break, the distributed
  * prefix scan is shard-invariant. This spec re-runs one representative
  * query per ordering-sensitive family under a different
  * `spark.sql.shuffle.partitions` (a runtime-settable conf, so the same
  * session genuinely re-plans) and asserts row-set equality with the
  * 4-partition baseline. A failure means some operator's output depends on
  * partition count — the class of bug that passes every single-layout test
  * and corrupts results only on the real cluster.
  */
class DeterminismSpec extends SparkSpec {

  // Ordering/aggregation-sensitive representatives: exact ranks (PrefixScan
  // consumers), window tie-breaks, top-k cuts, decimal sums, label
  // propagation, LSH bucketing, the custom top-k operator, sketch merges.
  private val names = Seq(
    "q1_pricing_summary", "q_median_order_value", "q_histogram_equidepth",
    "ev_value_quantiles", "ev_session_stats", "ns_compaction_plan",
    "ns_scan_plan", "ns_top_keys_per_bucket", "pipe_curriculum",
    "pipe_token_budget", "dd_minhash_lsh", "dd_canonical",
    "ev_dau_sketch", "tx_rarity", "sim_knn_ivfpq",
    "ns_acl_effective", "ct_replica_history",
    // r10: last-touch window carry, top-k skew cut, chunk explode + df
    // join, per-column grouped NDV branches, fingerprint-group byte rollup
    "ev_attribution", "q_join_skew", "dd_chunk_exact",
    "q_column_stats", "dd_dup_bytes",
    // r12: scrub sweep = per-container rollup + replica explode + node
    // rollup (two shuffles around an explode — the r11 family's cheap
    // ordering-sensitive representative)
    "ct_scrub_report",
    // r12 growth: the incremental-ingest gate rides an eager
    // localCheckpoint pinned to a (band, sig) repartition plus broadcast
    // index joins — the one query whose plan depends on a materialized
    // RDD's preserved partitioning
    "dd_incremental",
    // r12 growth: delta-merge full-outer join of two aggregates
    "ns_du_incremental",
    // r13: three-config LSH bucketing + shared verify join — bucket
    // membership and pair expansion must not depend on the layout
    "dd_band_sweep",
    // r13: per-(nprobe, query) rank windows over a tagged explode
    "sim_probe_sweep",
    // r13: month-rank window feeding exact-integer regression sums
    "ns_quota_exhaustion",
    // r13: (cfg, vec, m) rank window over a multi-width slice explode
    "sim_pq_m_sweep",
    // r14: bit_or bitmap build + 3 broadcast bit-test joins — word-map
    // content and the pruned row set must not depend on the layout
    "q_bloom_semijoin",
    // r14: label-propagation cluster sizes folded into integer weights
    "pipe_dedup_weights",
    // r14: MaxBucket-capped pair expansion + integer containment division
    "dd_containment",
    // r14: per-cluster best-pick window with (tokens, doc_id) tie-break
    "dd_rep_selection",
    // r14: two-level decimal-partial merge — associativity is the claim
    "q1_incremental",
    // r14: posexplode + map-side-combined per-dim aggregates
    "sim_dim_stats",
    // r14: tie-exact nearest-rank cutoff over the activity histogram
    "ev_power_law",
    // r15: TakeOrdered rank-20 cut with (df DESC, phrase ASC) tie-break
    // over a two-level string-keyed aggregate
    "dd_phrase_hotlist",
    // r15: running-max window over the aggregated distinct-price frame +
    // broadcast frontier-test join
    "q_skyline",
    // r15: cosine rank windows with 6-decimal round + id tie-break, then
    // a self-join for mutuality — edge sets must not depend on layout
    "sim_knn_graph")

  private def rows(name: String): Set[String] =
    SparkEntry.queries(name)(spark, sf).collect()
      .map(_.toSeq.map(String.valueOf).mkString("\u0000")).toSet

  names.foreach { name =>
    test(s"$name is invariant to the shuffle-partition count") {
      val conf = spark.conf
      val before = conf.get("spark.sql.shuffle.partitions")
      val base = rows(name)
      try {
        conf.set("spark.sql.shuffle.partitions", "7")
        assert(rows(name) == base, s"$name differs at 7 shuffle partitions")
        conf.set("spark.sql.shuffle.partitions", "13")
        assert(rows(name) == base, s"$name differs at 13 shuffle partitions")
      } finally conf.set("spark.sql.shuffle.partitions", before)
    }
  }

  /** r12: the representative set above proves the ordering-sensitive
    * families at three layouts; this sweep extends the invariance gate to
    * EVERY other registered query at two (4-partition baseline vs 7) — a
    * query whose output depends on partition count is exactly the bug
    * class that passes every single-layout test and corrupts results only
    * on the real cluster, so the property is worth the ~3 min it costs.
    * Failures accumulate and report together.
    */
  test("EVERY registered query is invariant to the shuffle-partition count") {
    val rest = SparkEntry.queries.keySet -- names
    val conf = spark.conf
    val before = conf.get("spark.sql.shuffle.partitions")
    val diffs = rest.toSeq.sorted.flatMap { name =>
      val base = rows(name)
      conf.set("spark.sql.shuffle.partitions", "7")
      val alt = try rows(name)
        finally conf.set("spark.sql.shuffle.partitions", before)
      if (alt == base) None
      else Some(s"$name: ${(base diff alt).size} rows only at 4p, " +
        s"${(alt diff base).size} rows only at 7p")
    }
    assert(diffs.isEmpty,
      s"${diffs.size} queries depend on the shuffle layout:\n${
        diffs.mkString("\n")}")
  }
}
