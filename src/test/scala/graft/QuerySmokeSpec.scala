package graft

/** Every registered query runs on sf0.001 and produces a sane result; the
  * value-level correctness gate is the DuckDB oracle (tools/check.py + the
  * driver), so this spec guards execution, schemas, and non-emptiness.
  */
class QuerySmokeSpec extends SparkSpec {

  // Queries whose result can legitimately be empty at sf0.001
  // (dd_substring_containment: the synthetic corpus has no verbatim
  // quoted-inside pairs — WinnowSpec proves the detection path on
  // constructed ones).
  private val mayBeEmpty = Set("dd_embed_cosine", "ns_expired_open_keys",
    "q_cust_no_orders", "dd_ngram_jaccard", "dd_minhash_lsh",
    "dd_substring_containment")

  test("every query key has an oracle or is a documented rows-only check") {
    val rowsOnly = Set("q_approx_distinct")
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == rowsOnly,
      s"undocumented rows-only queries: ${noOracle -- rowsOnly}")
    val danglingOracles = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(danglingOracles.isEmpty)
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes with non-empty schema${if (mayBeEmpty(name)) "" else " and rows"}") {
      val df = fn(spark, sf)
      assert(df.schema.fields.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows at sf0.001")
    }
  }
}
