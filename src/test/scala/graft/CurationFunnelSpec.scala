package graft

import graft.operators.{Pipeline, TextOps}
import org.apache.spark.sql.functions._

/** Lexical-diversity signals (tx_diversity) and the staged curation funnel
  * (pipe_dedup_funnel): algebraic invariants that must hold on any corpus,
  * plus consistency with the per-doc curation verdicts they derive from.
  */
class CurationFunnelSpec extends SparkSpec {
  import spark.implicits._

  test("diversity: bounds and degenerate-distribution identities") {
    val rows = TextOps.txDiversity(spark, sf)
      .select("n_tokens", "n_types", "ttr", "simpson", "dominance")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, types, ttr, simpson, dom) =>
      assert(types >= 1 && types <= n)
      assert(ttr > 0 && ttr <= 1)
      assert(simpson >= 0 && simpson < 1)
      assert(dom > 0 && dom <= 1)
      // All-same-word doc: simpson = 0, dominance = 1, and conversely.
      if (types == 1) assert(simpson == 0.0 && dom == 1.0)
      // Simpson <= 1 - 1/n_types (equality at the uniform distribution);
      // slack covers the operator's round-to-6-decimals output contract.
      assert(simpson <= 1.0 - 1.0 / types + 5e-7)
    }
  }

  test("diversity: hand-checked uniform and skewed distributions") {
    // "a b a b": n=4, types=2, counts (2,2) -> simpson = 1 - 8/16 = 0.5.
    val df = Seq((1L, "a b a b"), (2L, "x x x y"))
      .toDF("doc_id", "text")
    // txDiversity reads the documents table, so compute inline with the
    // same kernel: explode -> count -> aggregate.
    val got = df.select(col("doc_id"),
        explode(graft.functions.Codes.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n"), sum(col("c") * col("c")).as("sq"))
      .select(col("doc_id"),
        (lit(1.0) - col("sq").cast("double") / (col("n") * col("n"))).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == 0.5) // uniform over 2 types
    assert(got(2L) == 1.0 - 10.0 / 16.0) // counts (3,1)
  }

  test("funnel: stages shrink monotonically and tie out with pipe_curate") {
    val funnel = Pipeline.pipeDedupFunnel(spark, sf)
      .select("stage_idx", "stage", "docs_out", "removed")
      .as[(Int, String, Long, Long)].collect().sortBy(_._1)
    assert(funnel.map(_._2).toSeq ===
      Seq("raw", "exact_dedup", "near_dedup", "quality_filter"))
    // Monotone non-increasing, removed = successive difference.
    funnel.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur._3 <= prev._3)
      assert(cur._4 === prev._3 - cur._3)
    }
    assert(funnel.head._4 === 0L)
    val curate = Pipeline.pipeCurate(spark, sf)
    assert(funnel.head._3 === curate.count())
    assert(funnel.last._3 === curate.filter(col("kept")).count())
  }
}
