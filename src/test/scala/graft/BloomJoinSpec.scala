package graft

import graft.operators.{BloomJoin, RelationalExt}
import org.apache.spark.sql.functions._

/** The Bloom runtime pre-filter's two contracts: NEVER a false negative
  * (pruning keeps a superset of the matching rows, so the downstream exact
  * join stays exact), and real pruning on the registered consumer's data
  * (the point of the filter is rows dropped before the exchange).
  */
class BloomJoinSpec extends SparkSpec {

  test("prune never drops a member key, even through a small noisy filter") {
    val members = spark.range(0, 3000, 3).toDF("k") // multiples of 3
    // 64 words = 4096 bits for 1000 keys → ~4 bits/key: a deliberately
    // lossy filter with real false positives, so subset-not-equality is
    // actually exercised.
    val words = BloomJoin.build(members, "k", 64)
    val surv = BloomJoin.prune(spark.range(0, 3000).toDF("k"), "k", words, 64)
      .collect().map(_.getLong(0)).toSet
    val expected = (0L until 3000L by 3).toSet
    assert(expected.subsetOf(surv), "false negative: a member was dropped")
    assert(surv.size < 3000,
      "even a 4-bits/key filter must reject some non-members")
  }

  test("sizeWords scales with the key count and clamps at both ends") {
    assert(BloomJoin.sizeWords(0L) == 4096)
    assert(BloomJoin.sizeWords(16384L) == 4096)      // exactly 16 bits/key
    assert(BloomJoin.sizeWords(1000000L) == 262144)  // next pow2 of 250000
    assert(BloomJoin.sizeWords(Long.MaxValue) == (1 << 20))
    for (n <- Seq(1L, 100000L, 3000000L)) {
      val w = BloomJoin.sizeWords(n)
      assert(w == (1 << 20) || w.toLong * 64L >= 16L * n,
        s"sizeWords($n)=$w under-provisions below the cap")
    }
  }

  test("prune rejects frames whose columns collide with its temporaries") {
    val words = BloomJoin.build(spark.range(10).toDF("k"), "k", 64)
    val bad = spark.range(10).toDF("k").withColumn("_w1", lit(1))
    val e = intercept[IllegalArgumentException] {
      BloomJoin.prune(bad, "k", words, 64)
    }
    assert(e.getMessage.contains("_w1"))
  }

  test("a saturated 1-word filter passes members and stays a superset") {
    val words = BloomJoin.build(spark.range(0, 1000).toDF("k"), "k", 1)
    val surv = BloomJoin.prune(spark.range(0, 2000).toDF("k"), "k", words, 1)
      .count()
    assert(surv >= 1000L && surv <= 2000L)
  }

  test("q_bloom_semijoin equals the plain three-table join in-engine") {
    val bloom = RelationalExt.qBloomSemijoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val cust = Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING")
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount")).cast("decimal(4,2)"))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority").asc).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(bloom == plain)
  }

  test("the pre-filter prunes most non-matching probe rows on real data") {
    val qualOrders = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf)
        .filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"))
    val words = BloomJoin.build(qualOrders, "o_orderkey", 4096)
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"))
    val total = li.count()
    val trueMatches = li.join(qualOrders,
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val surv = BloomJoin.prune(li, "l_orderkey", words, 4096).count()
    assert(surv >= trueMatches, "pruning lost a matching row")
    assert(surv <= trueMatches + (total - trueMatches) / 20,
      s"false-positive rate too high: $surv survivors vs $trueMatches " +
        s"true of $total")
    assert(surv < total / 2,
      s"pre-filter should drop the majority of probe rows ($surv of $total)")
  }
}
