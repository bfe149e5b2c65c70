package graft

import graft.operators.{Namespace, PrefixScan}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.Random

/** PrefixScan.scanState must be bit-identical to the naive
  * Window.partitionBy(group).orderBy(order) formulation it replaces
  * (rank, exclusive running sum, group total), including across shard
  * boundaries, for skewed group sizes, and for single-row groups.
  */
class PrefixScanSpec extends SparkSpec {
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("g")).orderBy(col("k").asc)
    df.withColumn("rnk", row_number().over(w).cast("bigint"))
      .withColumn("cum", coalesce(
        sum(col("v")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
  }

  private def distributed(df: org.apache.spark.sql.DataFrame) =
    PrefixScan.scanState(df, Seq("g"), Seq(col("k")), col("v"),
      rankOut = Some("rnk"), cumOut = Some("cum"), totalOut = Some("n"))

  test("rank/cum/total match the window formulation on skewed random data") {
    val rnd = new Random(7)
    // Heavily skewed: group 0 holds ~80% of rows; unique order key k.
    val rows = (1 to 2000).map { k =>
      val g = if (rnd.nextInt(10) < 8) 0 else 1 + rnd.nextInt(4)
      (g, k, rnd.nextInt(1000).toLong)
    }
    val df = rows.toDF("g", "k", "v").repartition(8)
    val exp = naive(df).orderBy("g", "k").collect()
    val got = distributed(df).select("g", "k", "v", "rnk", "cum", "n")
      .orderBy("g", "k").collect()
    assert(got.toSeq == exp.toSeq)
  }

  test("single-row groups and a single shard degenerate correctly") {
    val df = Seq((1, 10, 5L), (2, 20, 7L), (3, 30, 9L)).toDF("g", "k", "v")
      .coalesce(1)
    val got = distributed(df).select("g", "rnk", "cum", "n").orderBy("g")
      .as[(Int, Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1, 1L, 0L, 1L), (2, 1L, 0L, 1L), (3, 1L, 0L, 1L)))
  }

  test("compaction plan equals its naive window formulation") {
    val keys = ObjectStoreView.keys(spark, sf)
    val w = Window.partitionBy(col("volume"), col("bucket"))
      .orderBy(col("key").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val naivePlan = keys
      .withColumn("bytes_before", coalesce(sum(col("size")).over(w), lit(0L)))
      .withColumn("group_id",
        floor(col("bytes_before") / 1000000000L).cast("bigint"))
      .groupBy(col("volume"), col("bucket"), col("group_id"))
      .agg(count(lit(1)).as("n_objects"), sum(col("size")).as("group_bytes"),
        min(col("key")).as("first_key"), max(col("key")).as("last_key"))
      .orderBy(col("volume").asc, col("bucket").asc, col("group_id").asc)
    val got = Namespace.compactionPlan(keys, 1000000000L).collect()
    assert(got.toSeq == naivePlan.collect().toSeq)
  }

  test("output is invariant to the shuffle-partition count (shard layout)") {
    // Shard boundaries come from repartitionByRange, whose partition count
    // follows spark.sql.shuffle.partitions — results must not depend on it
    // (the offsets must compose correctly for ANY shard layout).
    val rnd = new Random(11)
    val rows = (1 to 500).map(k => (rnd.nextInt(3), k, rnd.nextInt(100).toLong))
    val df = rows.toDF("g", "k", "v").repartition(5)
    val conf = spark.conf.get("spark.sql.shuffle.partitions")
    def result(n: String) = {
      spark.conf.set("spark.sql.shuffle.partitions", n)
      try distributed(df).select("g", "k", "v", "rnk", "cum", "n")
        .orderBy("g", "k").collect().toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", conf)
    }
    assert(result("1") == result("3") && result("3") == result("13"))
  }

  test("correct with exchange reuse disabled (independent range sampling)") {
    // With spark.sql.exchange.reuse=false the offsets and probe branches
    // would evaluate the range shuffle independently (different sampled
    // boundaries → silent baseline mis-alignment); scanState materializes
    // the sharded frame in that configuration — output must still equal
    // the window formulation bit-for-bit.
    val rnd = new Random(23)
    val rows = (1 to 800).map(k => (rnd.nextInt(4), k, rnd.nextInt(500).toLong))
    val df = rows.toDF("g", "k", "v").repartition(7)
    val key = "spark.sql.exchange.reuse"
    val before = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val got = distributed(df).select("g", "k", "v", "rnk", "cum", "n")
        .orderBy("g", "k").collect()
      val exp = naive(df).orderBy("g", "k").collect()
      assert(got.toSeq == exp.toSeq)
    } finally spark.conf.set(key, before)
  }

  test("no corpus window partitioned only by the group keys remains") {
    // The rewritten plans' corpus-side windows must include the range-shard
    // column; per-group-only windows may appear solely over the aggregated
    // metadata frame (tiny). Detect via the partition spec arity: every
    // Window whose partition spec is exactly the group keys must sit above
    // an Aggregate.
    val plan = Namespace.compactionPlan(
      ObjectStoreView.keys(spark, sf), 1000000000L)
      .queryExecution.optimizedPlan
    val bad = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.nonEmpty &&
            !w.partitionSpec.exists(_.references.exists(
              _.name.contains("__ps_shard"))) &&
            !w.child.exists(
              _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Aggregate]) =>
        w
    }
    assert(bad.isEmpty,
      s"corpus-sized window without shard key: ${bad.mkString("; ")}")
  }
}
