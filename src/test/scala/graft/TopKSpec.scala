package graft

import graft.operators.{GraftTopK, Namespace}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom per-group top-k physical operator: result equality with the
  * window formulation, and the plan shape that justifies it.
  */
class TopKSpec extends SparkSpec {

  test("topKPerGroup equals the window row_number formulation") {
    val keys = ObjectStoreView.keys(spark, sf)
      .select(col("volume"), col("bucket"), col("key"), col("size"))
    val custom = GraftTopK.topKPerGroup(keys, Seq("volume", "bucket"),
      Seq("size" -> true, "key" -> false), 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    val window = keys.withColumn("rn", row_number().over(
        Window.partitionBy(col("volume"), col("bucket"))
          .orderBy(col("size").desc, col("key").asc)))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(custom == window)
    assert(custom.size == 3 * keys.select("volume", "bucket").distinct.count())
  }

  test("plan is partial+final heaps with no window and no corpus sort") {
    val plan = Namespace.nsTopKeysPerBucket(spark, sf)
      .queryExecution.executedPlan.toString
    // Spark prints exec nodes with the "Exec" suffix stripped.
    assert("TopKPerGroup\\b".r.findAllIn(plan).length == 2,
      s"expected partial+final TopKPerGroup nodes:\n$plan")
    assert(!plan.contains("Window"), "per-group top-k fell back to a window")
    // Sorts above the final node (output ordering) and between final and
    // partial (the survivors-only sort the streaming merge requires) are
    // expected; a sort BELOW the partial would mean the corpus was sorted.
    val partialIdx = plan.indexOf("TopKPerGroup",
      plan.indexOf("TopKPerGroup") + 1)
    assert(partialIdx > 0, s"missing partial node:\n$plan")
    assert(plan.indexOf("Sort ", partialIdx) == -1,
      s"found a sort below the partial top-k (corpus sort):\n$plan")
  }

  test("randomized: equals the window formulation for random data and k") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { round =>
      val n = 200 + rnd.nextInt(800)
      val k = 1 + rnd.nextInt(5)
      val nGroups = 1 + rnd.nextInt(8)
      // id makes the order total, so both formulations pick identical rows.
      val rows = (0 until n).map(i =>
        (rnd.nextInt(nGroups).toLong, rnd.nextInt(20).toLong, i.toLong))
      val df = rows.toDF("g", "v", "id").repartition(5)
      val custom = GraftTopK.topKPerGroup(df, Seq("g"),
        Seq("v" -> true, "id" -> false), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val window = df.withColumn("rn", row_number().over(
          Window.partitionBy(col("g"))
            .orderBy(col("v").desc, col("id").asc)))
        .filter(col("rn") <= k).drop("rn")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(custom == window, s"round $round (n=$n k=$k groups=$nGroups)")
    }
  }

  test("high-cardinality groups stay correct through the flush-at-cap path") {
    val s = spark
    import s.implicits._
    // Cap the map-side heap table far below the group count so every
    // partition flushes repeatedly; the streaming final must still merge
    // the duplicated survivors to exactly the window answer.
    spark.conf.set("spark.graft.topk.maxGroupsPerPartition", "64")
    try {
      val rnd = new scala.util.Random(7)
      val rows = (0 until 20000).map(i =>
        (rnd.nextInt(3000).toLong, rnd.nextInt(1000).toLong, i.toLong))
      val df = rows.toDF("g", "v", "id").repartition(7)
      val custom = GraftTopK.topKPerGroup(df, Seq("g"),
        Seq("v" -> true, "id" -> false), 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val window = df.withColumn("rn", row_number().over(
          Window.partitionBy(col("g"))
            .orderBy(col("v").desc, col("id").asc)))
        .filter(col("rn") <= 2).drop("rn")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(custom == window)
    } finally spark.conf.unset("spark.graft.topk.maxGroupsPerPartition")
  }

  test("empty group list is rejected at the API") {
    val keys = ObjectStoreView.keys(spark, sf).select(col("key"), col("size"))
    intercept[IllegalArgumentException] {
      GraftTopK.topKPerGroup(keys, Nil, Seq("size" -> true), 3)
    }
  }

  test("group-key filters push through the custom node") {
    val keys = ObjectStoreView.keys(spark, sf)
      .select(col("volume"), col("bucket"), col("key"), col("size"))
    val filtered = GraftTopK.topKPerGroup(keys, Seq("volume", "bucket"),
      Seq("size" -> true, "key" -> false), 3)
      .filter(col("volume") === "vol1")
    val plan = filtered.queryExecution.optimizedPlan.toString
    // The Filter must sit BELOW TopKPerGroupNode after optimization.
    val topKIdx = plan.indexOf("TopKPerGroup")
    val filterIdx = plan.indexOf("Filter")
    assert(topKIdx >= 0 && filterIdx > topKIdx,
      s"group filter did not push below the top-k node:\n$plan")
    // And the result matches filtering first.
    val a = filtered.collect().map(_.toString).sorted
    val b = GraftTopK.topKPerGroup(keys.filter(col("volume") === "vol1"),
      Seq("volume", "bucket"), Seq("size" -> true, "key" -> false), 3)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("k larger than every group returns all rows") {
    val small = ObjectStoreView.keys(spark, sf).limit(50)
      .select(col("volume"), col("bucket"), col("key"), col("size"))
    val all = GraftTopK.topKPerGroup(small, Seq("volume"),
      Seq("size" -> true, "key" -> false), 1000000).count()
    assert(all == 50)
  }
}
