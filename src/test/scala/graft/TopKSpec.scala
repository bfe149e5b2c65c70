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

  test("plan is partial+final heaps with no window and no full sort") {
    val plan = Namespace.nsTopKeysPerBucket(spark, sf)
      .queryExecution.executedPlan.toString
    // Spark prints exec nodes with the "Exec" suffix stripped.
    assert("TopKPerGroup\\b".r.findAllIn(plan).length == 2,
      s"expected partial+final TopKPerGroup nodes:\n$plan")
    assert(!plan.contains("Window"), "per-group top-k fell back to a window")
    // The only sort is the k·|groups|-row output ordering ABOVE the final
    // top-k, never below it (a sort below would mean the corpus was sorted).
    val topKIdx = plan.indexOf("TopKPerGroup")
    val sortIdx = plan.indexOf("Sort ")
    assert(sortIdx == -1 || sortIdx < topKIdx,
      "found a sort below the top-k operator")
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
