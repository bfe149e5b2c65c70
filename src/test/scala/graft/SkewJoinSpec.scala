package graft

import graft.operators.{Namespace, SkewJoin}
import org.apache.spark.sql.functions._

/** Salting must spread a hot key across reducers without changing the
  * join result.
  */
class SkewJoinSpec extends SparkSpec {

  test("salted join equals the plain join on a skewed key") {
    // Skew lineitem: ~90% of rows collapse onto order key 0.
    val skewed = Tables.lineitem(spark, sf)
      .withColumn("jk",
        when(col("l_orderkey") % 10 < 9, 0L).otherwise(col("l_orderkey")))
    val right = Tables.orders(spark, sf)
      .withColumn("jk", col("o_orderkey") % 97)
      .select("jk", "o_orderpriority")
      .groupBy("jk").agg(first(col("o_orderpriority")).as("prio"))

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = skewed.join(right, Seq("jk"))
        .groupBy("jk", "prio").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val salted = SkewJoin.saltedJoin(skewed, right, "jk", 16)
        .groupBy("jk", "prio").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(salted == plain)

      // The salted plan really shuffles on (jk, _salt), not jk alone.
      val plan = SkewJoin.saltedJoin(skewed, right, "jk", 16)
        .queryExecution.executedPlan.toString
      assert(plan.contains("_salt"), "salt column absent from the plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted snapshot diff equals the plain diff on a hot-prefix binding") {
    // Deliberately skewed binding: collapse ~90% of snapshot A's keys onto
    // ONE hot path prefix (the hot-version-chain case — duplicate join
    // keys, so one reducer would take ~90% of the A side), then diff
    // against a delta-sized B.
    val keys = ObjectStoreView.keys(spark, sf)
      .select(col("volume"), col("bucket"), col("key"), col("size"))
    val hotA = keys.withColumn("key",
      when(col("size") % 10 < 9, "data/hot/chain.obj").otherwise(col("key")))
    val deltaB = keys.filter(col("size") % 7 === 0)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toString).sorted.toSeq
      val plain = canon(Namespace.snapshotDiff(hotA, deltaB))
      val salted = canon(Namespace.snapshotDiffSalted(hotA, deltaB, 16))
      assert(salted == plain)

      // The salted exchange really partitions on (..., _salt).
      val plan = Namespace.snapshotDiffSalted(hotA, deltaB, 16)
        .queryExecution.executedPlan.toString
      assert(plan.contains("_salt"), "salt column absent from the plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salting bounds the per-salt (per-task) row count of a constructed hot key") {
    val s = spark
    import s.implicits._
    val salts = 8
    // One hot key with 8000 rows, 100 cold keys with 1 row each: unsalted,
    // one reducer takes 8000 rows; salted, the hot key's share per (key,
    // salt) group — i.e. per task after the (key, _salt) exchange — must
    // drop to ~1/salts of that.
    val hot = (1 to 8000).map(i => (0L, i.toLong))
    val cold = (1 to 100).map(i => (i.toLong, 0L))
    val left = (hot ++ cold).toDF("k", "v")
    val right = (0 to 100).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    val joined = SkewJoin.saltedJoin(left, right, "k", salts)
    assert(joined.count() == 8100L)
    // Bound measured on the salted left frame itself (the exchange the
    // straggler task reads): max rows in any (k, _salt) group.
    val saltedLeft = left.withColumn("_salt",
      pmod(hash(col("k"), col("v")), lit(salts)))
    val groups = saltedLeft.groupBy(col("k"), col("_salt"))
      .agg(count(lit(1)).as("n")).collect()
    val hotGroups = groups.filter(_.getLong(0) == 0L)
    assert(hotGroups.length == salts,
      s"hot key must spread over all $salts salts, got ${hotGroups.length}")
    val maxPerSalt = hotGroups.map(_.getAs[Long]("n")).max
    assert(maxPerSalt <= 2L * 8000L / salts,
      s"per-salt bound violated: $maxPerSalt rows in one (key, salt) group")
  }

  test("saltedFullOuterJoin matches full_outer across match patterns") {
    val s = spark
    import s.implicits._
    // Left: hot key 1 duplicated heavily + keys with 0/1/2-sided presence.
    val left = ((1 to 500).map(_ => (1L, "a")) ++
      Seq((2L, "b"), (3L, "c"), (3L, "c2"))).toDF("k", "lv")
    val right = Seq((1L, 10L), (3L, 30L), (4L, 40L)).toDF("k", "rv")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val plain = canon(left.join(right, Seq("k"), "full_outer"))
    val salted = canon(SkewJoin.saltedFullOuterJoin(left, right, Seq("k"), 8)
      .select("k", "lv", "rv"))
    assert(salted == plain)
  }
}
