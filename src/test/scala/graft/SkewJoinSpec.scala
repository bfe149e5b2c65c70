package graft

import graft.operators.SkewJoin
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
}
