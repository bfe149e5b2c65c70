package graft

import graft.plans.RangeJoinRule
import org.apache.spark.sql.functions._

/** The optimizer rule turns a naive BETWEEN join into a bucket-blocked
  * equi-join with identical results, and leaves broadcast-size and
  * equi-keyed joins alone.
  */
class RangeJoinRuleSpec extends SparkSpec {

  private def fixtures = {
    import spark.implicits._
    val points = (0L until 2000L).map(i => (i, i * 1000000L)).toDF("pid", "us")
    val intervals = Seq(
      (1L, 50L * 1000000L, 80L * 1000000L),
      (2L, 75L * 1000000L, 75L * 1000000L),
      (3L, 1990L * 1000000L, 2500L * 1000000L),
      (4L, 3000L * 1000000L, 3100L * 1000000L))
      .toDF("iid", "lo", "hi")
    (points, intervals)
  }

  private def withRule[A](body: => A): A = {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(RangeJoinRule.BucketWidthKey, "10000000") // 10 s buckets
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinRule
    try body
    finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq RangeJoinRule)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.unset(RangeJoinRule.BucketWidthKey)
    }
  }

  test("naive BETWEEN join becomes a bucket equi-join with the same result") {
    val (points, intervals) = fixtures
    val cond = col("us") >= col("lo") && col("us") <= col("hi")
    val (plan, got) = withRule {
      val j = points.join(intervals, cond).select("pid", "iid")
      (j.queryExecution.executedPlan.toString,
        j.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    }
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join was not rewritten:\n$plan")
    // Naive evaluation without the rule (BNLJ at this scale) as the oracle.
    val expected = points.join(intervals, cond).select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
    assert(expected.nonEmpty, "test vacuous: no range matches")
    // Boundary rows: an interval starting/ending exactly on a point.
    assert(got.contains((50L, 1L)) && got.contains((80L, 1L)))
    assert(got.contains((75L, 2L))) // zero-width interval
    assert(!got.exists(_._2 == 4L)) // interval beyond the point domain
  }

  test("joins with an equi key or broadcast-size sides are left alone") {
    val (points, intervals) = fixtures
    // Equi conjunct present: the rule must not touch it.
    val equi = withRule {
      points.join(intervals, col("pid") === col("iid") &&
        col("us") >= col("lo"))
        .queryExecution.optimizedPlan.toString
    }
    assert(!equi.contains("graft_bkt"), s"equi join was rewritten:\n$equi")
    // Broadcastable side at the default threshold: BNLJ is the right plan.
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinRule
    try {
      val p = points.join(intervals,
        col("us") >= col("lo") && col("us") <= col("hi"))
        .queryExecution.optimizedPlan.toString
      assert(!p.contains("graft_bkt"),
        s"broadcast-size join was rewritten:\n$p")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq RangeJoinRule)
    }
  }
}
