package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PlanDoctor flags the known scale-killers and stays quiet on clean
  * plans — each check is exercised with a minimal positive AND a
  * minimal negative.
  */
class PlanDoctorSpec extends SparkSpec {

  private def codes(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
    PlanDoctor.report(df).collect().map(r => (r.getString(0), r.getString(1))).toSeq

  test("flags a cartesian product as ERROR") {
    val conf = spark.conf
    val before = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val cs = codes(spark.range(100).crossJoin(spark.range(100).toDF("j")))
      assert(cs.contains(("ERROR", "CARTESIAN_PRODUCT")), s"got $cs")
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  test("flags an unpartitioned window over unaggregated input, not over an aggregate") {
    val raw = spark.range(100).toDF("id")
      .withColumn("r", row_number().over(Window.orderBy(col("id"))))
    assert(codes(raw).contains(("ERROR", "UNPARTITIONED_WINDOW")))
    val agged = spark.range(100).toDF("id")
      .groupBy(col("id") % 7).agg(count(lit(1)).as("n"))
      .withColumn("c", sum(col("n")).over(
        Window.orderBy(col("n")).rowsBetween(Window.unboundedPreceding, 0)))
    assert(!codes(agged).contains(("ERROR", "UNPARTITIONED_WINDOW")),
      "group-bounded window over an aggregate must not be flagged")
  }

  test("flags an unpartitioned window when a join above the aggregate re-expands cardinality") {
    // agg bounds cardinality ... then joining back against the
    // UNAGGREGATED corpus re-expands: the aggregate no longer bounds the
    // window's direct input.
    val corpus = spark.range(1000).toDF("id").withColumn("g", col("id") % 7)
    val agged = corpus
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
      .join(corpus, "g")
      .withColumn("r", row_number().over(Window.orderBy(col("id"))))
    assert(codes(agged).contains(("ERROR", "UNPARTITIONED_WINDOW")),
      "corpus join between aggregate and window defeats the bound")
    // ... while a bounded fan-out over the aggregate (explode of a
    // group-bounded frame, the pipe_dedup_funnel / ct_balancer_moves
    // shape) stays unflagged.
    val bounded = corpus
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
      .withColumn("x", explode(array(lit(1), lit(2))))
      .withColumn("r", row_number().over(Window.orderBy(col("x"), col("g"))))
    assert(!codes(bounded).contains(("ERROR", "UNPARTITIONED_WINDOW")),
      "bounded explode over an aggregate must not be flagged")
  }

  test("scans plans inside subquery expressions") {
    val conf = spark.conf
    val before = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.range(100).toDF("a").createOrReplaceTempView("pd_sub_a")
      spark.range(100).toDF("b").createOrReplaceTempView("pd_sub_b")
      val df = spark.sql(
        """SELECT id FROM range(10)
          |WHERE id < (SELECT count(*) FROM pd_sub_a JOIN pd_sub_b)""".stripMargin)
      assert(codes(df).contains(("ERROR", "CARTESIAN_PRODUCT")),
        "cartesian product hidden in a scalar subquery must be flagged")
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  test("warns on a shuffle carrying string payload columns") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", "long payload"), ("b", "text")).toDF("k", "payload")
      .repartition(col("k"))
    assert(codes(df).contains(("WARN", "WIDE_SHUFFLE_ROW")))
  }

  test("a clean numeric aggregate yields no findings") {
    val df = spark.range(1000).toDF("id")
      .groupBy(col("id") % 13).agg(sum(col("id")).as("s"))
    assert(codes(df).isEmpty, s"unexpected findings: ${codes(df)}")
  }

  test("warns on a nested-loop join and registered allowlisted plans stay ERROR-free") {
    val s = spark
    import s.implicits._
    val small = Seq(1L, 2L).toDF("b")
    val nlj = spark.range(100).crossJoin(broadcast(small))
    assert(codes(nlj).contains(("WARN", "NESTED_LOOP_JOIN")))
    // The registered sweep: every query in the registry is ERROR-free
    // (the WARN classes are allowlisted per-operator in PlanShapeSpec).
    val errs = Seq("q5_local_supplier_volume", "dd_band_sweep",
      "sim_probe_sweep", "ns_compaction_plan").flatMap { n =>
      codes(SparkEntry.queries(n)(spark, sf)).filter(_._1 == "ERROR")
        .map(c => s"$n: $c")
    }
    assert(errs.isEmpty, errs.mkString("; "))
  }
}
