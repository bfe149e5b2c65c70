package graft

import graft.functions.{CodeKernels, Codes}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The SQL-registered functions evaluate the same kernels as the Scala
  * Column API.
  */
class ExtensionsSpec extends SparkSpec {

  test("graft_fold_code and graft_str_codes are callable from SQL text") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_fold_code('abc', 31, 2147483647) AS f,
        |       graft_str_codes(array('ab', 'c')) AS cs""".stripMargin).head()
    assert(r.getLong(0) ===
      CodeKernels.foldCode(UTF8String.fromString("abc"), 31L, 2147483647L))
    assert(r.getSeq[Long](1) === Seq(
      CodeKernels.strCode(UTF8String.fromString("ab")),
      CodeKernels.strCode(UTF8String.fromString("c"))))
  }

  test("graft_dot_long evaluates the compiled dot kernel from SQL text") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d,
        |       graft_dot_long(array(), array()) AS z""".stripMargin).head()
    assert(r.getLong(0) === 32L)
    assert(r.getLong(1) === 0L)
  }

  test("graft_hll_registers aggregates the same sketch state as the Column API") {
    GraftFunctions.register(spark)
    val ss = spark
    import ss.implicits._
    (1L to 500L).map(i => i * 37 % 1000).toDF("x")
      .createOrReplaceTempView("graft_hll_ext")
    val sqlRegs = spark.sql(
      "SELECT graft_hll_registers(x) AS regs FROM graft_hll_ext")
      .head().getSeq[Int](0)
    val apiRegs = spark.table("graft_hll_ext")
      .agg(graft.functions.HllRegAgg.of(col("x")).as("regs"))
      .head().getSeq[Int](0)
    assert(sqlRegs === apiRegs)
    assert(sqlRegs.length === graft.functions.HllRegAgg.M)
    assert(sqlRegs.exists(_ > 0), "vacuous: no register was hit")
  }

  test("SQL-text dedup fingerprints equal the DataFrame-API dedup keys") {
    GraftFunctions.register(spark)
    Tables.documents(spark, sf).createOrReplaceTempView("graft_docs_ext")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_fold_code(lower(trim(text)), 31, 2147483647) AS h1
        |FROM graft_docs_ext""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaApi = Tables.documents(spark, sf)
      .select(col("doc_id"),
        Codes.foldCode(lower(trim(col("text"))), 31L, Codes.P).as("h1"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaSql === viaApi)
  }

  test("graft_min_hash64, graft_sim_hash16 and graft_eq_count are callable from SQL text") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_min_hash64(array(7L, 11L, 13L)) AS mh,
        |       graft_sim_hash16(array(1L, 3L, 3L)) AS sh,
        |       graft_eq_count(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS eq"""
        .stripMargin).head()
    val xs = Array(7L, 11L, 13L)
    val refMh = (0 until Codes.NumHashes).map(i =>
      xs.map(x => (Codes.A(i) * x + Codes.B(i)) % Codes.P).min)
    assert(r.getSeq[Long](0) === refMh)
    // bits of {1, 3, 3}: bit0 balance +3 -> set; bit1 balance +1 -> set
    assert(r.getLong(1) === 3L)
    assert(r.getLong(2) === 2L)
  }
}
