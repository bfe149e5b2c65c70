package graft

import graft.operators.RelationalExt
import org.apache.spark.sql.functions._

/** The HLL sketch is partitioning-invariant: per-register MAX is
  * associative and commutative, so ANY distribution of the rows — one
  * partition, many, skewed — produces the bit-identical sketch. This is
  * the property that makes the sketch mergeable across 1000 executors
  * (and across separately-sketched shards) at 100 TB.
  */
class HllMergeSpec extends SparkSpec {

  test("sketch is identical under different partitionings") {
    val keyed = Tables.lineitem(spark, sf)
      .select(expr("l_orderkey % 2147483647").as("x"))

    def row(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = RelationalExt.hllSketch(df).head()
      (r.getLong(0), r.getLong(1))
    }

    val base = row(keyed)
    assert(row(keyed.repartition(1)) === base)
    assert(row(keyed.repartition(13)) === base)
    assert(row(keyed.repartition(32, col("x"))) === base)
    // Sharded sketch-merge: union of two disjoint halves re-sketches to
    // the same registers (merge = MAX per register over the union).
    val lo = keyed.filter(col("x") % 2 === 0)
    val hi = keyed.filter(col("x") % 2 === 1)
    assert(row(lo.unionByName(hi)) === base)
  }

  private val P = 2147483647L
  private def aggRegs(df: org.apache.spark.sql.DataFrame): Seq[Int] = {
    val bridge = org.apache.spark.sql.GraftBridge
    df.agg(bridge.column(graft.functions.HllRegAgg(
        bridge.expression(col("x"))).toAggregateExpression()).as("regs"))
      .head().getSeq[Int](0)
  }

  test("HllRegAgg matches the declarative sketch register-for-register") {
    val keyed = Tables.lineitem(spark, sf)
      .select(expr(s"l_orderkey % $P").as("x"))
    // The declarative formulation of the same sketch, built from the same
    // published constants the DuckDB oracle uses.
    val rhoCase = (1 to 14).map(k => s"WHEN h2 >= ${P >> k} THEN $k")
      .mkString("CASE ", " ", " ELSE 15 END")
    val decl = keyed
      .select(
        expr(s"((x*x % $P) * 777777777 + x*123456789 + 987654321) % $P % 1024")
          .as("reg"),
        expr(s"((x*x % $P) * 588888888 + x*22222223 + 11111111) % $P").as("h2"))
      .select(col("reg"), expr(rhoCase).as("rho"))
      .groupBy(col("reg")).agg(max(col("rho")).as("mr"))
      .collect().map(r => r.getLong(0).toInt -> r.getInt(1)).toMap
    val regs = aggRegs(keyed)
    assert(regs.size === 1024)
    regs.zipWithIndex.foreach { case (mr, i) =>
      assert(mr === decl.getOrElse(i, 0), s"register $i")
    }
  }

  test("HllRegAgg is partitioning-invariant (merge law)") {
    val keyed = Tables.lineitem(spark, sf)
      .select(expr(s"l_orderkey % $P").as("x"))
    val base = aggRegs(keyed)
    assert(aggRegs(keyed.repartition(1)) === base)
    assert(aggRegs(keyed.repartition(17)) === base)
    assert(aggRegs(keyed.repartition(32, col("x"))) === base)
  }

  test("HllRegAgg skips NULL keys") {
    import spark.implicits._
    val withNulls = Seq[Option[Long]](Some(5L), None, Some(7L), None)
      .toDF("x")
    val withoutNulls = Seq(5L, 7L).toDF("x")
    assert(aggRegs(withNulls) === aggRegs(withoutNulls))
  }
}
