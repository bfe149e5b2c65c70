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
}
