package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §5 "skewed keys → salting or
  * AQE skew-join"). AQE splits skewed SHUFFLE partitions at runtime, but
  * when one join key alone exceeds an executor (the classic hot-customer /
  * hot-prefix case at 100 TB), pre-salting is the deterministic fix: left
  * rows fan out over `salts` sub-keys, the (small-ish) right side is
  * replicated once per salt, and the hot key's rows land on `salts`
  * reducers instead of one straggler. Result-identical to the plain join.
  */
object SkewJoin {

  /** Inner equi-join of `left` (skewed) with `right` on `key`, salted
    * `salts` ways. The salt is a deterministic hash of the whole left row,
    * so identical plans produce identical partitioning; any salt value
    * yields the same join result because the right side carries all
    * salts.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    val saltedLeft = left.withColumn("_salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }
}
