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

  /** Salted FULL OUTER equi-join on a composite key. An outer join cannot
    * simply replicate the right side (unmatched replicas would duplicate),
    * so it decomposes into three salted-safe pieces sharing the two salted
    * inputs:
    *
    *  - MATCHED: the salted inner join (every salt's right replica carries
    *    all right keys, so each left row meets its matches exactly once);
    *  - LEFT-ONLY: a salted LEFT ANTI join (a left row has no match on its
    *    salt iff it has none at all, same replication argument);
    *  - RIGHT-ONLY: a plain RIGHT-side anti join against the left KEYS —
    *    projected to the key columns and deduplicated BEFORE the join, so
    *    the hot key collapses to one row and this piece cannot skew.
    *
    * Cost model: the right side is replicated `salts`× — use when the LEFT
    * side carries the hot keys (the classic hot-prefix / hot-version-chain
    * case) and the right fits `salts`-fold in the cluster. Result-identical
    * to `left.join(right, keys, "full_outer")` (spec-pinned).
    */
  def saltedFullOuterJoin(left: DataFrame, right: DataFrame,
      keys: Seq[String], salts: Int): DataFrame = {
    require(salts > 0 && keys.nonEmpty)
    val saltedLeft = left.withColumn("_salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    val joinCols = keys :+ "_salt"
    val matched = saltedLeft.join(replicatedRight, joinCols).drop("_salt")
    val leftOnly = saltedLeft
      .join(replicatedRight, joinCols, "left_anti").drop("_salt")
      .select(left.columns.map(col) ++ right.schema
        .filterNot(f => keys.contains(f.name))
        .map(f => lit(null).cast(f.dataType).as(f.name)): _*)
    val rightOnly = right
      .join(left.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .select(keys.map(col) ++ left.schema
        .filterNot(f => keys.contains(f.name))
        .map(f => lit(null).cast(f.dataType).as(f.name)) ++ right.schema
        .filterNot(f => keys.contains(f.name))
        .map(f => col(f.name)): _*)
    matched.unionByName(leftOnly).unionByName(rightOnly)
  }
}
