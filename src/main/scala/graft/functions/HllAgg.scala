package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** HyperLogLog register aggregate over a deterministic bigint key in
  * [0, [[HllRegAgg.P]]): the 1024 max-rank registers of the integer
  * sketch shared with the SQL/declarative HLL forms in
  * [[graft.operators.RelationalExt]] (same hash constants, same rho
  * ladder), maintained in a single 1 KiB byte buffer.
  *
  * This is the 100 TB ANALYZE kernel: per input row the update is ~20
  * long ops against a constant-size buffer, partials merge by elementwise
  * max under ANY partitioning, and the shuffle carries 1 KiB per column
  * instead of an exploded (col, register, rank) row stream. The
  * declarative explode-then-groupBy formulation of the same sketch pays a
  * ×columns Generate plus a 66M-row hash-aggregate probe at sf0.1 — this
  * aggregate replaces all of that with a tight JVM loop (measured ~6×
  * on q_column_stats_approx).
  *
  * Result: `array<int>` of length 1024; element = max rho seen for that
  * register (1..15), 0 = register never hit. NULL keys are skipped —
  * count them with a separate declarative `sum(when(isNull))` riding the
  * same aggregate. Estimator arithmetic stays OUTSIDE (a 1024-element
  * fold over this array on the one output row), so the estimate remains
  * bit-identical with the DuckDB oracle twin built from the same
  * constants.
  */
case class HllRegAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  import HllRegAgg.{M, P}

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      // x < P, so every product below stays inside signed 64-bit.
      val xx = x * x % P
      val reg = ((xx * 777777777L + x * 123456789L + 987654321L) % P % M).toInt
      val h2 = (xx * 588888888L + x * 22222223L + 11111111L) % P
      // rho = smallest k in 1..14 with h2 >= P >> k, else 15 — the
      // CASE ladder of the SQL twin as a loop.
      var rho = 15
      var k = 1
      while (k <= 14) {
        if (h2 >= (P >> k)) { rho = k; k = 15 } else k += 1
      }
      if (rho > buf(reg)) buf(reg) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](M)
    var i = 0
    while (i < M) { out(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_hll_regs"
}

object HllRegAgg {
  /** Modulus shared with the SQL sketch forms (2^31 − 1). */
  val P = 2147483647L
  /** Register count (2^10). */
  val M = 1024

  /** Column form: the register array of `key` (a bigint in [0, P)). */
  def of(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(
      HllRegAgg(org.apache.spark.sql.GraftBridge.expression(key))
        .toAggregateExpression())

  /** Fold a `regs` array column to the hit-register count. */
  val hitFoldSql: String =
    "aggregate(regs, CAST(0 AS BIGINT), (a, r) -> a + IF(r > 0, 1L, 0L))"

  /** Fold a `regs` array column to Σ 2^(15−mr) over hit registers. */
  val denomHitFoldSql: String =
    "aggregate(regs, CAST(0 AS BIGINT), (a, r) -> a + " +
      "IF(r > 0, CAST(32768 / POWER(2, r) AS BIGINT), 0L))"

  /** DuckDB twins of the register arithmetic, over a key column `x`:
    * identical constants, so estimates hash-match across engines.
    */
  val hashSql = s"((x * x % $P) * 777777777 + x * 123456789 + 987654321) % $P"
  val rankHashSql = s"((x * x % $P) * 588888888 + x * 22222223 + 11111111) % $P"
  val rhoCaseSql: String = (1 to 14)
    .map(k => s"WHEN h2 >= ${P >> k} THEN $k")
    .mkString("CASE ", " ", " ELSE 15 END")

  /** The integer estimator over a `denom` column: floor(alpha_m · m² ·
    * 2^15 / denom) with alpha_m = 0.7213/(1+1.079/m), m = 1024, all in
    * exact integer arithmetic (Spark `DIV` / DuckDB `//`).
    */
  val estimateSql: String =
    s"CAST(${7213L * 1024 * 1024 * 1024} AS BIGINT) * 32768 DIV " +
      s"(${10000L * 1024 + 10790} * denom)"
  val estimateDuckSql: String =
    s"CAST(${7213L * 1024 * 1024 * 1024} AS BIGINT) * 32768 // " +
      s"(${10000L * 1024 + 10790} * denom)"
}
