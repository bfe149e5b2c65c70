package graft

import graft.functions.{CodeKernels, Codes}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The compiled kernels must equal the declarative (oracle-defining)
  * arithmetic on edge-case inputs: empty, shorter/longer than the 32-char
  * window, exactly 32, and length-term collisions.
  */
class CodeKernelSpec extends SparkSpec {

  private val cases = Seq(
    "", "a", "_", "spark", "a" * 31, "b" * 32, "c" * 33, "d" * 100,
    "same32same32same32same32same32xyTAIL-A", // 32-char prefix shared...
    "same32same32same32same32same32xyTAIL-BB", // ...lengths differ
    "x y z", "0123456789")

  test("strCode kernel equals the declarative 32-term polynomial") {
    import spark.implicits._
    // Declarative form straight from the SQL-twin definition.
    val declarative = cases.toDF("s")
      .select(col("s"), (
        (1 to 32).map(i =>
          ascii(substring(rpad(col("s"), 32, "_"), i, 1)) *
            lit(Iterator.iterate(1L)(x => x * 31L % Codes.P).drop(i - 1).next()))
          .reduce(_ + _) % Codes.P * 64L + length(col("s")) % 64L) % Codes.P)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    cases.foreach { s =>
      assert(CodeKernels.strCode(UTF8String.fromString(s)) === declarative(s),
        s"strCode mismatch for ${s.take(40)}(len ${s.length})")
    }
  }

  test("foldCode kernel equals a reference fold") {
    def ref(s: String, mult: Long, p: Long): Long =
      s.codePoints().toArray.foldLeft(0L)((acc, cp) => (acc * mult + cp) % p)
    cases.foreach { s =>
      assert(CodeKernels.foldCode(UTF8String.fromString(s), 31L, Codes.P) ===
        ref(s, 31L, Codes.P))
      assert(CodeKernels.foldCode(UTF8String.fromString(s), 131L, Codes.P2) ===
        ref(s, 131L, Codes.P2))
    }
  }

  test("strCode separates shared-prefix strings via the length term") {
    val a = CodeKernels.strCode(UTF8String.fromString("same32same32same32same32same32xyTAIL-A"))
    val b = CodeKernels.strCode(UTF8String.fromString("same32same32same32same32same32xyTAIL-BB"))
    assert(a !== b)
  }
}
