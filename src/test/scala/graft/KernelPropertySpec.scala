package graft

import graft.functions.{CodeKernels, Codes}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Randomized-property tests pinning the compiled kernels to pure
  * reference implementations of the oracle-defining arithmetic (ASCII and
  * full-unicode inputs, seeded so runs are reproducible) — no Spark
  * session needed.
  */
class KernelPropertySpec extends AnyFunSuite {

  private val P = Codes.P
  private val pow31m: Array[Long] =
    Iterator.iterate(1L)(x => x * 31L % P).take(32).toArray

  /** Reference strCode straight from the SQL-twin definition. */
  private def refStrCode(s: String): Long = {
    val cps = s.codePoints().toArray
    val padded = cps.take(32).padTo(32, '_'.toInt)
    val sum = padded.zipWithIndex.map { case (cp, i) =>
      cp.toLong * pow31m(i)
    }.sum
    ((sum % P) * 64L + cps.length % 64L) % P
  }

  private def refFoldCode(s: String, mult: Long, p: Long): Long =
    s.codePoints().toArray.foldLeft(0L)((acc, cp) => (acc * mult + cp) % p)

  private val rnd = new scala.util.Random(42)

  private def asciiString(): String =
    Iterator.fill(rnd.nextInt(80))((32 + rnd.nextInt(95)).toChar).mkString

  private def unicodeString(): String = {
    val pool = "aZ0 _/é ß中🦊✓"
    val cps = pool.codePoints().toArray
    val sb = new java.lang.StringBuilder
    (0 until rnd.nextInt(60)).foreach(_ =>
      sb.appendCodePoint(cps(rnd.nextInt(cps.length))))
    sb.toString
  }

  test("strCode kernel equals the reference on random ASCII strings") {
    (1 to 300).foreach { _ =>
      val s = asciiString()
      assert(CodeKernels.strCode(UTF8String.fromString(s)) === refStrCode(s),
        s"mismatch for '$s'")
    }
  }

  test("foldCode kernel equals the reference on random ASCII strings") {
    (1 to 300).foreach { _ =>
      val s = asciiString()
      assert(CodeKernels.foldCode(UTF8String.fromString(s), 31L, P) ===
        refFoldCode(s, 31L, P))
      assert(CodeKernels.foldCode(UTF8String.fromString(s), 131L, Codes.P2) ===
        refFoldCode(s, 131L, Codes.P2))
    }
  }

  test("kernels are codepoint-based on non-ASCII input too") {
    (1 to 300).foreach { _ =>
      val s = unicodeString()
      assert(CodeKernels.strCode(UTF8String.fromString(s)) === refStrCode(s),
        s"strCode mismatch for '$s'")
      assert(CodeKernels.foldCode(UTF8String.fromString(s), 31L, P) ===
        refFoldCode(s, 31L, P), s"foldCode mismatch for '$s'")
    }
  }

  test("dotLong equals the reference dot product") {
    (1 to 200).foreach { _ =>
      val a = Array.fill(64)(rnd.nextLong() % 2000L)
      val b = Array.fill(64)(rnd.nextLong() % 2000L)
      val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(a)
      val bd = new org.apache.spark.sql.catalyst.util.GenericArrayData(b)
      assert(CodeKernels.dotLong(ad, bd) ===
        a.zip(b).map { case (x, y) => x * y }.sum)
    }
  }

  private def longArray(n: Int): Array[Long] =
    Array.fill(n)(rnd.nextLong().abs % P)

  private def toArrayData(xs: Array[Long]) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(xs)

  test("minHash64 kernel equals the per-hash reference on random code arrays") {
    (1 to 200).foreach { _ =>
      val xs = longArray(1 + rnd.nextInt(120))
      val got = CodeKernels.minHash64(toArrayData(xs)).toLongArray()
      val ref = (0 until Codes.NumHashes).map(i =>
        xs.map(x => (Codes.A(i) * x + Codes.B(i)) % P).min).toArray
      assert(got.sameElements(ref))
    }
  }

  test("simHash16 kernel equals the per-bit balance reference") {
    (1 to 200).foreach { _ =>
      val xs = longArray(1 + rnd.nextInt(120))
      val got = CodeKernels.simHash16(toArrayData(xs))
      val ref = (0 until 16).map { j =>
        val bal = xs.map(h => if (((h >> j) & 1L) == 1L) 1L else -1L).sum
        if (bal > 0) 1L << j else 0L
      }.sum
      assert(got === ref)
    }
  }

  test("eqCount kernel equals the positionwise reference") {
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(64)
      val a = longArray(n)
      // copy with a random subset of positions forced equal
      val b = a.indices.map(i =>
        if (rnd.nextBoolean()) a(i) else rnd.nextLong().abs % P).toArray
      val ref = a.indices.count(i => a(i) == b(i)).toLong
      assert(CodeKernels.eqCount(toArrayData(a), toArrayData(b)) === ref)
    }
  }

  /** The kernels sit on the public SQL surface (graft_eq_count etc.), so
    * arbitrary user input must stay in-bounds: unequal lengths clamp to
    * the shorter array (never read past either buffer) and out-of-domain
    * minhash codes are normalized into [0, P) instead of overflowing the
    * A·x step (in-domain outputs unchanged — pinned by the tests above).
    */
  test("eqCount and dotLong clamp to the shorter array on unequal lengths") {
    (1 to 100).foreach { _ =>
      val n = 1 + rnd.nextInt(32)
      val m = n + 1 + rnd.nextInt(32)
      val a = longArray(n)
      val b = a.take(n) ++ longArray(m - n) // shared prefix, longer tail
      val refEq = (0 until n).count(i => a(i) == b(i)).toLong
      val refDot = (0 until n).map(i => a(i) * b(i)).sum
      assert(CodeKernels.eqCount(toArrayData(a), toArrayData(b)) === refEq)
      assert(CodeKernels.eqCount(toArrayData(b), toArrayData(a)) === refEq)
      assert(CodeKernels.dotLong(toArrayData(a), toArrayData(b)) === refDot)
      assert(CodeKernels.dotLong(toArrayData(b), toArrayData(a)) === refDot)
    }
    assert(CodeKernels.eqCount(toArrayData(Array.empty[Long]),
      toArrayData(longArray(8))) === 0L)
  }

  test("minHash64 normalizes out-of-domain codes into [0, P)") {
    (1 to 100).foreach { _ =>
      val raw = Array.fill(1 + rnd.nextInt(60))(rnd.nextLong()) // any long
      val norm = raw.map(x => ((x % P) + P) % P)
      val got = CodeKernels.minHash64(toArrayData(raw)).toLongArray()
      val ref = CodeKernels.minHash64(toArrayData(norm)).toLongArray()
      assert(got.sameElements(ref))
      assert(got.forall(v => v >= 0L && v < P))
    }
  }
}
