package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine hash arithmetic (SURVEY §4).
  *
  * MinHash / SimHash / LSH must produce byte-identical results in Spark and
  * in the DuckDB oracle, so hash families are plain integer arithmetic over
  * a polynomial character code — never engine-internal hash functions.
  * Every helper emits BOTH the Spark Column and the equivalent DuckDB SQL
  * string from the same constants so the two sides cannot drift.
  *
  * Code: poly(s) = Σ_{i=1..8} ascii(rpad(s,8,'_')[i]) * 31^(i-1), then
  * x = (poly * 64 + length(s) % 64) % P  — the length term separates
  * strings sharing an 8-char prefix. Hash family: h_i(x) = (a_i*x+b_i) % P
  * with P = 2^31 - 1; x < P and a_i < 2^31 keep a_i*x within Long range.
  */
object Codes {
  val P = 2147483647L // 2^31 - 1
  val A: Seq[Long] = Seq(769L, 1031L, 1543L, 2053L, 3079L, 6151L, 12289L, 24593L)
  val B: Seq[Long] = Seq(12582917L, 25165843L, 50331653L, 100663319L,
    201326611L, 402653189L, 805306457L, 1610612741L)

  private val pow31: Array[Long] =
    Iterator.iterate(1L)(_ * 31L).take(8).toArray

  /** Polynomial char code of the first 8 chars (underscore-padded). */
  def polyCode(c: Column): Column =
    (1 to 8).map(i => ascii(substring(rpad(c, 8, "_"), i, 1)) * lit(pow31(i - 1)))
      .reduce(_ + _)

  def polyCodeSql(e: String): String =
    (1 to 8).map(i =>
      s"CAST(ascii(substring(rpad($e, 8, '_'), $i, 1)) AS BIGINT) * ${pow31(i - 1)}")
      .mkString("(", " + ", ")")

  /** Full string code in [0, P). */
  def strCode(c: Column): Column =
    (polyCode(c) * 64L + length(c) % 64L) % P

  def strCodeSql(e: String): String =
    s"((${polyCodeSql(e)} * 64 + length($e) % 64) % $P)"

  /** i-th hash of a code column. */
  def hash(i: Int, x: Column): Column = (lit(A(i)) * x + B(i)) % P

  def hashSql(i: Int, xe: String): String = s"((${A(i)} * $xe + ${B(i)}) % $P)"

  /** Whitespace tokens of lower-cased trimmed text (no empties). */
  def tokens(text: Column): Column =
    filter(split(trim(lower(text)), " +"), t => length(t) > 0)

  def tokensSql(e: String): String =
    s"list_filter(string_split_regex(trim(lower($e)), ' +'), t -> length(t) > 0)"

  /** Distinct word 3-gram shingles (empty array if < 3 tokens; the guard
    * matters because Spark's sequence(1, n) runs DESCENDING when n < 1).
    */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      array_distinct(transform(
        sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2)))))
      .otherwise(array().cast("array<string>"))

  def shingles3Sql(tse: String): String =
    s"list_distinct([ $tse[i] || ' ' || $tse[i+1] || ' ' || $tse[i+2] " +
      s"for i in range(1, greatest(len($tse) - 1, 1)) ])"
}
