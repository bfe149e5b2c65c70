package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernels for the hot hash loops (SURVEY §6: "custom Catalyst
  * Expression for hot hash loops"). The declarative higher-order-function
  * forms in [[Codes]] are NOT whole-stage-codegen'd by Spark — every
  * per-character / per-element step runs the interpreted expression
  * evaluator (NamedLambdaVariable set + tree walk ≈ µs/element), which at
  * ~300 tokens × 32 positions per document dominates dedup runtime. These
  * expressions evaluate the same arithmetic in a tight JVM loop and plug
  * into whole-stage codegen via a static call.
  *
  * Semantics are defined by the DuckDB oracle SQL in [[Codes]]
  * (codepoint-based, like DuckDB's ascii/substring): for each element,
  * code = ((Σ_{i=1..32} cp_i·31^(i-1) mod P) % P · 64 + numChars % 64) % P
  * over the '_'-padded first 32 codepoints. Pure ASCII inputs (the corpus)
  * make byte/char/codepoint views identical.
  */
object CodeKernels {
  val P = 2147483647L
  private val pow31m: Array[Long] =
    Iterator.iterate(1L)(x => x * 31L % P).take(32).toArray

  /** 32-codepoint polynomial string code — kernel twin of Codes.strCode. */
  def strCode(s: UTF8String): Long = {
    val js = s.toString
    var sum = 0L
    var cpIdx = 0
    var i = 0
    while (cpIdx < 32 && i < js.length) {
      val cp = js.codePointAt(i)
      i += Character.charCount(cp)
      sum += cp.toLong * pow31m(cpIdx)
      cpIdx += 1
    }
    while (cpIdx < 32) { sum += 95L * pow31m(cpIdx); cpIdx += 1 } // '_' pad
    val len = js.codePointCount(0, js.length)
    ((sum % P) * 64L + len % 64L) % P
  }

  def strCodes(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = strCode(arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  private val MhA: Array[Long] = Codes.A.toArray
  private val MhB: Array[Long] = Codes.B.toArray

  /** All 64 minhash values of a long-code array in ONE traversal — kernel
    * twin of both prior formulations: the explode → 64×min(hash_i)
    * aggregate (whose partial-agg hashmap and docs-sized exchange this
    * removes) and the per-i `array_min(transform(...))` chain (64
    * interpreted higher-order traversals of the same array). Same
    * arithmetic: min over x of (A(i)·x + B(i)) % P, A·x < 2^62 so the
    * step stays in Long range. Caller must guarantee a non-empty array
    * (empty-shingle docs are filtered out, matching the oracle's
    * `WHERE len(scs) > 0`). Inputs are normalized into [0, P) first —
    * a no-op for [[Codes]] output, but the expression is registered on
    * the public SQL surface (graft_min_hash64) where arbitrary longs
    * would otherwise overflow the A·x step.
    */
  def minHash64(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = Array.fill(Codes.NumHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = ((arr.getLong(i) % P) + P) % P
      var h = 0
      while (h < Codes.NumHashes) {
        val v = (MhA(h) * x + MhB(h)) % P
        if (v < out(h)) out(h) = v
        h += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 16-bit simhash of a token-hash array in one traversal — kernel twin
    * of the 16 interpreted `aggregate(transform(hs, ...))` passes (one per
    * bit) of the declarative form: per bit j, count +1 for a set bit and
    * −1 for a clear one over all hashes; the output bit is set iff the
    * balance is positive.
    */
  def simHash16(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Long](16)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 16) {
        if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 16) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** Count of positions where two equal-length long arrays agree — kernel
    * twin of the zip_with + aggregate form (interpreted per candidate
    * pair) used for minhash-signature agreement. Bounded by the SHORTER
    * array: the expression is on the public SQL surface (graft_eq_count),
    * where unequal lengths must not read past either buffer (zip_with's
    * null-padded tail positions never compared equal either).
    */
  def eqCount(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) acc += 1
      i += 1
    }
    acc
  }

  /** Exact integer dot product of two equal-length long arrays (bounded
    * by the shorter — same input-domain hardening as [[eqCount]]).
    */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  /** Distinct sliding-window minima (winnowing fingerprints, window w) of
    * a long array in ONE monotonic-deque pass — kernel twin of the
    * declarative `transform(sequence(1, n-w+1), j -> array_min(slice(psc,
    * j, w)))` form, which in the interpreted higher-order evaluator
    * re-slices the array per window (an allocation + copy per window,
    * measured at ~90 s for the sf0.01 corpus vs <1 s here). Arrays
    * shorter than w yield their single global minimum (the declarative
    * form's clamped one-window case); empty arrays yield an empty result
    * (callers filter them out, matching the oracle's WHERE len(psc) > 0).
    * Output order is first-window-occurrence; every consumer treats the
    * result as a SET (explode/unnest), so order never reaches a gate.
    */
  def winnowMins(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val ww = math.min(w, n)
    val idx = new Array[Int](n) // deque of candidate indices, values increasing
    var head = 0
    var tail = 0
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      while (tail > head && arr.getLong(idx(tail - 1)) >= v) tail -= 1
      idx(tail) = i
      tail += 1
      if (idx(head) <= i - ww) head += 1
      if (i >= ww - 1) seen.add(arr.getLong(idx(head)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Positional (non-distinct) word-3-gram code stream of a token-code
    * array — the shared core of [[shingle3Set]] and [[winnowShingles3]].
    * Same arithmetic as Codes.shingleCodes3 minus the distinct: token
    * codes are < P = 2^31, ×8191 keeps every step < 2^44.
    */
  private def shingle3Stream(tcs: ArrayData): Array[Long] = {
    val n = tcs.numElements()
    if (n < 3) return Array.empty[Long]
    val out = new Array[Long](n - 2)
    var i = 0
    while (i < n - 2) {
      out(i) = ((tcs.getLong(i) * 8191L + tcs.getLong(i + 1)) % P
        * 8191L + tcs.getLong(i + 2)) % P
      i += 1
    }
    out
  }

  /** Distinct word-3-gram codes in one compiled pass — kernel twin of
    * Codes.shingleCodes3 (first-occurrence order, like array_distinct;
    * every consumer treats the result as a set).
    */
  def shingle3Set(tcs: ArrayData): ArrayData = {
    val stream = shingle3Stream(tcs)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < stream.length) { seen.add(stream(i)); i += 1 }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Winnowed fingerprints of the positional 3-gram stream in one
    * compiled pass: [[shingle3Stream]] then [[winnowMins]]. Taking the
    * TOKEN-CODE array (not the shingle stream) as input is deliberate —
    * a declarative `transform`-built stream between two kernels invites
    * the optimizer to inline its lambda into downstream consumers, where
    * the interpreted evaluator re-runs the producer per element (the
    * O(tokens²) txContamination trap, measured at 15+ s on the sf0.1
    * corpus vs ~0.5 s here).
    */
  def winnowShingles3(tcs: ArrayData, w: Int): ArrayData =
    winnowMins(new GenericArrayData(shingle3Stream(tcs)), w)

  /** Full-string left fold (acc·mult + cp) % p — kernel twin of
    * Codes.foldCode (empty string → 0).
    */
  def foldCode(s: UTF8String, mult: Long, p: Long): Long = {
    val js = s.toString
    var acc = 0L
    var i = 0
    while (i < js.length) {
      val cp = js.codePointAt(i)
      i += Character.charCount(cp)
      acc = (acc * mult + cp) % p
    }
    acc
  }
}

/** long dot product of two equal-length long arrays (quantized-embedding
  * cosine hot path — the zip_with+aggregate form runs interpreted per
  * candidate pair).
  */
case class DotLongExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    CodeKernels.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.CodeKernels.dotLong($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLongExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot_long"
}

/** Count of agreeing positions of two equal-length long arrays (minhash-
  * signature agreement hot path — see [[CodeKernels.eqCount]]).
  */
case class EqCountExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    CodeKernels.eqCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.CodeKernels.eqCount($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EqCountExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_eq_count"
}

/** string → long 32-codepoint polynomial code — scalar twin of
  * [[StrCodesExpr]]. The declarative [[Codes.strCode]] form expands to 32
  * rpad/substring/ascii terms PER CALL SITE; a handful of them in one
  * projection pushes the generated doConsume past the JVM method-size
  * limit and drops the whole stage out of codegen.
  */
case class StrCodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    CodeKernels.strCode(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodeKernels.strCode($c)")
  override protected def withNewChildInternal(newChild: Expression): StrCodeExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_str_code"
}

/** array<long> shingle codes → array<long> of the 64 minhash minima in one
  * traversal (see [[CodeKernels.minHash64]]).
  */
case class MinHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    CodeKernels.minHash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodeKernels.minHash64($c)")
  override protected def withNewChildInternal(newChild: Expression): MinHash64Expr =
    copy(child = newChild)
  override def prettyName: String = "graft_min_hash64"
}

/** array<long> token hashes → 16-bit simhash in one traversal (see
  * [[CodeKernels.simHash16]]).
  */
case class SimHash16Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    CodeKernels.simHash16(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodeKernels.simHash16($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash16Expr =
    copy(child = newChild)
  override def prettyName: String = "graft_sim_hash16"
}

/** array<string> → array<long> of 32-codepoint polynomial codes. */
case class StrCodesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    CodeKernels.strCodes(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodeKernels.strCodes($c)")
  override protected def withNewChildInternal(newChild: Expression): StrCodesExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_str_codes"
}

/** EXCLUSIVE partition-local running sum of a LONG child, in physical row
  * order — the [[org.apache.spark.sql.catalyst.expressions.MonotonicallyIncreasingID]]
  * pattern generalized from a row counter to a value accumulator: a
  * per-partition mutable long, reset by `initializeInternal` at partition
  * start, emitted-then-incremented per row, with a codegen twin so the
  * projection stays inside whole-stage codegen.
  *
  * This exists for [[graft.operators.PrefixScan.scanState]]: evaluated
  * directly above a `sortWithinPartitions` on range-partitioned input, it
  * yields the per-shard scan state that previously required a
  * `Window.partitionBy(shard, group)` — i.e. a SECOND corpus-sized hash
  * exchange. Declared `stateful` (and thereby nondeterministic), which is
  * also the correctness lever: Catalyst will not push filters/projections
  * past it, collapse it into downstream uses, or fold it — the evaluation
  * point is pinned exactly where the caller put it, in sorted row order.
  * Meaningful ONLY above an explicit per-partition sort; the wrapper in
  * [[graft.operators.PrefixScan]] owns that contract.
  */
case class PartitionRunningSumExpr(child: Expression)
    extends UnaryExpression with Nondeterministic {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def stateful: Boolean = true

  @transient private[this] var acc: Long = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    acc = 0L

  override def evalInternal(input: InternalRow): Any = {
    val out = acc
    val v = child.eval(input)
    if (v != null) acc += v.asInstanceOf[Long]
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val accTerm = ctx.addMutableState(CodeGenerator.JAVA_LONG, "graftRunSum")
    ctx.addPartitionInitializationStatement(s"$accTerm = 0L;")
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        final long ${ev.value} = $accTerm;
        if (!${c.isNull}) { $accTerm += ${c.value}; }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): PartitionRunningSumExpr = copy(child = newChild)
  override def prettyName: String = "graft_partition_running_sum"
}

/** array<long> shingle stream → array<long> distinct sliding-window minima
  * (winnowing fingerprints; see [[CodeKernels.winnowMins]]).
  */
case class WinnowMinsExpr(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "winnow window must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    CodeKernels.winnowMins(input.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CodeKernels.winnowMins($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowMinsExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_winnow_mins"
}

/** array<long> token codes → array<long> distinct word-3-gram codes in one
  * compiled pass (see [[CodeKernels.shingle3Set]]).
  */
case class Shingle3SetExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    CodeKernels.shingle3Set(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodeKernels.shingle3Set($c)")
  override protected def withNewChildInternal(newChild: Expression): Shingle3SetExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_shingle3_set"
}

/** array<long> token codes → array<long> winnowed 3-gram fingerprints (see
  * [[CodeKernels.winnowShingles3]]).
  */
case class WinnowShingles3Expr(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "winnow window must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    CodeKernels.winnowShingles3(input.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CodeKernels.winnowShingles3($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowShingles3Expr =
    copy(child = newChild)
  override def prettyName: String = "graft_winnow_shingles3"
}

/** string → long full-string polynomial fold fingerprint. */
case class FoldCodeExpr(child: Expression, mult: Long, p: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    CodeKernels.foldCode(input.asInstanceOf[UTF8String], mult, p)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CodeKernels.foldCode($c, ${mult}L, ${p}L)")
  override protected def withNewChildInternal(newChild: Expression): FoldCodeExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_fold_code"
}
