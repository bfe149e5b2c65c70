package graft

import graft.functions.{DotLongExpr, EqCountExpr, FoldCodeExpr, MinHash64Expr, Shingle3SetExpr, SimHash16Expr, StrCodesExpr, WinnowMinsExpr, WinnowShingles3Expr}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the custom expressions: with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * [[GraftFunctions.register]] on a live session) the compiled hash
  * kernels are callable from SQL text —
  *
  * {{{
  *   SELECT graft_fold_code(lower(trim(text)), 31, 2147483647) FROM docs
  *   SELECT graft_str_codes(split(text, ' ')) FROM docs
  * }}}
  *
  * so `spark.sql(...)` pipelines get the same codegen'd hash loops as the
  * Scala DataFrame API (SURVEY §6).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    // Scale-safety rewrite: naive `p BETWEEN lo AND hi` range joins become
    // bucket-blocked equi-joins instead of nested-loop products.
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
    // Whole-operator per-group top-k (bounded heaps + survivors-only
    // exchange) for graft.operators.GraftTopK plans, plus the rule that
    // pushes group-key filters through the custom node to the scan.
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKFilterPushdown)
  }
}

object GraftFunctions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.functions", name, usage)

  private def longLit(e: Expression, what: String): Long = {
    require(e.foldable, s"$what must be a literal")
    e.eval().asInstanceOf[Number].longValue()
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_str_codes"),
      info("graft_str_codes",
        "graft_str_codes(arr) - 32-codepoint polynomial codes of a string array"),
      (exprs: Seq[Expression]) => StrCodesExpr(exprs.head)),
    (FunctionIdentifier("graft_fold_code"),
      info("graft_fold_code",
        "graft_fold_code(str, mult, p) - full-string polynomial fold fingerprint"),
      (exprs: Seq[Expression]) => FoldCodeExpr(exprs.head,
        longLit(exprs(1), "mult"), longLit(exprs(2), "p"))),
    (FunctionIdentifier("graft_dot_long"),
      info("graft_dot_long",
        "graft_dot_long(a, b) - exact integer dot product of two long arrays"),
      (exprs: Seq[Expression]) => DotLongExpr(exprs.head, exprs(1))),
    (FunctionIdentifier("graft_min_hash64"),
      info("graft_min_hash64",
        "graft_min_hash64(codes) - the 64 minhash minima of a long-code " +
          "array in one traversal (LSH signature; caller filters empty " +
          "arrays)"),
      (exprs: Seq[Expression]) => MinHash64Expr(exprs.head)),
    (FunctionIdentifier("graft_sim_hash16"),
      info("graft_sim_hash16",
        "graft_sim_hash16(hashes) - 16-bit simhash of a token-hash array"),
      (exprs: Seq[Expression]) => SimHash16Expr(exprs.head)),
    (FunctionIdentifier("graft_eq_count"),
      info("graft_eq_count",
        "graft_eq_count(a, b) - count of agreeing positions of two " +
          "equal-length long arrays (signature agreement)"),
      (exprs: Seq[Expression]) => EqCountExpr(exprs.head, exprs(1))),
    (FunctionIdentifier("graft_winnow_mins"),
      info("graft_winnow_mins",
        "graft_winnow_mins(codes, w) - distinct sliding-window minima of " +
          "a long array (winnowing fingerprints, Schleimer et al. 2003)"),
      (exprs: Seq[Expression]) => WinnowMinsExpr(exprs.head,
        longLit(exprs(1), "w").toInt)),
    (FunctionIdentifier("graft_shingle3_set"),
      info("graft_shingle3_set",
        "graft_shingle3_set(token_codes) - distinct word-3-gram codes of " +
          "a token-code array in one pass"),
      (exprs: Seq[Expression]) => Shingle3SetExpr(exprs.head)),
    (FunctionIdentifier("graft_winnow_shingles3"),
      info("graft_winnow_shingles3",
        "graft_winnow_shingles3(token_codes, w) - winnowed 3-gram " +
          "fingerprints of a token-code array (stream + window-minima " +
          "fused in one pass)"),
      (exprs: Seq[Expression]) => WinnowShingles3Expr(exprs.head,
        longLit(exprs(1), "w").toInt)),
    (FunctionIdentifier("graft_hll_registers"),
      info("graft_hll_registers",
        "graft_hll_registers(key) - 1024 HyperLogLog max-rank registers " +
          "of a bigint key column (mergeable sketch state; feed to the " +
          "estimator or AND-merge across partitions/streams)"),
      (exprs: Seq[Expression]) => graft.functions.HllRegAgg(exprs.head)
        .toAggregateExpression()))

  /** Register on an already-running session (tests, REPL). */
  def register(spark: SparkSession): Unit = all.foreach { case (id, _, b) =>
    org.apache.spark.sql.GraftBridge.registerFunction(spark, id.funcName, b)
  }
}
