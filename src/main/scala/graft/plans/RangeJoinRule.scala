package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a naive point-in-interval range join into the
  * bucket-blocked equi-join [[graft.operators.Temporal]] builds by hand.
  *
  * A join whose only cross-side condition is `lo <= p AND p <= hi` has no
  * equi key, so Spark's physical strategies fall back to
  * BroadcastNestedLoopJoin (or a cartesian) — O(|points|·|intervals|)
  * comparisons, the classic 100 TB scale-killer. This rule detects the
  * pattern on LongType columns (microsecond epochs in this codebase) and
  * injects coarse blocking buckets:
  *
  *  - points gain `bkt = p DIV W`;
  *  - intervals explode to `sequence(lo DIV W, hi DIV W)` buckets;
  *  - the join becomes an EQUI-join on bkt with the original range
  *    predicate kept as a residual filter, so sort-merge / shuffled-hash
  *    strategies (and AQE skew splitting) apply.
  *
  * Each point has exactly ONE bucket, so every (point, interval) match is
  * produced exactly once — no dedup step. Correctness needs only
  * monotonicity of integer division: lo <= p <= hi ⇒ lo DIV W <= p DIV W
  * <= hi DIV W, which holds for truncating division regardless of sign.
  * Interval duplication is ceil(span/W)+1 copies; W is configurable via
  * `spark.graft.rangeJoin.bucketWidth` (default one hour in µs) to match
  * the expected interval span.
  *
  * The rule skips joins that already have a cross-side equality conjunct
  * (the built-in equi strategies handle those; this also makes the rule
  * idempotent — its own output contains the injected equality) and joins
  * whose smaller side fits the broadcast threshold (a broadcast nested
  * loop over a tiny side beats two shuffles).
  *
  * Registered through [[graft.GraftExtensions]], so
  * `spark.sql.extensions=graft.plans.…` users get the scale-safe plan from
  * naive SQL like
  * {{{ SELECT … FROM points p JOIN windows w ON p.ts BETWEEN w.lo AND w.hi }}}
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BucketWidthKey = "spark.graft.rangeJoin.bucketWidth"
  private val DefaultBucketWidth = 3600L * 1000000L

  private def bucketWidth: Long =
    try SQLConf.get.getConfString(BucketWidthKey, DefaultBucketWidth.toString).toLong
    catch { case _: NumberFormatException => DefaultBucketWidth }

  /** (point, lo, hi) when the conjuncts contain `p >= lo` and `p <= hi`
    * with p computed from one side and lo/hi from the other, all LongType.
    */
  private def rangePattern(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    def sideOf(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(left.outputSet)) Some(true)
      else if (refs.subsetOf(right.outputSet)) Some(false)
      else None
    }
    // Normalize every comparison to (small <= big).
    val les = conjuncts.collect {
      case LessThanOrEqual(a, b) => (a, b)
      case GreaterThanOrEqual(a, b) => (b, a)
    }.filter { case (a, b) =>
      a.dataType == LongType && b.dataType == LongType &&
        sideOf(a).isDefined && sideOf(b).isDefined &&
        sideOf(a) != sideOf(b)
    }
    // A lower bound (lo <= p) and an upper bound (p <= hi) on the same p.
    val candidates = for {
      (lo, p1) <- les
      (p2, hi) <- les
      if p1.semanticEquals(p2)
    } yield (p1, lo, hi, sideOf(p1).get)
    candidates.headOption
  }

  private def hasCrossEquality(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet)) ||
          (a.references.subsetOf(right.outputSet) &&
            b.references.subsetOf(left.outputSet))
      case _ => false
    }

  private def canBroadcast(p: LogicalPlan): Boolean = {
    val threshold = SQLConf.get.autoBroadcastJoinThreshold
    threshold >= 0 && p.stats.sizeInBytes <= threshold
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !hasCrossEquality(splitConjunctivePredicates(cond), left, right) &&
          !canBroadcast(left) && !canBroadcast(right) =>
      rangePattern(splitConjunctivePredicates(cond), left, right) match {
        case Some((p, lo, hi, pointOnLeft)) =>
          val w = Literal(bucketWidth, LongType)
          val (points, intervals) = if (pointOnLeft) (left, right) else (right, left)
          val pBkt = Alias(IntegralDivide(p, w), "graft_bkt_p")()
          val pointsB = Project(points.output :+ pBkt, points)
          val iBktAttr = AttributeReference("graft_bkt_i", LongType,
            nullable = false)()
          // Post-analysis plans must carry an explicit time zone on
          // TimeZoneAwareExpressions (the analyzer's ResolveTimeZone has
          // already run) — without it the Sequence stays unresolved.
          val seq = new Sequence(IntegralDivide(lo, w), IntegralDivide(hi, w))
            .withTimeZone(SQLConf.get.sessionLocalTimeZone)
          val intervalsB = Generate(Explode(seq),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(iBktAttr), child = intervals)
          val newCond = And(cond, EqualTo(pBkt.toAttribute, iBktAttr))
          val (newLeft, newRight) =
            if (pointOnLeft) (pointsB, intervalsB) else (intervalsB, pointsB)
          Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
        case None => j
      }
  }
}
