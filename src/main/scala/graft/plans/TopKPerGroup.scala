package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import scala.collection.mutable

/** Whole-operator per-group top-k (SURVEY §3: the custom
  * LogicalPlan + Strategy + SparkPlan rung of the extension ladder).
  *
  * The declarative form — `row_number() OVER (PARTITION BY g ORDER BY o)
  * <= k` — shuffles EVERY input row on the group key and then fully sorts
  * every group, only to discard all but k rows: at 100 TB that is a
  * corpus-sized exchange plus a corpus-sized sort for a result of
  * k·|groups| rows. The physical operator here instead keeps a bounded
  * heap of k rows per group within each input partition (no sort, one
  * pass), ships ONLY those survivors through the clustered exchange
  * (≤ k·|groups|·|partitions| rows, typically orders of magnitude below
  * the input), and streams the merge on the reduce side. This mirrors how
  * Spark's own global TakeOrderedAndProject replaces Sort+Limit — lifted
  * to per-group semantics, which the built-in physical strategies do not
  * cover.
  *
  * Memory is bounded on BOTH sides, unlike a hash aggregate:
  *  - the map-side pass caps its heap table at
  *    `spark.graft.topk.maxGroupsPerPartition` groups (default 262144) and
  *    FLUSHES current survivors downstream when a new group would exceed
  *    it — correct because the reduce side merges duplicates, so a flush
  *    only costs extra exchange rows, never wrong answers;
  *  - the reduce side declares a required ordering on the group key, so
  *    EnsureRequirements plans Spark's spillable external sort over the
  *    survivors (already ≤ k·|groups|·|partitions| rows) and the operator
  *    streams group-by-group with a single k-row heap of state.
  * A group key of any cardinality therefore degrades to extra survivor
  * traffic + a survivors-only spillable sort, never to executor OOM.
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(
      newChild: LogicalPlan): TopKPerGroupNode = copy(child = newChild)
}

/** Physical per-group top-k. `partial = true` runs map-side over whatever
  * partitioning the child has (bounded heap table with flush-at-cap); the
  * final instance declares a clustered distribution + group-key ordering,
  * so EnsureRequirements inserts the (small) exchange and a spillable sort
  * over the survivors, and the merge streams with O(k) state.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(groupExprs.map(SortOrder(_, Ascending)))

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val orderE = ordering
    val schema = child.output
    val limit = k
    if (partial) {
      val maxGroups = conf.getConfString(
        "spark.graft.topk.maxGroupsPerPartition", "262144").toInt
      child.execute().mapPartitions { iter =>
        val keyProj = UnsafeProjection.create(groupE, schema)
        val ord: Ordering[InternalRow] =
          new LazilyGeneratedOrdering(orderE, schema)
        // PriorityQueue dequeues its maximum under `ord` — the WORST of
        // the kept rows — so eviction is O(log k) per update.
        val heaps = mutable.HashMap.empty[UnsafeRow,
          mutable.PriorityQueue[InternalRow]]
        // Emit (best-first; dequeueAll is worst-first) and drop all state.
        def drain(): Iterator[InternalRow] = {
          val rows = heaps.valuesIterator
            .flatMap(_.dequeueAll.reverseIterator).toArray
          heaps.clear()
          rows.iterator
        }
        iter.flatMap { row =>
          val key = keyProj(row)
          heaps.get(key) match {
            case None =>
              val flushed: Iterator[InternalRow] =
                if (heaps.size >= maxGroups) drain() else Iterator.empty
              val pq = mutable.PriorityQueue.empty[InternalRow](ord)
              pq.enqueue(row.copy())
              heaps.put(key.copy(), pq)
              flushed
            case Some(pq) =>
              if (pq.size < limit) pq.enqueue(row.copy())
              else if (ord.compare(row, pq.head) < 0) {
                pq.dequeue(); pq.enqueue(row.copy())
              }
              Iterator.empty
          }
        } ++ drain()
      }
    } else {
      // Rows arrive clustered AND sorted on the group key: stream one
      // group at a time with a single k-row heap.
      child.execute().mapPartitions { iter =>
        val keyProj = UnsafeProjection.create(groupE, schema)
        val ord: Ordering[InternalRow] =
          new LazilyGeneratedOrdering(orderE, schema)
        val pq = mutable.PriorityQueue.empty[InternalRow](ord)
        var curKey: UnsafeRow = null
        def emitGroup(): Iterator[InternalRow] = {
          val rows = pq.dequeueAll.reverseIterator.toArray
          pq.clear()
          rows.iterator
        }
        iter.flatMap { row =>
          val key = keyProj(row)
          if (curKey != null && key == curKey) {
            if (pq.size < limit) pq.enqueue(row.copy())
            else if (ord.compare(row, pq.head) < 0) {
              pq.dequeue(); pq.enqueue(row.copy())
            }
            Iterator.empty
          } else {
            val out: Iterator[InternalRow] =
              if (curKey == null) Iterator.empty else emitGroup()
            curKey = key.copy()
            pq.enqueue(row.copy())
            out
          }
        } ++ (if (curKey == null) Iterator.empty else emitGroup())
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): TopKPerGroupExec = copy(child = newChild)
}

/** A deterministic filter that references only GROUP columns commutes with
  * per-group top-k (it removes whole groups, never reorders rows within
  * one) — push it below the node so it reaches the scan. Catalyst's own
  * PushDownPredicate cannot know this for a custom node; without the rule
  * a `topKPerGroup(...).filter(groupCol === x)` plan would heap the whole
  * corpus first. The same argument Spark applies to window partition keys.
  *
  * The guard requires every group expression to be a bare [[Attribute]]:
  * for a computed group key (e.g. `a % 2`) a filter on the UNDERLYING
  * column `a` would pass a references-based check yet not commute (it can
  * remove part of a group). [[graft.operators.GraftTopK]] only builds
  * attribute group keys, but the node is public, so the rule must not
  * assume that.
  *
  * When the rule fires it re-runs Catalyst's [[org.apache.spark.sql.
  * catalyst.optimizer.PushDownPredicates]] on the result: under the
  * `extraOptimizations` self-install path this rule runs AFTER the main
  * operator-optimization fixpoint, so without the re-run the pushed filter
  * would stop directly below the top-k node instead of reaching the scan.
  * (Under the [[graft.GraftExtensions]] injectOptimizerRule path the main
  * batches re-fire anyway; the extra application is idempotent.)
  */
object TopKFilterPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.Filter
  override def apply(plan: LogicalPlan): LogicalPlan = {
    var fired = false
    val pushed = plan.transform {
      case Filter(cond, t: TopKPerGroupNode)
          if cond.deterministic &&
            t.groupExprs.forall(e => e.resolved && e.isInstanceOf[Attribute]) &&
            cond.references.subsetOf(AttributeSet(
              t.groupExprs.collect { case a: Attribute => a })) =>
        fired = true
        t.copy(child = Filter(cond, t.child))
    }
    if (fired) {
      org.apache.spark.sql.catalyst.optimizer.PushDownPredicates(pushed)
    } else pushed
  }
}

/** Plans the logical node as partial → (exchange via EnsureRequirements) →
  * final. Registered through [[graft.GraftExtensions]] and self-installed
  * by [[graft.operators.GraftTopK]].
  */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, partial = false,
        TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}
