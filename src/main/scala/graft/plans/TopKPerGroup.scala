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
  * the input), and merges heaps on the reduce side. This mirrors how
  * Spark's own global TakeOrderedAndProject replaces Sort+Limit — lifted
  * to per-group semantics, which the built-in physical strategies do not
  * cover.
  *
  * Memory: one k-row heap per distinct group per partition — the same
  * "group state fits the executor" assumption a hash aggregate makes
  * (groups beyond memory would need the sort-based fallback; out of scope
  * and flagged in the Scaladoc rather than silently assumed).
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
  * partitioning the child has; the final instance declares a clustered
  * distribution on the group key so EnsureRequirements inserts the (small)
  * exchange between the two.
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

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val orderE = ordering
    val schema = child.output
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupE, schema)
      val ord: Ordering[InternalRow] =
        new LazilyGeneratedOrdering(orderE, schema)
      // PriorityQueue dequeues its maximum under `ord` — the WORST of the
      // kept rows — so eviction is O(log k) per update.
      val heaps = mutable.HashMap.empty[UnsafeRow,
        mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case None =>
            val pq = mutable.PriorityQueue.empty[InternalRow](ord)
            pq.enqueue(row.copy())
            heaps.put(key.copy(), pq)
          case Some(pq) =>
            if (pq.size < limit) pq.enqueue(row.copy())
            else if (ord.compare(row, pq.head) < 0) {
              pq.dequeue(); pq.enqueue(row.copy())
            }
        }
      }
      // Emit each group's survivors best-first (dequeueAll is worst-first).
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
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
  */
object TopKFilterPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.Filter
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Filter(cond, t: TopKPerGroupNode)
        if cond.deterministic && t.groupExprs.forall(_.resolved) &&
          cond.references.subsetOf(
            AttributeSet(t.groupExprs.flatMap(_.references))) =>
      t.copy(child = Filter(cond, t.child))
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
