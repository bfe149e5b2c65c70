package graft.operators

import graft.plans.{TopKFilterPushdown, TopKPerGroupNode, TopKPerGroupStrategy}
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}

/** DataFrame surface for the [[graft.plans.TopKPerGroupNode]] custom
  * operator. Self-installs [[graft.plans.TopKPerGroupStrategy]] on the
  * session's experimental strategies (idempotent), so it works without the
  * `spark.sql.extensions` config round-trip; config users get it from
  * [[graft.GraftExtensions]] as well.
  *
  * Sort keys are (column, descending?) pairs built directly as catalyst
  * [[SortOrder]]s — Spark 4's public Column wraps ColumnNode, whose
  * expression form is a lazily-bound wrapper that neither resolves inside
  * a custom logical node nor serializes into tasks; unresolved attributes
  * resolve through the normal analyzer instead.
  */
object GraftTopK {

  /** The first `k` rows of every group under the `orderBy` keys —
    * semantics of `row_number() OVER (PARTITION BY groupCols ORDER BY
    * orderBy) <= k`, executed as bounded heaps + a survivors-only exchange
    * instead of a full shuffle + per-group sort. Pass a deterministic
    * total order (tie-break columns) for reproducible results.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    // An empty group list would build ClusteredDistribution(Nil) and die
    // at physical planning with an opaque internal error; global top-k is
    // Spark's own ORDER BY + LIMIT (TakeOrderedAndProject).
    require(groupCols.nonEmpty,
      "topKPerGroup needs at least one group column; for global top-k use " +
        "orderBy(...).limit(k)")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(TopKFilterPushdown)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKFilterPushdown
    }
    val sortOrders = orderBy.map { case (name, desc) =>
      SortOrder(UnresolvedAttribute.quoted(name),
        if (desc) Descending else Ascending)
    }
    GraftBridge.ofRows(spark,
      TopKPerGroupNode(groupCols.map(UnresolvedAttribute.quoted), sortOrders,
        k, df.queryExecution.analyzed))
  }
}
