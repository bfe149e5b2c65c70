package graft

import graft.operators.{Audit, Entities}
import org.apache.spark.sql.functions._

/** Semantic invariants of the audit-log and quota-enforcement operators. */
class AuditSpec extends SparkSpec {

  test("audit op mix partitions every event exactly once") {
    val rows = Audit.nsAuditOpMix(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.events(spark, sf).count())
    // Failures only ever come from DELETE_KEY (the error mapping).
    rows.foreach { r =>
      val (op, failures) = (r.getString(0), r.getLong(3))
      if (op == "DELETE_KEY") assert(failures == r.getLong(1))
      else assert(failures == 0L, s"$op has failures")
    }
    // Most-frequent-first ordering with op tie-break.
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts == counts.sortBy(-_))
  }

  test("access heatmap counts only READ ops") {
    val heat = Audit.nsAccessHeatmap(spark, sf)
      .agg(sum(col("n_accesses"))).collect()(0).getLong(0)
    val reads = Audit.auditLog(spark, sf)
      .filter(col("op").isin("READ_KEY", "LIST_KEYS")).count()
    assert(heat == reads)
  }

  test("top users are the global top 5 by entry count, user tie-break") {
    val top = Audit.nsAuditTopUsers(spark, sf).collect()
    assert(top.length == 5)
    val all = Audit.auditLog(spark, sf)
      .groupBy(col("user")).agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (u, n) => (-n, u) }
    assert(top.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      all.take(5).toSeq)
  }

  test("quota enforcement verdict matches the ppm threshold at both levels") {
    val rows = Entities.nsQuotaEnforcement(spark, sf).collect()
    assert(rows.exists(_.getString(0) == "VOLUME"))
    assert(rows.exists(_.getString(0) == "BUCKET"))
    rows.foreach { r =>
      val (ppm, headroom, action) =
        (r.getLong(5), r.getLong(6), r.getString(7))
      val expected =
        if (ppm >= 1000000L) "DENY_WRITES"
        else if (ppm >= 900000L) "WARN" else "ALLOW"
      assert(action == expected)
      assert((headroom <= 0) == (ppm >= 1000000L),
        "headroom sign disagrees with over-quota verdict")
    }
  }
}
