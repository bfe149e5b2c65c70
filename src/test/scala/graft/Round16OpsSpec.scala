package graft

import graft.operators.EventOps
import org.apache.spark.sql.functions._

/** Constructed-input specs for the round-16 operators: the SRM chi-square
  * against hand arithmetic on both sides of the 3.841 boundary, and the
  * guardrail rollup against hand-counted error rates.
  */
class Round16OpsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference arm assignment in exact BigInt arithmetic (the widened
    * Knuth hash's defining semantics).
    */
  private def arm(u: Long): String =
    if ((BigInt(u) * 2654435761L) % 4294967296L % 100 < 50) "A" else "B"

  test("ev_ab_srm matches hand-computed (a-b)^2/N milli on both sides of 3.841") {
    val as = (0L until 400L).filter(arm(_) == "A")
    val bs = (0L until 400L).filter(arm(_) == "B")
    // Balanced-ish: 12 vs 8 -> chi2 = 16*1000/20 = 800 milli -> no SRM.
    val ok = (as.take(12) ++ bs.take(8)).map((_, "view"))
      .toDF("user_id", "event_type")
    val r1 = EventOps.abSrmOf(ok).collect().head
    assert(r1.getAs[Long]("n_users_a") == 12L &&
      r1.getAs[Long]("n_users_b") == 8L)
    assert(r1.getAs[Long]("delta") == 4L)
    assert(r1.getAs[Long]("srm_chi2_milli") == 800L)
    assert(r1.getAs[String]("srm_flag") == "n")
    // Broken pipeline: 30 vs 6 -> chi2 = 576*1000/36 = 16000 milli -> SRM.
    // Duplicate events per user must not change the DISTINCT-user counts.
    val bad = (as.take(30) ++ bs.take(6)).flatMap(u =>
      Seq((u, "view"), (u, "click"))).toDF("user_id", "event_type")
    val r2 = EventOps.abSrmOf(bad).collect().head
    assert(r2.getAs[Long]("n_users_a") == 30L &&
      r2.getAs[Long]("n_users_b") == 6L)
    assert(r2.getAs[Long]("srm_chi2_milli") == 16000L)
    assert(r2.getAs[String]("srm_flag") == "y")
  }

  test("ev_ab_srm empty-arm degenerate input yields NULL chi2, not an error") {
    val ev = Seq((0L, "view")).toDF("user_id", "event_type")
      .filter(col("user_id") < 0) // empty frame: both arms zero
    val r = EventOps.abSrmOf(ev).collect().head
    assert(r.getAs[Long]("n_users_a") == 0L && r.getAs[Long]("n_users_b") == 0L)
    assert(r.isNullAt(r.fieldIndex("srm_chi2_milli")))
    assert(r.getAs[String]("srm_flag") == "n")
  }

  test("ev_ab_guardrail hand-counted error rates and engagement") {
    val a = (0L until 400L).filter(arm(_) == "A").take(2)
    val b = (0L until 400L).filter(arm(_) == "B").take(1)
    // Arm A: 2 users, 8 events, 2 errors -> 250000 ppm, 4000 milli epu.
    // Arm B: 1 user, 3 events, 0 errors -> 0 ppm, 3000 milli epu.
    val ev = (
      a.flatMap(u => Seq((u, "view"), (u, "click"), (u, "error"), (u, "view")))
        ++ b.flatMap(u => Seq((u, "view"), (u, "view"), (u, "click")))
      ).toDF("user_id", "event_type")
    val rows = EventOps.abGuardrailOf(ev).collect()
    assert(rows.length == 2)
    val ra = rows(0); val rb = rows(1)
    assert(ra.getAs[String]("arm") == "A" && ra.getAs[Long]("n_users") == 2L
      && ra.getAs[Long]("n_events") == 8L && ra.getAs[Long]("n_errors") == 2L
      && ra.getAs[Long]("error_ppm") == 250000L
      && ra.getAs[Long]("events_per_user_milli") == 4000L)
    assert(rb.getAs[String]("arm") == "B" && rb.getAs[Long]("n_users") == 1L
      && rb.getAs[Long]("n_events") == 3L && rb.getAs[Long]("n_errors") == 0L
      && rb.getAs[Long]("error_ppm") == 0L
      && rb.getAs[Long]("events_per_user_milli") == 3000L)
  }
}
