package graft

import graft.operators.{EventOps, Temporal}
import org.apache.spark.sql.functions._

/** Semantic checks for the temporal joins: each operator's scale-shaped
  * plan (union+window as-of; bucket-blocked range join) must produce
  * exactly what the naive non-equi formulation produces.
  */
class TemporalSpec extends SparkSpec {

  test("ev_asof_join matches the naive latest-click-at-or-before join") {
    val ev = EventOps.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
        col("us").as("c_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("us").as("p_us"))
    // Naive non-equi join (BNLJ at this scale — test-only): all prior
    // clicks, keep the latest by (us, event_id).
    val naive = purchases
      .join(clicks,
        col("user_id") === col("c_user") && col("c_us") <= col("p_us"), "left")
      .groupBy(col("purchase_id"), col("user_id"))
      .agg(max(struct(col("c_us"), col("c_id"))).as("best"))
      .select(col("purchase_id"), col("user_id"),
        col("best.c_id").as("click_event_id"))
    val got = Temporal.evAsofJoin(spark, sf)
      .select("purchase_id", "user_id", "click_event_id")
    assert(got.count() ===
      ev.filter(col("event_type") === "purchase").count())
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("ev_range_join matches the naive interval join") {
    val ev = EventOps.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val winUs = 600L * 1000000L
    val naive = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("us").as("err_us"))
      .join(ev.select(col("event_id").as("e_id"), col("user_id").as("e_user"),
          col("us").as("e_us")),
        col("e_us") >= col("err_us") && col("e_us") <= col("err_us") + winUs)
      .groupBy(col("err_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("e_user")).as("n_users"))
    val got = Temporal.evRangeJoin(spark, sf)
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    // Every error window contains at least its own event.
    assert(got.filter(col("n_events") < 1).isEmpty)
  }
}
