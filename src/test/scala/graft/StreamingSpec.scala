package graft

import graft.operators.EventOps
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._

/** Streaming twins produce the same results as their batch oracles. */
class StreamingSpec extends SparkSpec {

  /** The file stream source needs a directory; stage the single testdata
    * file into one via symlink.
    */
  lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-events-stream")
    java.nio.file.Files.createSymbolicLink(
      d.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sf/events.parquet"))
    d.toString
  }

  test("streaming tumbling counts equal the batch aggregation") {
    val stream = StreamOps.eventStream(spark, eventsDir)
    val q = StreamOps.tumblingCounts(stream)
      .writeStream
      .format("memory")
      .queryName("tumbling_test")
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("tumbling_test")
      .select("window_start", "event_type", "n_events", "sum_value")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = EventOps.evTumblingCounts(spark, sf)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch)
  }

  test("keyed-state sessionization matches the batch window sessionization") {
    val batchEvents = EventOps.events(spark, sf)
    val sessions = StreamOps.finalSessions(spark, batchEvents)
      .select(col("user_id"), col("session_seq"), col("n_events"), col("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val oracle = EventOps.evSessionize(spark, sf)
      .select(col("user_id"), col("session_seq"), col("n_events"), col("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(sessions == oracle)
  }

  test("flatMapGroupsWithState emits closed sessions incrementally") {
    val stream = StreamOps.eventStream(spark, eventsDir)
    val q = StreamOps.sessionize(spark, stream)
      .writeStream
      .format("memory")
      .queryName("session_test")
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    // single-file source => one micro-batch => only gap-closed sessions emit;
    // they must be a subset of the batch sessionization.
    val emitted = spark.table("session_test")
      .select("user_id", "session_seq", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val all = EventOps.evSessionize(spark, sf)
      .select("user_id", "session_seq", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(emitted.subsetOf(all))
    assert(emitted.nonEmpty)
  }
}
