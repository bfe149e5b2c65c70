package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming twins of the batch event operators (SURVEY §2.C).
  *
  * The reference's event surface is an audit stream of namespace operations;
  * at 100 TB scale these run as `readStream` jobs over the store with
  * watermarked state. The twins here share semantics with
  * [[graft.operators.EventOps]] so the batch oracle validates the logic and
  * the streaming tests validate incremental execution (append mode,
  * watermark eviction, keyed state).
  */
object StreamOps {

  /** Streaming source over a DIRECTORY of events parquet files (the file
    * source requires a directory — in production this is the store path new
    * files land in). ts arrives as long nanos, same nanosAsLong convention
    * as the batch reader.
    */
  def eventStream(spark: SparkSession, eventsDir: String,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    val schema = spark.read.parquet(eventsDir).schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(eventsDir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Tumbling 1-hour windowed counts with a 2-hour watermark — the
    * streaming twin of EventOps.evTumblingCounts.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  // --- keyed-state sessionization (flatMapGroupsWithState) ---------------

  case class Ev(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(sessionSeq: Long, lastTs: Long, start: Long,
    n: Long, sum: Double)
  case class SessionOut(user_id: Long, session_seq: Long, n_events: Long,
    session_start: Timestamp, session_end: Timestamp, sum_value: Double)

  private val GapMicros = 1800L * 1000000L

  /** Gap-based sessionization with explicit keyed state — the streaming twin
    * of EventOps.evSessionize. Emits a session when a gap closes it; on
    * processing-time timeout the open session flushes. Batch-executable too
    * (tests run it over a sorted batch via flatMapGroups semantics).
    */
  def sessionize(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          // Within a micro-batch rows are not ordered; sort this group's
          // slice (bounded by batch size, not total history).
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.value))
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
          for (e <- sorted) {
            val tsMicros = e.ts.getTime * 1000L
            if (st == null) {
              st = SessionState(1L, tsMicros, tsMicros, 1L, e.value)
            } else if (tsMicros - st.lastTs > GapMicros) {
              out += SessionOut(user, st.sessionSeq, st.n,
                new Timestamp(st.start / 1000L), new Timestamp(st.lastTs / 1000L),
                math.round(st.sum * 100) / 100.0)
              st = SessionState(st.sessionSeq + 1, tsMicros, tsMicros, 1L, e.value)
            } else {
              st = st.copy(lastTs = tsMicros, n = st.n + 1, sum = st.sum + e.value)
            }
          }
          if (st != null) state.update(st)
          out.iterator
      }.toDF()
  }

  /** Flush remaining open sessions from the final state (test helper for
    * end-of-stream semantics; production would use event-time timeout).
    */
  def finalSessions(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroups { (user: Long, rows: Iterator[Ev]) =>
        val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.value))
        val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
        var st: SessionState = null
        for (e <- sorted) {
          val tsMicros = e.ts.getTime * 1000L
          if (st == null) st = SessionState(1L, tsMicros, tsMicros, 1L, e.value)
          else if (tsMicros - st.lastTs > GapMicros) {
            out += SessionOut(user, st.sessionSeq, st.n,
              new Timestamp(st.start / 1000L), new Timestamp(st.lastTs / 1000L),
              math.round(st.sum * 100) / 100.0)
            st = SessionState(st.sessionSeq + 1, tsMicros, tsMicros, 1L, e.value)
          } else st = st.copy(lastTs = tsMicros, n = st.n + 1, sum = st.sum + e.value)
        }
        if (st != null)
          out += SessionOut(user, st.sessionSeq, st.n,
            new Timestamp(st.start / 1000L), new Timestamp(st.lastTs / 1000L),
            math.round(st.sum * 100) / 100.0)
        out.iterator
      }.toDF()
  }
}
