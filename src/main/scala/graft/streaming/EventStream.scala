package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference has no stream processor (SURVEY.md §2.9) — its
  * incremental behavior is a persistent queue + background counters.
  * This module supplies the streaming equivalents a production ingest of
  * the same events would need: watermarked tumbling-window aggregation
  * and stateful sessionization via flatMapGroupsWithState. Both operate
  * on any streaming Dataset with the events schema (tested with
  * MemoryStream; a file/kafka readStream plugs in unchanged).
  */
object EventStream {

  final case class Event(
      event_id: Long,
      ts: Timestamp,
      user_id: Long,
      event_type: String,
      value: Double)

  final case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Int,
      total_value: Double)

  /** Internal session accumulator (public — the state encoder's codegen
    * needs constructor access). */
  final case class SessionState(
      start: Long, last: Long, n: Int, total: Double)

  /** Tumbling-window counts with a watermark: late rows beyond the
    * watermark are dropped, windows finalize in append mode. */
  def windowedCounts(events: DataFrame,
      window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Gap-based sessionization: events of one user belong to one session
    * while gaps stay under `gapMs`; a session closes (and emits) when the
    * event-time timeout passes. KeyValueGroupedDataset +
    * flatMapGroupsWithState — the custom-state primitive. */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start),
              new Timestamp(s.last), s.n, s.total))
          } else {
            // batch arrivals sorted by event time for deterministic folding
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1,
                    s.total + e.value))
                case Some(s) =>
                  closed ::= Session(userId, new Timestamp(s.start),
                    new Timestamp(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Batch twin of sessionize (same gap semantics via lag/window) — used
    * to cross-check the streaming path on identical input. */
  def sessionizeBatch(events: DataFrame, gapMs: Long = 30 * 60 * 1000L)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      // ts may be TIMESTAMP_NTZ in parquet — go through TIMESTAMP (UTC
      // session TZ) before epoch-seconds
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (col("ts").cast("timestamp").cast("long") -
            col("prev_ts").cast("timestamp").cast("long")) * 1000L
            > gapMs, 1).otherwise(0))
      .withColumn("session_no",
        sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).cast("int").as("n_events"),
        sum(col("value")).as("total_value"))
      .drop("session_no")
  }
}
