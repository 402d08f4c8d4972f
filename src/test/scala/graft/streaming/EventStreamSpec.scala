package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.streaming.EventStream.Event

class EventStreamSpec extends SparkSpec {

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  private val sample = Seq(
    Event(1, ts(0), 10, "view", 1.0),
    Event(2, ts(5), 10, "click", 2.0),
    Event(3, ts(100), 10, "view", 3.0), // new session (gap > 30min)
    Event(4, ts(101), 10, "buy", 4.0),
    Event(5, ts(2), 20, "view", 5.0),
    // watermark pusher: far-future event closes earlier sessions
    Event(6, ts(1000), 30, "view", 6.0))

  test("streaming sessionize emits gap-closed sessions (MemoryStream)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    mem.addData(sample: _*)
    q.processAllAvailable()
    // second microbatch advances the watermark past all timeouts
    mem.addData(Event(7, ts(5000), 40, "view", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions")
      .select("user_id", "n_events", "total_value").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    // user 10: two sessions (2 events, 2 events); user 20: one; user 30: one
    assert(got.contains((10L, 2, 3.0)))
    assert(got.contains((10L, 2, 7.0)))
    assert(got.contains((20L, 1, 5.0)))
    assert(got.contains((30L, 1, 6.0)))
  }

  test("streaming sessions match the batch twin on identical input") {
    import spark.implicits._
    val batch = EventStream.sessionizeBatch(sample.toDF())
      .select("user_id", "n_events", "total_value").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    // batch sees ALL sessions including still-open ones
    assert(batch.contains((10L, 2, 3.0)))
    assert(batch.contains((10L, 2, 7.0)))
    assert(batch.contains((20L, 1, 5.0)))
    assert(batch.size === 4) // two for user 10, one each for 20 and 30
  }

  test("windowed counts with watermark over a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("wincounts")
      .outputMode("append").start()
    mem.addData(sample: _*)
    q.processAllAvailable()
    mem.addData(Event(8, ts(50000), 50, "view", 0.0)) // advance watermark
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wincounts").collect()
    assert(rows.nonEmpty)
    val viewTotal = spark.table("wincounts")
      .filter(col("event_type") === "view")
      .agg(sum("n_events")).head.getLong(0)
    assert(viewTotal >= 3)
  }

  test("batch sessionization on the real events table is stable") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val sessions = EventStream.sessionizeBatch(events)
    val n = sessions.count()
    assert(n > 0)
    assert(sessions.agg(sum("n_events")).head.getLong(0) === events.count())
  }
}
