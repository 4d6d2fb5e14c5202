package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming tumbling windows aggregate by event-time hour") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Long, Double)]
    val agg = EventStreams.tumblingAgg(
      input.toDF().toDF("tus", "event_type", "user_id", "value"))
    val q = agg.writeStream.format("memory").queryName("tumbling")
      .outputMode("complete").start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "click", 1L, 1.0),
        (ts("2024-01-01 10:55:00"), "click", 2L, 2.0),
        (ts("2024-01-01 11:05:00"), "click", 1L, 4.0),
        (ts("2024-01-01 10:20:00"), "view", 1L, 8.0))
      q.processAllAvailable()
      val got = spark.table("tumbling")
        .orderBy("window_start", "event_type")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2),
          r.getDouble(3))).toSeq
      assert(got == Seq(
        ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
        ("2024-01-01 10:00:00.0", "view", 1L, 8.0),
        ("2024-01-01 11:00:00.0", "click", 1L, 4.0)))
    } finally q.stop()
  }

  test("streaming session windows split on the 30-minute gap") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Long, Double)]
    val agg = EventStreams.sessionAgg(
      input.toDF().toDF("tus", "event_type", "user_id", "value"))
    val q = agg.writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), "click", 1L, 1.0),
        (ts("2024-01-01 10:10:00"), "click", 1L, 2.0), // same session
        (ts("2024-01-01 11:00:00"), "click", 1L, 4.0), // gap 50min -> new session
        (ts("2024-01-01 10:00:00"), "view", 2L, 8.0))
      q.processAllAvailable()
      val got = spark.table("sessions")
        .orderBy("user_id", "session_start")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(3),
          r.getDouble(4))).toSeq
      assert(got == Seq(
        (1L, "2024-01-01 10:00:00.0", 2L, 3.0),
        (1L, "2024-01-01 11:00:00.0", 1L, 4.0),
        (2L, "2024-01-01 10:00:00.0", 1L, 8.0)))
    } finally q.stop()
  }

  test("session_window boundary: a gap of exactly 30 minutes stays in the SAME session") {
    // Locks the semantic the q30 DuckDB oracle must mirror: a new
    // session starts only when the gap is STRICTLY greater than the
    // window duration (`> INTERVAL 30 MINUTE` in the island detection).
    val df = Seq(
      (ts("2024-01-01 10:00:00"), 1L, 1.0),
      (ts("2024-01-01 10:30:00"), 1L, 2.0), // exactly gap later: same session
      (ts("2024-01-01 11:00:01"), 1L, 4.0)) // gap > 30min: new session
      .toDF("tus", "user_id", "value")
    val n = df.groupBy(session_window(col("tus"), "30 minutes"), col("user_id"))
      .count().count()
    assert(n == 2, "exact-gap event extends the session; strictly-greater gap opens a new one")
  }

  test("batch and streaming tumbling aggs agree on the same data") {
    val batch = Seq(
      (ts("2024-01-01 10:05:00"), "click", 1L, 1.0),
      (ts("2024-01-01 11:05:00"), "click", 1L, 4.0))
      .toDF("tus", "event_type", "user_id", "value")
    // same expression path, no watermark needed in batch
    val got = batch.groupBy(window(col("tus"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("string"), col("n"))
      .orderBy(col("window.start").cast("string"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("2024-01-01 10:00:00", 1L), ("2024-01-01 11:00:00", 1L)))
  }
}
