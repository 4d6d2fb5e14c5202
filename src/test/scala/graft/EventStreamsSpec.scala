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

  test("streaming dedup drops duplicate event ids within the watermark") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val deduped = EventStreams.dedupStream(
      input.toDF().toDF("event_id", "tus", "value"), keys = Seq("event_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), 1.0),
        (1L, ts("2024-01-01 10:00:30"), 1.0), // duplicate delivery
        (2L, ts("2024-01-01 10:01:00"), 2.0))
      q.processAllAvailable()
      val got = spark.table("dedup").orderBy("event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(got == Seq(1L, 2L))
    } finally q.stop()
  }

  test("file-source event stream aggregates arriving parquet files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    Seq((1L, ts("2024-01-01 10:05:00"), 7L, "click", 1.0, """{"k": 1}"""),
      (2L, ts("2024-01-01 10:45:00"), 7L, "click", 2.0, """{"k": 2}"""))
      .toDF("event_id", "tus", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(dir)
    val agg = EventStreams.tumblingAgg(EventStreams.readEventStream(spark, dir))
    val q = agg.writeStream.format("memory").queryName("filestream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("filestream").collect()
      assert(got.length == 1 && got.head.getAs[Long]("n") == 2L)
      assert(got.head.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("stream-stream attribution join matches the batch predicate exactly") {
    implicit val ctx = spark.sqlContext
    val clicksIn = MemoryStream[(Long, Long, Timestamp)]
    val purchIn = MemoryStream[(Long, Timestamp, Double)]
    val joined = EventStreams.attributionJoin(
      clicksIn.toDF().toDF("click_id", "user_id", "click_ts"),
      purchIn.toDF().toDF("p_user", "p_ts", "value"))
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    val clicks = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (2L, 2L, ts("2024-01-01 10:00:00")),
      (3L, 1L, ts("2024-01-01 11:30:00")))
    val purchases = Seq(
      (1L, ts("2024-01-01 10:10:00"), 5.0),  // within 30m of click 1
      (1L, ts("2024-01-01 10:40:00"), 7.0),  // 40m after click 1: outside
      (2L, ts("2024-01-01 10:25:00"), 9.0),  // within 30m of click 2
      (1L, ts("2024-01-01 11:45:00"), 3.0))  // within 30m of click 3
    try {
      // deliver across separate micro-batches, purchases before clicks
      // for the tail pair — buffered stream state must still match them
      purchIn.addData(purchases.take(2))
      q.processAllAvailable()
      clicksIn.addData(clicks.take(2))
      q.processAllAvailable()
      purchIn.addData(purchases.drop(2))
      q.processAllAvailable()
      clicksIn.addData(clicks.drop(2))
      q.processAllAvailable()
      val streamed = spark.table("attrib")
        .select(col("click_id"), col("p_ts"), col("value"))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2))).toSet
      // batch twin: same predicate over the full inputs
      val batch = clicks.toDF("click_id", "user_id", "click_ts")
        .join(purchases.toDF("p_user", "p_ts", "value"),
          col("user_id") === col("p_user") &&
            col("p_ts") > col("click_ts") &&
            col("p_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
        .select(col("click_id"), col("p_ts"), col("value"))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2))).toSet
      assert(streamed == batch)
      assert(streamed == Set(
        (1L, ts("2024-01-01 10:10:00"), 5.0),
        (2L, ts("2024-01-01 10:25:00"), 9.0),
        (3L, ts("2024-01-01 11:45:00"), 3.0)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState accumulates per-user totals across batches") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Double)]
    val totals = EventStreams.runningUserTotals(input.toDS())
    val q = totals.toDF("user_id", "total", "n").writeStream
      .format("memory").queryName("totals").outputMode("update").start()
    try {
      input.addData((1L, 10.0), (1L, 5.0), (2L, 1.0))
      q.processAllAvailable()
      input.addData((1L, 2.0)) // state must carry 15.0 into this batch
      q.processAllAvailable()
      val last = spark.table("totals").filter(col("user_id") === 1L)
        .orderBy(col("n").desc).limit(1).collect().head
      assert(last.getDouble(1) == 17.0 && last.getLong(2) == 3L)
    } finally q.stop()
  }

  test("mergeSink: kill + restart from checkpoint loses nothing and duplicates nothing") {
    val root = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val in = s"$root/in"; val table = s"$root/table"; val ckpt = s"$root/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def arrive(rows: (Long, Timestamp, Long, String, Double, String)*): Unit =
      rows.toSeq.toDF("event_id", "tus", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(in)
    def start() = EventStreams.mergeSink(
      EventStreams.tumblingAgg(EventStreams.readEventStream(spark, in)),
      table, ckpt, keys = Seq("window_start", "event_type"))

    arrive(
      (1L, ts("2024-01-01 10:05:00"), 7L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 10:15:00"), 8L, "view", 2.0, "{}"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // events arrive while the query is DOWN; the restart must resume
    // from the checkpoint, carry the (10:00, click) state forward, and
    // upsert — not append — the refreshed totals
    arrive(
      (3L, ts("2024-01-01 10:20:00"), 7L, "click", 4.0, "{}"),
      (4L, ts("2024-01-01 11:05:00"), 9L, "click", 8.0, "{}"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(table)
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq(
      ("2024-01-01 10:00:00.0", "click", 2L, 5.0),
      ("2024-01-01 10:00:00.0", "view", 1L, 2.0),
      ("2024-01-01 11:00:00.0", "click", 1L, 8.0)))
  }

  test("mergeBatch replay is a no-op (idempotent upsert)") {
    val root = java.nio.file.Files.createTempDirectory("graft-merge").toString
    val table = s"$root/table"
    val batch = Seq(
      (ts("2024-01-01 10:00:00"), "click", 2L, 5.0),
      (ts("2024-01-01 11:00:00"), "click", 1L, 8.0))
      .toDF("window_start", "event_type", "n", "sum_value")
    EventStreams.mergeBatch(spark, batch, table, Seq("window_start", "event_type"))
    EventStreams.mergeBatch(spark, batch, table, Seq("window_start", "event_type"))
    assert(spark.read.parquet(table).count() == 2)
    // a refreshed total for an existing key replaces, never appends
    val refreshed = Seq((ts("2024-01-01 10:00:00"), "click", 3L, 6.0))
      .toDF("window_start", "event_type", "n", "sum_value")
    EventStreams.mergeBatch(spark, refreshed, table, Seq("window_start", "event_type"))
    val rows = spark.read.parquet(table).orderBy("window_start").collect()
    assert(rows.length == 2 && rows.head.getAs[Long]("n") == 3L)
  }

  test("dedupStream -> mergeSink: at-least-once input becomes an exactly-once table") {
    // The full ingestion repair path: duplicate deliveries (same
    // event_id) arrive across separate files AND across a query
    // restart; the watermark dedup drops repeats and the keyed upsert
    // absorbs batch replays — the warehouse table ends with exactly one
    // row per event id.
    val root = java.nio.file.Files.createTempDirectory("graft-e1e").toString
    val in = s"$root/in"; val table = s"$root/table"; val ckpt = s"$root/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def arrive(rows: (Long, Timestamp, Long, String, Double, String)*): Unit =
      rows.toSeq.toDF("event_id", "tus", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(in)
    def start() = EventStreams.mergeSink(
      EventStreams.dedupStream(
        EventStreams.readEventStream(spark, in), keys = Seq("event_id")),
      table, ckpt, keys = Seq("event_id"))

    arrive(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0, "{}"),
      (1L, ts("2024-01-01 10:00:30"), 7L, "click", 1.0, "{}"), // dup delivery
      (2L, ts("2024-01-01 10:01:00"), 8L, "view", 2.0, "{}"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // a replayed id and a fresh one arrive while the query is down
    arrive(
      (2L, ts("2024-01-01 10:02:00"), 8L, "view", 2.0, "{}"), // dup delivery
      (3L, ts("2024-01-01 10:03:00"), 9L, "click", 4.0, "{}"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(table).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L), s"expected exactly-once ids, got $got")
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
