package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

import graft.streaming.DebounceStream

/** Streaming debounce contracts: stream == the q127 batch
  * session-window accounting across splits (incl. inside a burst),
  * redelivery idempotency, the loud in-order contract, and a kernel
  * split-invariance law. */
class DebounceStreamSpec extends SparkSpec {
  import spark.implicits._

  private val GapUs = 60L * 1000000L

  // user 1 'click': a 3-event burst, a gap, then a 2-event burst;
  // user 1 'view' and user 2 'click': singletons (key isolation)
  private val feed: Seq[(Long, String, Long, Long)] = Seq(
    (1L, "click", 0L, 1L), (1L, "click", 30L * 1000000L, 2L),
    (1L, "click", 80L * 1000000L, 3L), // 50s after #2: same burst (chain)
    (1L, "view", 10L * 1000000L, 4L),
    (1L, "click", 500L * 1000000L, 5L), (1L, "click", 550L * 1000000L, 6L),
    (2L, "click", 0L, 7L))

  /** q127's batch shape on the same feed: session_window bursts per
    * (user, type), kept = one per burst. */
  private def batchReference: Map[(Long, String), (Long, Long)] = {
    val df = feed.toDF("user_id", "event_type", "us", "event_id")
      .withColumn("tus", timestamp_micros(col("us")))
    df.groupBy(session_window(col("tus"), "60 seconds"), col("user_id"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("n")).as("n_events"), count(lit(1)).as("n_kept"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
  }

  private def streamed(splits: Seq[Seq[(Long, String, Long, Long)]])
      : Map[(Long, String), (Long, Long)] = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long, Long)]
    val name = s"deb_out_${splits.size}_${splits.hashCode.abs}"
    val q = DebounceStream.debounce(input.toDS(), GapUs).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    try {
      splits.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .zipWithIndex.groupBy(t => (t._1._1, t._1._2)).values
        .map(_.maxBy(_._2)._1).map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    } finally q.stop()
  }

  test("stream == batch session windows for a split INSIDE a burst") {
    // the cut lands between events 1 and 2 of the first burst: the
    // chain must continue across the state boundary, not restart
    assert(streamed(Seq(feed.take(1), feed.drop(1))) == batchReference)
  }

  test("stream == batch for per-row batches and one big batch") {
    assert(streamed(feed.map(Seq(_))) == batchReference)
    assert(streamed(Seq(feed)) == batchReference)
  }

  test("hand-checked: chained 50s gaps merge, 420s gap splits") {
    val got = streamed(Seq(feed))
    assert(got((1L, "click")) == ((5L, 2L))) // 3+2 events, 2 bursts
    assert(got((1L, "view")) == ((1L, 1L)))
    assert(got((2L, "click")) == ((1L, 1L)))
  }

  test("kernel: redelivery idempotent, out-of-order fails loudly") {
    val st1 = DebounceStream.foldSlice(Seq((100L, 1L), (200L, 2L)), None, GapUs)
    assert(DebounceStream.foldSlice(Seq((200L, 2L)), Some(st1), GapUs) == st1)
    intercept[IllegalArgumentException] {
      DebounceStream.foldSlice(Seq((100L, 1L)), Some(st1), GapUs)
    }
  }

  test("property: kernel fold is split-invariant at any batch boundary") {
    val gen = for {
      n <- Gen.chooseNum(0, 30)
      gaps <- Gen.listOfN(n, Gen.chooseNum(1L, 3L * GapUs))
      cut <- Gen.chooseNum(0, n)
    } yield (gaps.scanLeft(0L)(_ + _).zipWithIndex
      .map { case (us, i) => (us, i.toLong) }, cut)
    val prop = Prop.forAll(gen) { case (obs, cut) =>
      val whole = DebounceStream.foldSlice(obs, None, GapUs)
      val split = DebounceStream.foldSlice(obs.drop(cut),
        Some(DebounceStream.foldSlice(obs.take(cut), None, GapUs)), GapUs)
      whole == split
    }
    val res = check(Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
