package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.SeriesFillStream

/** Streaming LOCF gap-fill contracts: the incremental fold equals the
  * batch calendar+window pipeline for ANY micro-batching of an
  * in-order feed, gaps accrue carried totals without materializing
  * calendar rows, and the in-order contract fails loudly. */
class SeriesFillStreamSpec extends SparkSpec {
  import spark.implicits._

  // Three series with different gap structure over an irregular span:
  // s_a dense, s_b gappy, s_c a single observation.
  private val feed: Seq[(String, Int, Long)] = Seq(
    ("s_a", 100, 10L), ("s_a", 101, 12L), ("s_a", 102, 9L),
    ("s_a", 105, 7L), ("s_a", 110, 30L),
    ("s_b", 90, 100L), ("s_b", 120, 50L), ("s_b", 121, 60L),
    ("s_c", 400, 5L))

  private def batchReference: Set[SeriesFillStream.Out] =
    SeriesFillStream.batchAccounting(feed.toDF("series", "day", "cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet

  private def streamed(splits: Seq[Seq[(String, Int, Long)]])
      : Set[SeriesFillStream.Out] = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(String, Int, Long)]
    val name = s"fill_out_${splits.size}_${splits.head.size}"
    val q = SeriesFillStream.fill(input.toDS()).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    try {
      splits.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      // Update mode: the LAST emitted row per series is current.
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
        .zipWithIndex.groupBy(_._1._1).values
        .map(_.maxBy(_._2)._1).toSet
    } finally q.stop()
  }

  test("hand-checked accounting: gaps carry the last value, O(1) per gap") {
    val st = SeriesFillStream.foldSlice(
      Seq((100, 10L), (101, 12L), (102, 9L), (105, 7L), (110, 30L)), None)
    // span 100..110 = 11 days, 5 observed, 6 gaps:
    // 103,104 carry 9; 106..109 carry 7 -> 2*9 + 4*7 = 46
    assert(SeriesFillStream.accountingOf("s_a", st) ==
      (("s_a", 11L, 5L, 6L, 68L, 46L)))
  }

  test("stream == batch pipeline for a mid-stream split") {
    val ordered = feed.sortBy(e => (e._2, e._1))
    val got = streamed(Seq(ordered.take(4), ordered.drop(4)))
    assert(got == batchReference)
  }

  test("stream == batch for per-row batches and a single batch") {
    val ordered = feed.sortBy(e => (e._2, e._1))
    assert(streamed(ordered.map(Seq(_))) == batchReference)
    assert(streamed(Seq(ordered)) == batchReference)
  }

  test("a batch split INSIDE a gap still carries across the boundary") {
    // s_b's 30-day gap: split so the gap spans the batch boundary
    val got = streamed(Seq(
      Seq(("s_b", 90, 100L)), Seq(("s_b", 120, 50L), ("s_b", 121, 60L))))
    val sb = got.find(_._1 == "s_b").get
    // span 90..121 = 32 days, 3 obs, 29 gaps all carrying 100
    assert(sb == (("s_b", 32L, 3L, 29L, 210L, 2900L)))
  }

  test("out-of-order replay across batches fails loudly") {
    val ex = intercept[Exception] {
      streamed(Seq(Seq(("s_a", 100, 1L)), Seq(("s_a", 100, 2L))))
    }
    assert(ex.getMessage != null)
  }

  test("exact redelivery of the last observation is an idempotent no-op") {
    // ADVICE r6: an at-least-once replay of the already-folded
    // (day, cents) pair must not be a restart-loop poison pill
    val st1 = SeriesFillStream.foldSlice(Seq((100, 10L), (103, 7L)), None)
    val st2 = SeriesFillStream.foldSlice(Seq((103, 7L)), Some(st1))
    assert(st2 == st1, "redelivered tail observation must fold to the same state")
    // but the same day with a DIFFERENT value is contradictory input
    intercept[IllegalArgumentException] {
      SeriesFillStream.foldSlice(Seq((103, 8L)), Some(st1))
    }
    // and an older day is still out-of-order
    intercept[IllegalArgumentException] {
      SeriesFillStream.foldSlice(Seq((101, 7L)), Some(st1))
    }
  }
}
