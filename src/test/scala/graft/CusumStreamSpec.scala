package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

import graft.streaming.CusumStream

/** Streaming fixed-target CUSUM contracts: the O(1)-per-observation
  * fold equals the batch window pipeline for any micro-batching, the
  * earliest peak day wins ties, and the kernel is split-invariant. */
class CusumStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Target = 10L

  // Two series: s_up has a level shift mid-series (the detectable
  // change), s_flat stays at target (peak ~ first positive noise).
  private val feed: Seq[(String, Int, Long)] =
    ((100 to 119).map(d => ("s_up", d, if (d >= 110) 14L else 9L)) ++
      (100 to 119).map(d => ("s_flat", d, 10L))).sortBy(_._2)

  private def batchReference: Map[String, (Long, Int)] =
    CusumStream.batchPeaks(feed.toDF("series", "day", "x"), Target)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap

  private def streamed(splits: Seq[Seq[(String, Int, Long)]])
      : Map[String, (Long, Int)] = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(String, Int, Long)]
    val name = s"cusum_out_${splits.size}"
    val q = CusumStream.detect(input.toDS(), Target).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    try {
      splits.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        .zipWithIndex.groupBy(_._1._1).values
        .map(_.maxBy(_._2)._1).map(t => t._1 -> ((t._2, t._3))).toMap
    } finally q.stop()
  }

  test("stream == batch windows for a split inside the level shift") {
    val got = streamed(Seq(feed.take(25), feed.drop(25)))
    assert(got == batchReference)
    // the shifted series' peak is at its last day (shift persists)
    assert(got("s_up")._2 == 119)
  }

  test("stream == batch for per-row batches") {
    assert(streamed(feed.map(Seq(_))) == batchReference)
  }

  test("kernel: hand-checked excursion and earliest-tie peak day") {
    // devs vs target 10: +2, -2, +2, +2 -> S: 2,0,2,4; minS incl 0 ->
    // C: 2,0,2,4; peak 4 at day 4
    val st = CusumStream.foldSlice(
      Seq((1, 12L), (2, 8L), (3, 12L), (4, 12L)), None, 10L)
    assert(st.maxC == 4L && st.maxCDay == 4)
    // all-below-target: C stays 0, peak day = first day (tie rule)
    val lo = CusumStream.foldSlice(Seq((1, 5L), (2, 5L)), None, 10L)
    assert(lo.maxC == 0L && lo.maxCDay == 1)
  }

  test("kernel enforces in-order arrival; exact redelivery is idempotent") {
    // ADVICE r6: the contract was documented but unenforced — a
    // duplicate day silently double-folded into the prefix sum
    val st1 = CusumStream.foldSlice(Seq((1, 12L), (2, 8L)), None, Target)
    val st2 = CusumStream.foldSlice(Seq((2, 8L)), Some(st1), Target)
    assert(st2 == st1, "redelivered tail observation must fold to the same state")
    intercept[IllegalArgumentException] { // same day, contradictory value
      CusumStream.foldSlice(Seq((2, 9L)), Some(st1), Target)
    }
    intercept[IllegalArgumentException] { // older day
      CusumStream.foldSlice(Seq((1, 12L)), Some(st1), Target)
    }
  }

  test("property: kernel fold is split-invariant at any batch boundary") {
    val gen = for {
      n <- Gen.choose(1, 30)
      xs <- Gen.listOfN(n, Gen.choose(0L, 25L))
      cut <- Gen.choose(0, n)
    } yield (xs.zipWithIndex.map { case (x, i) => (i + 1, x) }, cut)
    val p = Prop.forAll(gen) { case (obs, cut) =>
      val whole = CusumStream.foldSlice(obs, None, 10L)
      val split = CusumStream.foldSlice(obs.drop(cut),
        if (cut == 0) None else Some(CusumStream.foldSlice(obs.take(cut), None, 10L)),
        10L)
      whole == split
    }
    val r = check(Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }
}
