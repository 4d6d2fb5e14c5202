package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

import graft.streaming.EmaStream

/** Streaming EMA contracts: the O(W)-state ring fold equals q140's
  * batch 16-lag window for any micro-batching, the integer weights are
  * the exact 2^(W-1-j) geometry, and the kernel is split-invariant. */
class EmaStreamSpec extends SparkSpec {
  import spark.implicits._

  // Two series, one longer than the window (ring eviction exercised),
  // one shorter (partial-window denominators exercised).
  private val feed: Seq[(String, Int, Long)] =
    ((100 to 124).map(d => ("s_long", d, (d * 7 % 23).toLong)) ++
      (100 to 105).map(d => ("s_short", d, (d % 5).toLong))).sortBy(_._2)

  private def batchReference: Map[String, (Int, Long, Long)] =
    EmaStream.batchLatest(feed.toDF("series", "day", "x"))
      .collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3))))
      .toMap

  private def streamed(splits: Seq[Seq[(String, Int, Long)]])
      : Map[String, (Int, Long, Long)] = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(String, Int, Long)]
    val name = s"ema_out_${splits.size}"
    val q = EmaStream.smooth(input.toDS()).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    try {
      splits.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .zipWithIndex.groupBy(_._1._1).values
        .map(_.maxBy(_._2)._1).map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    } finally q.stop()
  }

  test("stream == batch 16-lag window for a mid-series split") {
    val got = streamed(Seq(feed.take(17), feed.drop(17)))
    assert(got == batchReference)
  }

  test("stream == batch for per-row batches") {
    assert(streamed(feed.map(Seq(_))) == batchReference)
  }

  test("kernel: exact weight geometry on a hand-checked ring") {
    // full window of ones: num = sum 2^j = 2^16 - 1 = den
    val full = EmaStream.foldSlice((1 to 16).map(d => (d, 1L)), None)
    assert(EmaStream.weigh(full.ring) == (((1L << 16) - 1, (1L << 16) - 1)))
    // partial window (3 obs): newest gets 2^15, then 2^14, 2^13
    val part = EmaStream.foldSlice(Seq((1, 5L), (2, 7L), (3, 11L)), None)
    val num = 5L * (1L << 13) + 7L * (1L << 14) + 11L * (1L << 15)
    val den = (1L << 13) + (1L << 14) + (1L << 15)
    assert(EmaStream.weigh(part.ring) == ((num, den)))
    // eviction: the 17th observation pushes the 1st out
    val evict = EmaStream.foldSlice(Seq((17, 100L)), Some(full))
    assert(evict.ring.length == 16 && evict.ring.last == 100L)
  }

  test("kernel enforces in-order arrival; exact redelivery is idempotent") {
    val st1 = EmaStream.foldSlice(Seq((1, 12L), (2, 8L)), None)
    val st2 = EmaStream.foldSlice(Seq((2, 8L)), Some(st1))
    assert(st2 == st1, "redelivered tail observation must fold to the same state")
    intercept[IllegalArgumentException] { // same day, contradictory value
      EmaStream.foldSlice(Seq((2, 9L)), Some(st1))
    }
    intercept[IllegalArgumentException] { // older day
      EmaStream.foldSlice(Seq((1, 12L)), Some(st1))
    }
  }

  test("property: kernel fold is split-invariant at any batch boundary") {
    val gen = for {
      n <- Gen.choose(1, 40)
      xs <- Gen.listOfN(n, Gen.choose(-50L, 50L))
      cut <- Gen.choose(0, n)
    } yield (xs.zipWithIndex.map { case (x, i) => (i + 1, x) }, cut)
    val p = Prop.forAll(gen) { case (obs, cut) =>
      val whole = EmaStream.foldSlice(obs, None)
      val split = EmaStream.foldSlice(obs.drop(cut),
        if (cut == 0) None else Some(EmaStream.foldSlice(obs.take(cut), None)))
      whole == split
    }
    val r = check(Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }
}
