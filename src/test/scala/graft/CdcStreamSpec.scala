package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

import graft.streaming.CdcStream
import graft.streaming.CdcStream.CdcState

/** Streaming CDC reconciliation contracts: initial-state loading, the
  * q121 classification over live state, stream == batch for any
  * micro-batching (commutative fold ⇒ no arrival-order contract), and
  * the kernel's permutation/split invariance. */
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  // Baseline close: keys 1..3 with history; key 4 appears only in the
  // new period (added); key 3 gets no new activity (unchanged).
  private val baseline = Seq(
    (1L, CdcState(2L, 500L, 0L, 0L)),
    (2L, CdcState(1L, 300L, 0L, 0L)),
    (3L, CdcState(5L, 900L, 0L, 0L)))

  private val feed: Seq[(Long, Long)] =
    Seq((1L, 100L), (2L, 50L), (1L, 25L), (4L, 700L), (4L, 1L))

  private def baselineDf = baseline
    .map { case (k, st) => (k, st.baseN, st.baseCents) }
    .toDF("key", "base_n", "base_cents")

  private def batchReference: Map[Long, (String, Long, Long)] =
    CdcStream.batchClassify(baselineDf, feed.toDF("key", "cents"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  private def streamed(splits: Seq[Seq[(Long, Long)]])
      : Map[Long, (String, Long, Long)] = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val init = baseline.toDS().groupByKey(_._1).mapValues(_._2)
    val name = s"cdc_out_${splits.size}_${splits.hashCode.abs}"
    val q = CdcStream.reconcile(input.toDS(), init).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    try {
      splits.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .zipWithIndex.groupBy(_._1._1).values
        .map(_.maxBy(_._2)._1).map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    } finally q.stop()
  }

  test("stream == batch classification for a mid-feed split") {
    val got = streamed(Seq(feed.take(2), feed.drop(2)))
    // every emitted key agrees with the batch outer-join classification
    got.foreach { case (k, v) => assert(batchReference(k) == v, s"key $k") }
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(4L)._1 == "added" && got(1L)._1 == "changed")
    // the untouched baseline key IS emitted (initial-state keys fire on
    // the first batch) and classifies as unchanged with zero deltas
    assert(got(3L) == (("unchanged", 0L, 0L)))
  }

  test("stream == batch for per-row batches and for one big batch") {
    val perRow = streamed(feed.map(Seq(_)))
    val oneBatch = streamed(Seq(feed))
    assert(perRow == oneBatch)
    perRow.foreach { case (k, v) => assert(batchReference(k) == v) }
  }

  test("kernel: classification transitions added/changed/unchanged") {
    assert(CdcStream.classify(CdcState(0L, 0L, 2L, 10L)) == "added")
    assert(CdcStream.classify(CdcState(3L, 99L, 1L, 5L)) == "changed")
    assert(CdcStream.classify(CdcState(3L, 99L, 0L, 0L)) == "unchanged")
  }

  test("property: kernel fold is permutation- and split-invariant") {
    val gen = for {
      xs <- Gen.listOf(Gen.chooseNum(-1000L, 1000L))
      cut <- Gen.chooseNum(0, xs.size)
      perm <- Gen.const(scala.util.Random.shuffle(xs))
    } yield (xs, perm, cut)
    val prop = Prop.forAll(gen) { case (xs, perm, cut) =>
      val whole = CdcStream.foldSlice(xs, None)
      val permuted = CdcStream.foldSlice(perm, None)
      val split = CdcStream.foldSlice(xs.drop(cut),
        Some(CdcStream.foldSlice(xs.take(cut), None)))
      whole == permuted && whole == split
    }
    val res = check(Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
