package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.FunnelStream

/** Streaming funnel contracts: the O(users)-state incremental fold
  * equals q94's batch conditional-min chain for ANY micro-batching of
  * an in-order feed, the strict-order rule holds at ties, and state
  * only deepens. */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private val K = 4

  // Randomized in-order feed: 40 users x up to 12 events over 4 stages,
  // deterministic seed. (user, ts, stage)
  private val feed: Seq[(Long, Long, Int)] = {
    val rng = new scala.util.Random(11)
    val evs = for {
      u <- 1L to 40L
      i <- 1 to (rng.nextInt(12) + 1)
    } yield (u, (rng.nextInt(500) + 1).toLong, rng.nextInt(K))
    evs.sortBy(e => (e._2, e._1))
  }

  private def batchReference: Map[Long, (Int, Long)] =
    FunnelStream.batchDepths(feed.toDF("user", "ts", "stage"), K)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
      .withDefaultValue((0, 0L))

  private def streamed(splits: Seq[Seq[(Long, Long, Int)]])
      : Map[Long, (Int, Long)] = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Int)]
    val name = s"funnel_out_${splits.size}_${splits.head.size}"
    val q = FunnelStream.progress(input.toDS()).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    try {
      splits.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .zipWithIndex.groupBy(_._1._1).values
        .map(_.maxBy(_._2)._1).map(t => t._1 -> ((t._2, t._3))).toMap
    } finally q.stop()
  }

  test("stream == batch chain for a 3-way split of a randomized feed") {
    val got = streamed(Seq(feed.take(150), feed.slice(150, 300), feed.drop(300)))
    val want = batchReference
    val users = feed.map(_._1).distinct
    users.foreach { u =>
      assert(got.getOrElse(u, (0, 0L)) == want(u), s"user $u")
    }
    assert(got.values.exists(_._1 == K), "fixture must complete the funnel")
    assert(got.values.exists(_._1 < K), "fixture must leave partial funnels")
  }

  test("stream == batch for a single batch") {
    val got = streamed(Seq(feed))
    val want = batchReference
    feed.map(_._1).distinct.foreach { u =>
      assert(got.getOrElse(u, (0, 0L)) == want(u), s"user $u")
    }
  }

  test("kernel: strict order at ties — same-instant next stage does not chain") {
    val st = FunnelStream.foldSlice(
      Seq((5L, 0), (5L, 1), (9L, 1)), None, K)
    assert(st.t == Seq(5L, 9L, -1L, -1L))
  }

  test("kernel: out-of-stage-order arrival within a batch still chains") {
    // click arrives physically before view in the seq, but times chain
    val st = FunnelStream.foldSlice(
      Seq((10L, 2), (2L, 0), (6L, 1)), None, K)
    assert(st.t == Seq(2L, 6L, 10L, -1L))
  }

  test("kernel: stage slots are first-wins and never move") {
    val s1 = FunnelStream.foldSlice(Seq((3L, 0)), None, K)
    val s2 = FunnelStream.foldSlice(Seq((7L, 0), (8L, 1)), Some(s1), K)
    assert(s2.t == Seq(3L, 8L, -1L, -1L), "second signup must not displace")
  }

  test("kernel enforces in-order arrival; equal-time redelivery is idempotent") {
    // ADVICE r6: the in-order-across-batches contract was documented
    // but unenforced — a late event silently corrupted state
    val s1 = FunnelStream.foldSlice(Seq((5L, 0), (9L, 1)), None, K)
    intercept[IllegalArgumentException] { // strictly-late event
      FunnelStream.foldSlice(Seq((8L, 2)), Some(s1), K)
    }
    // exact redelivery of the last micro-batch folds to the same state
    val s2 = FunnelStream.foldSlice(Seq((9L, 1)), Some(s1), K)
    assert(s2 == s1, "redelivered event must be a no-op")
    // a genuine equal-time event still folds by the strict-> rule
    val s3 = FunnelStream.foldSlice(Seq((9L, 2)), Some(s1), K)
    assert(s3.t == Seq(5L, 9L, -1L, -1L), "same-instant next stage must not chain")
  }
}
