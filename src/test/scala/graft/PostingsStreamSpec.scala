package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Postings
import graft.streaming.PostingsStream

/** Streaming index-maintenance contracts: the 3-long-state fold equals
  * q190's batch (term, block) delta window for any micro-batching, the
  * LEB128 costs follow the shared thresholds exactly, and replays are
  * absorbed idempotently. */
class PostingsStreamSpec extends SparkSpec {
  import spark.implicits._

  // Three terms engineered around the 128-id block geometry:
  //  - "dense": consecutive ids inside one block (pure 1-byte gaps)
  //  - "spread": ids straddling three block boundaries (re-anchors)
  //  - "wide": gaps crossing every LEB threshold
  private val feed: Seq[(String, Long)] = (
    (0L to 40L).map(i => ("dense", 100L + i)) ++
      Seq(10L, 126L, 127L, 128L, 129L, 255L, 256L, 400L)
        .map(("spread", _)) ++
      Seq(0L, 100L, 20000L, 3000000L, 300000000L, 300000001L)
        .map(("wide", _))
    ).sortBy(t => (t._1, t._2))

  private def batchReference: Map[String, (Long, Long)] =
    PostingsStream.batchReference(feed.toDF("term", "doc_id"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  private def streamed(splits: Seq[Seq[(String, Long)]])
      : Map[String, (Long, Long)] = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val name = s"postings_out_${splits.size}_${splits.map(_.size).sum}"
    val q = PostingsStream.maintain(input.toDS()).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    try {
      splits.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .zipWithIndex.groupBy(_._1._1).values
        .map(_.maxBy(_._2)._1).map(t => t._1 -> ((t._2, t._3))).toMap
    } finally q.stop()
  }

  test("stream == batch for a single batch") {
    assert(streamed(Seq(feed)) == batchReference)
  }

  test("stream == batch for a split landing mid-block") {
    assert(streamed(Seq(feed.take(23), feed.slice(23, 40), feed.drop(40)))
      == batchReference)
  }

  test("stream == batch for per-row batches") {
    assert(streamed(feed.map(Seq(_))) == batchReference)
  }

  test("whole-batch replay is absorbed idempotently") {
    val half = feed.take(feed.size / 2)
    assert(streamed(Seq(half, half, feed.drop(feed.size / 2), feed))
      == batchReference)
  }

  test("kernel: hand-checked anchors and gaps across a block boundary") {
    // ids 126, 127 live in block 0; 128 re-anchors block 1.
    val st = PostingsStream.foldSlice(Seq(126L, 127L, 128L), None)
    // 126 anchors block 0: leb(127)=1; 127 gap 1: 1 byte; 128 anchors
    // block 1: leb(129)=2 bytes.
    assert(st == PostingsStream.PostState(128L, 3L, 4L))
  }

  test("kernel: LEB threshold edges match the Column form's constants") {
    assert(Postings.lebBytesLong(127L) == 1L)
    assert(Postings.lebBytesLong(128L) == 2L)
    assert(Postings.lebBytesLong(16383L) == 2L)
    assert(Postings.lebBytesLong(16384L) == 3L)
    assert(Postings.lebBytesLong(2097151L) == 3L)
    assert(Postings.lebBytesLong(2097152L) == 4L)
    assert(Postings.lebBytesLong(268435455L) == 4L)
    assert(Postings.lebBytesLong(268435456L) == 5L)
  }

  test("kernel rejects negative ids") {
    intercept[IllegalArgumentException] {
      PostingsStream.foldSlice(Seq(-3L), None)
    }
  }
}
