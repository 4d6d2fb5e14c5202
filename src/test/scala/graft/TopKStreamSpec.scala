package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

import graft.operators.TopK
import graft.streaming.TopKStream

/** Streaming top-k contracts: stream == the q125 native batch
  * aggregate for any micro-batching and arrival order; duplicate
  * redelivery absorbed by set semantics; kernel permutation/split
  * laws. */
class TopKStreamSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3

  private val feed: Seq[(String, Long, Long)] = Seq(
    ("a", 10L, 1L), ("b", 7L, 6L), ("a", 30L, 2L), ("a", 20L, 3L),
    ("b", 7L, 7L), ("a", 30L, 4L), ("a", 5L, 5L), ("c", 1L, 8L))

  private def batchReference: Map[String, (Seq[Long], Seq[Long])] =
    feed.toDF("g", "v", "id").groupBy(col("g"))
      .agg(TopK.topKPairs(col("v"), col("id"), K).as("top"))
      .select(col("g"), col("top.v").as("vs"), col("top.id").as("ids"))
      .collect()
      .map(r => r.getString(0) -> ((r.getSeq[Long](1), r.getSeq[Long](2))))
      .toMap

  private def streamed(splits: Seq[Seq[(String, Long, Long)]])
      : Map[String, (Seq[Long], Seq[Long])] = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val name = s"topk_out_${splits.size}_${splits.hashCode.abs}"
    val q = TopKStream.topK(input.toDS(), K).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    try {
      splits.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getSeq[Long](1), r.getSeq[Long](2)))
        .zipWithIndex.groupBy(_._1._1).values
        .map(_.maxBy(_._2)._1).map(t => t._1 -> ((t._2, t._3))).toMap
    } finally q.stop()
  }

  test("stream == batch native aggregate for a mid-feed split") {
    assert(streamed(Seq(feed.take(3), feed.drop(3))) == batchReference)
  }

  test("stream == batch for per-row batches and shuffled arrival") {
    assert(streamed(feed.map(Seq(_))) == batchReference)
    assert(streamed(Seq(feed.reverse)) == batchReference)
  }

  test("duplicate redelivery of a whole batch is absorbed (set semantics)") {
    val replayed = streamed(Seq(feed.take(5), feed.take(5), feed.drop(5)))
    assert(replayed == batchReference)
  }

  test("property: kernel is permutation- and split-invariant, bounded by k") {
    val pairGen = for {
      v <- Gen.chooseNum(-50L, 50L); id <- Gen.chooseNum(0L, 20L)
    } yield (v, id)
    val gen = for {
      xs <- Gen.listOf(pairGen)
      cut <- Gen.chooseNum(0, xs.size)
      k <- Gen.chooseNum(1, 5)
    } yield (xs, cut, k)
    val prop = Prop.forAll(gen) { case (xs, cut, k) =>
      val whole = TopKStream.foldSlice(xs, Seq.empty, k)
      val perm = TopKStream.foldSlice(scala.util.Random.shuffle(xs), Seq.empty, k)
      val split = TopKStream.foldSlice(xs.drop(cut),
        TopKStream.foldSlice(xs.take(cut), Seq.empty, k), k)
      whole == perm && whole == split && whole.size <= k
    }
    val res = check(Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
