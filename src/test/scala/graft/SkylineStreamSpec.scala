package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

import graft.operators.Skyline
import graft.streaming.SkylineStream

/** Stream == batch for the Pareto frontier: folding micro-batches
  * through SkylineStream.processBatch must land on exactly the frontier
  * of the full point set, for any split, and re-delivering a batch
  * (at-least-once) must be absorbed.
  */
class SkylineStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("skystream").toString + "/state"

  private def fold(batches: Seq[Seq[(Long, Long)]], path: String): Unit =
    batches.foreach { b =>
      SkylineStream.processBatch(spark, b.toDF("cost", "gain"), path)
    }

  private def state(path: String): Set[(Long, Long)] =
    SkylineStream.currentFrontier(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def batchFrontier(pts: Seq[(Long, Long)]): Set[(Long, Long)] =
    Skyline.mergeFrontier(Nil, pts).toSet

  test("property: any micro-batch split folds to the batch frontier") {
    val pt = Gen.zip(Gen.choose(0L, 300L), Gen.choose(0L, 80L))
    val r = check(Parameters.default.withMinSuccessfulTests(8),
      Prop.forAll(Gen.listOfN(60, pt), Gen.choose(1, 5)) { (pts, nb) =>
        val path = tmp()
        val batches = pts.grouped(math.max(1, pts.size / nb)).toSeq
        fold(batches, path)
        state(path) == batchFrontier(pts)
      })
    assert(r.passed, r.status.toString)
  }

  test("at-least-once: re-delivering a batch leaves the frontier unchanged") {
    val path = tmp()
    val b1 = Seq((10L, 5L), (20L, 9L), (30L, 2L))
    val b2 = Seq((15L, 7L), (5L, 1L))
    fold(Seq(b1, b2), path)
    val before = state(path)
    fold(Seq(b2, b1, b2), path) // arbitrary replays, any order
    assert(state(path) == before)
    assert(before == batchFrontier(b1 ++ b2))
  }

  test("frontier shape invariant: gain strictly increases with cost") {
    val path = tmp()
    fold(Seq(Seq((1L, 3L), (2L, 9L), (2L, 4L), (7L, 9L), (9L, 11L), (4L, 2L))), path)
    val rows = SkylineStream.currentFrontier(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(rows == rows.sortBy(_._1))
    assert(rows.map(_._2) == rows.map(_._2).sorted)
    assert(rows.map(_._2).distinct == rows.map(_._2), "no dominated ties")
  }
}
