package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.KAnonymityStream

/** Continuous-privacy-monitor contracts: the folded class state equals
  * the one-shot batch digest for any micro-batching (k linear, the
  * sensitive set a bottom-cap union homomorphism), replays are no-ops
  * under the high-water guard, saturation is order-free, and the
  * report's at-risk flag matches q187 on the real customer table. */
class KAnonymityStreamSpec extends SparkSpec {
  import spark.implicits._

  private def rowsDf(rows: Seq[(Int, Long, String)]): DataFrame =
    rows.toDF("nationkey", "band", "segment")

  private def digestMap(df: DataFrame): Map[(Int, Long), (Long, Seq[String], Boolean)] =
    df.collect().map { r =>
      (r.getAs[Int]("nationkey"), r.getAs[Long]("band")) ->
        ((r.getAs[Long]("k_size"), r.getAs[Seq[String]]("segs").toList,
          r.getAs[Boolean]("saturated")))
    }.toMap

  // two classes; class (1, 10) sees 10 distinct segments (> LCap = 8)
  private val feed: Seq[(Int, Long, String)] =
    (0 until 10).map(i => (1, 10L, s"seg_$i")) ++
      Seq((1, 10L, "seg_0"), (2, 20L, "alpha"), (2, 20L, "alpha"),
        (2, 20L, "beta"))

  private def streamed(splits: Seq[Seq[(Int, Long, String)]])
      : Map[(Int, Long), (Long, Seq[String], Boolean)] = {
    val statePath = Files.createTempDirectory("kanon-state").toString + "/st"
    splits.zipWithIndex.foreach { case (b, i) =>
      KAnonymityStream.processBatch(spark, rowsDf(b), i.toLong, statePath)
    }
    digestMap(spark.read.parquet(statePath).filter(col("nationkey") >= 0)
      .drop("hi"))
  }

  private val reference = digestMap(KAnonymityStream.batchReference(rowsDf(feed)))

  test("stream == batch digest for a mid-feed split") {
    assert(streamed(Seq(feed.take(6), feed.drop(6))) == reference)
  }

  test("stream == batch digest for per-row batches") {
    assert(streamed(feed.map(Seq(_))) == reference)
  }

  test("saturation: l caps at LCap with the flag up, exact below it") {
    val m = streamed(Seq(feed))
    val (k1, segs1, sat1) = m((1, 10L))
    assert(k1 == 11L && segs1.length == KAnonymityStream.LCap && sat1,
      "class with 10 distinct sensitive values must cap at 8 + saturated")
    val (k2, segs2, sat2) = m((2, 20L))
    assert(k2 == 3L && segs2 == Seq("alpha", "beta") && !sat2)
  }

  test("replayed batchId is a no-op (counts are additive)") {
    val statePath = Files.createTempDirectory("kanon-replay").toString + "/st"
    KAnonymityStream.processBatch(spark, rowsDf(feed.take(6)), 0L, statePath)
    KAnonymityStream.processBatch(spark, rowsDf(feed.take(6)), 0L, statePath)
    KAnonymityStream.processBatch(spark, rowsDf(feed.drop(6)), 1L, statePath)
    val m = digestMap(spark.read.parquet(statePath)
      .filter(col("nationkey") >= 0).drop("hi"))
    assert(m == reference, "the replayed batch must not double-count")
  }

  test("report matches q187's k and at-risk flag on the customer table") {
    val statePath = Files.createTempDirectory("kanon-cust").toString + "/st"
    val classes = KAnonymityStream.customerClasses(
      Tables.customer(spark, "/root/testdata/sf0.001"))
    KAnonymityStream.processBatch(spark, classes, 0L, statePath)
    val got = KAnonymityStream.report(spark, statePath)
      .collect().map(r => (r.getAs[Int]("nationkey"), r.getAs[Long]("band"))
        -> ((r.getAs[Long]("k_size"), r.getAs[Int]("at_risk"))))
      .toMap
    val want = Queries.queries("q187_k_anonymity")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[Int]("nationkey"), r.getAs[Long]("band"))
        -> ((r.getAs[Long]("k_size"), r.getAs[Int]("at_risk"))))
      .toMap
    assert(got == want)
  }
}
