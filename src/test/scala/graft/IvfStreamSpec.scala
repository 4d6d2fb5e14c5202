package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.{KMeans, VectorOps}
import graft.streaming.IvfStream

/** Streaming IVF maintenance contracts: stream == batch assignment for
  * any micro-batching (per-row purity against frozen centroids),
  * replay idempotence, newest-wins on re-keyed vectors, and cell
  * stats matching the maintained state. */
class IvfStreamSpec extends SparkSpec {
  import spark.implicits._

  // 90 deterministic 8-dim vectors in 3 loose directional groups
  private val vectors: Seq[(Long, Seq[Double])] =
    (1L to 90L).map { i =>
      val g = (i % 3).toInt
      val base = Array.fill(8)(0.05)
      base(g * 2) = 1.0
      base((g * 2 + 1) % 8) = 0.4 + (i % 7) * 0.05
      (i, base.toSeq)
    }

  private def df(rows: Seq[(Long, Seq[Double])]): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def trainCentroids(path: String): Unit = {
    val e = df(vectors)
      .select(col("vec_id"), VectorOps.quantized(col("embedding")).as("q"))
      .withColumn("n2", VectorOps.qnorm2(col("q")))
    KMeans.fit(e, "vec_id", "q", k = 4, iters = 2)
      .withColumn("cn2", VectorOps.qnorm2(col("cq")))
      .write.mode("overwrite").parquet(path)
  }

  private def stateMap(spark: org.apache.spark.sql.SparkSession, path: String): Map[Long, Int] =
    spark.read.parquet(path).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap

  test("stream state equals the one-shot batch assignment for any micro-batching") {
    val root = java.nio.file.Files.createTempDirectory("graft-ivfstream").toString
    trainCentroids(s"$root/cents")
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val batches = Seq(vectors.slice(0, 11), vectors.slice(11, 50), vectors.slice(50, 90))
    df(batches.head).write.mode("append").parquet(in)
    val stream = spark.readStream
      .schema(StructType.fromDDL("vec_id BIGINT, embedding ARRAY<DOUBLE>"))
      .parquet(in)
    val q = IvfStream.start(stream, s"$root/cents", s"$root/state", s"$root/ckpt")
    try {
      q.processAllAvailable()
      batches.tail.foreach { b =>
        df(b).write.mode("append").parquet(in)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = stateMap(spark, s"$root/state")
    val oneShot = IvfStream.assignBatch(df(vectors), spark.read.parquet(s"$root/cents"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(streamed == oneShot, "streamed assignments must equal the one-shot pass")
    assert(streamed.values.toSet.size > 1, "fixture must actually spread over cells")
  }

  test("replayed micro-batch is a no-op; cell stats read the maintained state") {
    val root = java.nio.file.Files.createTempDirectory("graft-ivfreplay").toString
    trainCentroids(s"$root/cents")
    val state = s"$root/state"
    IvfStream.processBatch(spark, df(vectors.take(40)), s"$root/cents", state)
    val first = stateMap(spark, state)
    IvfStream.processBatch(spark, df(vectors.take(40)), s"$root/cents", state) // crash replay
    assert(stateMap(spark, state) == first, "replay must rewrite identical rows")
    val stats = IvfStream.cellStats(spark, state).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(stats.values.sum == 40L)
    assert(stats == first.groupBy(_._2).map { case (c, m) => c -> m.size.toLong })
  }

  test("a vec_id duplicated WITHIN one batch resolves deterministically (min cell)") {
    val root = java.nio.file.Files.createTempDirectory("graft-ivfdup").toString
    trainCentroids(s"$root/cents")
    val g0 = vectors.find(_._1 == 3L).get._2
    val g1 = vectors.find(_._1 == 4L).get._2 // different directional group
    val dup = Seq((1L, g0), (1L, g1), (2L, g0))
    val state1 = s"$root/state1"
    IvfStream.processBatch(spark, df(dup).repartition(1), s"$root/cents", state1)
    val state2 = s"$root/state2"
    IvfStream.processBatch(spark, df(dup).repartition(3), s"$root/cents", state2)
    val a = stateMap(spark, state1)
    assert(a == stateMap(spark, state2), "intra-batch dup resolution must not depend on partitioning")
    assert(a.size == 2, "one row per vec_id")
    val cells = IvfStream.assignBatch(df(Seq((10L, g0), (11L, g1))),
      spark.read.parquet(s"$root/cents")).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a(1L) == math.min(cells(10L), cells(11L)), "dup resolves to the min cell")
  }

  test("a re-delivered vec_id with a CHANGED embedding takes the newest assignment") {
    val root = java.nio.file.Files.createTempDirectory("graft-ivfupsert").toString
    trainCentroids(s"$root/cents")
    val state = s"$root/state"
    IvfStream.processBatch(spark, df(vectors.take(10)), s"$root/cents", state)
    val before = stateMap(spark, state)(1L)
    // move vector 1 into a different directional group
    val moved = vectors.find(_._1 == 4L).get._2 // group-1-shaped embedding
    IvfStream.processBatch(spark, df(Seq((1L, moved))), s"$root/cents", state)
    val after = stateMap(spark, state)
    assert(after(1L) == stateMap(spark, state)(1L))
    assert(after.size == 10, "upsert must not duplicate keys")
    val expected = IvfStream.assignBatch(df(Seq((1L, moved))),
      spark.read.parquet(s"$root/cents")).collect()(0).getInt(1)
    assert(after(1L) == expected, s"newest assignment must win (was $before)")
  }
}
