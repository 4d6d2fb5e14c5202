package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.streaming.HeavyHittersStream

/** Streaming Misra-Gries contracts: the superset GUARANTEE (every term
  * with freq > N/(k+1) is a candidate) across any micro-batching, the
  * additive-counts replay guard, the bounded state, n_total accounting,
  * and the k-drift guard. */
class HeavyHittersStreamSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16

  // Skewed corpus: 6 hot terms carry most of the mass over a 150-term
  // tail — hot frequencies are far above N/(k+1).
  private val corpus: Seq[(Long, String)] =
    (0L until 90L).map { i =>
      val hot = (0 to 5).map(h => Seq.fill(6 - h)(s"hot$h")).flatten
      val tail = (0 to 3).map(j => s"tail${(i * 7 + j) % 150}")
      (i, scala.util.Random.shuffle(hot ++ tail).mkString(" "))
    }

  private def df(rows: Seq[(Long, String)]): DataFrame = rows.toDF("doc_id", "text")

  private def exactCounts(rows: Seq[(Long, String)]): Map[String, Long] =
    rows.flatMap(_._2.split(" ")).groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def stateRows(path: String): Map[String, Long] =
    spark.read.parquet(path).filter(col("term").isNotNull)
      .select("term", "cnt").collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def stateMeta(path: String): (Long, Long) = {
    val r = spark.read.parquet(path).select(col("hi"), col("n_total")).first()
    (r.getLong(0), r.getLong(1))
  }

  test("guarantee survives streaming: heavy terms are candidates after any split") {
    val exact = exactCounts(corpus)
    val n = exact.values.sum
    val heavy = exact.filter { case (_, c) => c * (K + 1) > n }.keySet
    assert(heavy.nonEmpty && heavy.size <= 6, s"fixture sanity: $heavy")
    for (splits <- Seq(Seq(30, 60), Seq(1, 45), Seq(89))) {
      val root = java.nio.file.Files.createTempDirectory("graft-hh").toString
      val state = s"$root/state"
      val bounds = (0 +: splits) :+ corpus.size
      bounds.sliding(2).zipWithIndex.foreach { case (Seq(a, b), id) =>
        HeavyHittersStream.processBatch(spark, df(corpus.slice(a, b)), id.toLong, state, K)
      }
      val cands = stateRows(state)
      assert(cands.size <= K, "state stays bounded")
      assert(heavy.subsetOf(cands.keySet),
        s"split $splits lost heavy terms: ${heavy -- cands.keySet}")
      assert(stateMeta(state)._2 == n, "n_total accounts every token exactly once")
    }
  }

  test("foreachBatch wiring: candidates + threshold view from a live stream") {
    val root = java.nio.file.Files.createTempDirectory("graft-hh-stream").toString
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    df(corpus.take(40)).write.mode("append").parquet(in)
    val stream = spark.readStream
      .schema(StructType.fromDDL("doc_id BIGINT, text STRING"))
      .parquet(in)
    val q = HeavyHittersStream.start(stream, s"$root/state", s"$root/ckpt", K)
    try {
      q.processAllAvailable()
      df(corpus.drop(40)).write.mode("append").parquet(in)
      q.processAllAvailable()
    } finally q.stop()
    val view = HeavyHittersStream.currentCandidates(spark, s"$root/state").collect()
    assert(view.nonEmpty && view.forall(_.getLong(2) == exactCounts(corpus).values.sum))
    val exact = exactCounts(corpus)
    val n = exact.values.sum
    val heavy = exact.filter { case (_, c) => c * (K + 1) > n }.keySet
    assert(heavy.subsetOf(view.map(_.getString(0)).toSet))
  }

  test("replayed batchId is a no-op (additive counts need the high-water guard)") {
    val root = java.nio.file.Files.createTempDirectory("graft-hh-replay").toString
    val state = s"$root/state"
    HeavyHittersStream.processBatch(spark, df(corpus.take(30)), 0L, state, K)
    val first = (stateRows(state), stateMeta(state))
    HeavyHittersStream.processBatch(spark, df(corpus.take(30)), 0L, state, K)
    assert((stateRows(state), stateMeta(state)) == first,
      "replay must not inflate counts or n_total")
    HeavyHittersStream.processBatch(spark, df(corpus.slice(30, 60)), 1L, state, K)
    assert(stateMeta(state)._2 > first._2._2, "a NEW batch folds in")
  }

  test("a k-drifted caller fails loudly instead of merging incompatible summaries") {
    val root = java.nio.file.Files.createTempDirectory("graft-hh-k").toString
    val state = s"$root/state"
    HeavyHittersStream.processBatch(spark, df(corpus.take(10)), 0L, state, K)
    val e = intercept[IllegalArgumentException] {
      HeavyHittersStream.processBatch(spark, df(corpus.drop(10)), 1L, state, K + 1)
    }
    assert(e.getMessage.contains(s"built with k=$K"))
  }

  test("empty first batch still records the sentinel; mgMerge can cancel to empty") {
    val root = java.nio.file.Files.createTempDirectory("graft-hh-empty").toString
    val state = s"$root/state"
    HeavyHittersStream.processBatch(spark,
      Seq((1L, Option.empty[String])).toDF("doc_id", "text"), 0L, state, K)
    assert(stateRows(state).isEmpty && stateMeta(state) == (0L, 0L))
    HeavyHittersStream.processBatch(spark, df(corpus.take(5)), 1L, state, K)
    assert(stateRows(state).nonEmpty)
    // mgMerge boundary: k+1 equal-count singleton terms cancel to nothing
    val eq = (0 until K + 1).map(i => (s"t$i", 1L)).toDF("term", "cnt")
    val out = HeavyHittersStream.mgMerge(
      spark.emptyDataset[(String, Long)].toDF("term", "cnt"), eq, K)
    assert(out.count() == 0L, "all-equal overflow cancels every counter")
  }
}
