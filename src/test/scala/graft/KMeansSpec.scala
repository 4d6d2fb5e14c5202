package graft

import org.apache.spark.sql.functions._

import graft.operators.{KMeans, VectorOps}

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // 3 well-separated direction clusters in 8 dims, 20 vectors each:
  // cluster c points near axis 2c with deterministic jitter
  private def corpus = {
    val rnd = new scala.util.Random(3)
    (0 until 60).map { i =>
      val c = i % 3
      val base = Array.fill(8)(0.05f * (rnd.nextFloat() - 0.5f))
      base(2 * c) += 1.0f
      (i.toLong, base.toSeq)
    }
  }

  private def quantizedDf(part: Int) = corpus.toDF("id", "v")
    .repartition(part)
    .select(col("id"), VectorOps.quantized(col("v")).as("q"))

  test("kmeans recovers planted direction clusters") {
    val cents = KMeans.fit(quantizedDf(4), "id", "q", k = 3, iters = 3)
    assert(cents.count() == 3)
    val cells = KMeans.assign(quantizedDf(4), "id", "q", cents)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every ground-truth cluster lands in exactly one cell, and the
    // three cells are distinct
    val byTruth = (0 until 3).map(c => (0 until 60).filter(_ % 3 == c).map(i => cells(i.toLong)).toSet)
    assert(byTruth.forall(_.size == 1), s"split cluster: $byTruth")
    assert(byTruth.flatten.toSet.size == 3, s"merged clusters: $byTruth")
  }

  test("training is bit-deterministic across partitionings") {
    def fitArrays(part: Int): Seq[(Int, Seq[Long])] =
      KMeans.fit(quantizedDf(part), "id", "q", k = 3, iters = 3)
        .orderBy("cell").collect()
        .map(r => (r.getInt(0), r.getSeq[Long](1))).toSeq
    assert(fitArrays(1) == fitArrays(7), "centroids drift with partitioning")
  }

  test("wide embeddings (dims past the codegen field cap) train correctly") {
    // the posexplode update is width-agnostic: a 100-dim corpus — the
    // width at which a dims-wide one-aggregate update would fall out of
    // whole-stage codegen — recovers its planted clusters and stays
    // bit-deterministic under partitioning
    val rnd = new scala.util.Random(7)
    val wideCorpus = (0 until 30).map { i =>
      val base = Array.fill(100)(0.05f * (rnd.nextFloat() - 0.5f))
      base(17 * (i % 2)) += 1.0f
      (i.toLong, base.toSeq)
    }
    def fit100(parts: Int): Seq[(Int, Seq[Long])] =
      KMeans.fit(
          wideCorpus.toDF("id", "v").repartition(parts)
            .select(col("id"), VectorOps.quantized(col("v")).as("q")),
          "id", "q", k = 2, iters = 2)
        .orderBy("cell").collect()
        .map(r => (r.getInt(0), r.getSeq[Long](1))).toSeq
    val cents = fit100(3)
    assert(cents.size == 2)
    assert(cents == fit100(7), "100-dim centroids drift with partitioning")
  }

  test("empty cells keep their previous centroid (k never shrinks)") {
    // k = 5 over a corpus with only 3 real directions: some cells may
    // end up empty during iterations, but fit must still return 5
    val cents = KMeans.fit(quantizedDf(4), "id", "q", k = 5, iters = 3)
    assert(cents.count() == 5)
    assert(cents.filter(col("cq").isNull).count() == 0)
  }
}
