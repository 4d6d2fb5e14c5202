package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pq, VectorOps}

/** Product-quantization kernel: slicing, training determinism under
  * partitioning, and the reconstruction-exactness corner (a corpus of
  * exactly ksub distinct subvector patterns is representable with zero
  * error, so ADC == exact dot).
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val m = 2
  private val subDim = 4

  private def toDf(vs: Seq[(Long, Seq[Long])]) =
    vs.toDF("id", "q")

  test("subvectors slices contiguously and tags subspaces 0..m-1") {
    val df = toDf(Seq((7L, (1L to 8L))))
    val got = Pq.subvectors(df, "id", "q", m, subDim)
      .orderBy(col("s")).collect()
      .map(r => (r.getInt(1), r.getSeq[Long](2).toList)).toList
    assert(got == List((0, List(1L, 2L, 3L, 4L)), (1, List(5L, 6L, 7L, 8L))))
  }

  test("training is bit-identical under any input partitioning") {
    val vs = (0L until 40L).map(i =>
      (i, (0 until dim).map(d => ((i * 31 + d * 17) % 23) - 11L)))
    val books = (1 to 2).map { parts =>
      val sub = Pq.subvectors(
        toDf(vs).repartition(parts * 3), "id", "q", m, subDim)
      Pq.trainCodebooks(sub, "id", ksub = 4, iters = 2)
        .orderBy(col("s"), col("code")).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2).toList)).toList
    }
    assert(books(0) == books(1) && books(0).size == m * 4)
  }

  test("ksub distinct patterns reconstruct exactly: ADC == true dot") {
    // 4 distinct full vectors, each repeated 5 times (ids interleaved);
    // with ksub=4 the codebooks can represent every subvector exactly,
    // so Σ_s LUT[s, code] must equal the exact full dot product.
    // Values are NONNEGATIVE on purpose: the suite's grid-rounding mean
    // formula (2s+n) div (2n) truncates toward zero, so a run of equal
    // NEGATIVE values reconstructs one grid unit high (e.g. five −1s →
    // 0) — deterministic and oracle-mirrored, but not exact; this test
    // pins the exactness claim where it genuinely holds.
    val base = Seq(
      Seq(3L, 1L, 2L, 0L, 5L, 1L, 2L, 4L),
      Seq(2L, 4L, 1L, 1L, 0L, 3L, 2L, 2L),
      Seq(1L, 1L, 1L, 3L, 2L, 2L, 0L, 1L),
      Seq(0L, 2L, 3L, 2L, 1L, 4L, 1L, 0L))
    val vs = (0L until 20L).map(i => (i, base((i % 4).toInt)))
    val df = toDf(vs)
    val sub = Pq.subvectors(df, "id", "q", m, subDim)
    val books = Pq.trainCodebooks(sub, "id", ksub = 4, iters = 2)
    val codes = Pq.assignCodes(sub, "id", books)
    val lut = Pq.adcLut(sub.filter(col("id") === 0L), "id", books)
    val adc = codes.join(lut, Seq("s", "code"))
      .groupBy(col("id")).agg(sum(col("pdot")).as("adc_dot"))
    val exact = df.select(col("id"), VectorOps.qdot(
        lit(base.head.toArray), col("q")).as("dot"))
    val joined = adc.join(exact, Seq("id")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("adc_dot") == r.getAs[Long]("dot"),
        s"id=${r.get(0)}")
    }
  }

  test("IVF-restricted ADC scores equal the full-scan ADC on the subset") {
    // The q115 candidate restriction must commute with ADC scoring: for
    // any candidate subset, the per-pair approximate dot from the
    // cand→codes→LUT join path is exactly the full-corpus q113 score for
    // that pair (routing only prunes — it never perturbs scores).
    val vs = (0L until 30L).map(i =>
      (i, (0 until dim).map(d => ((i * 13 + d * 7) % 19).toLong)))
    val df = toDf(vs)
    val sub = Pq.subvectors(df, "id", "q", m, subDim)
    val books = Pq.trainCodebooks(sub, "id", ksub = 4, iters = 2)
    val codes = Pq.assignCodes(sub, "id", books)
    val lut = Pq.adcLut(sub.filter(col("id") < 2L), "id", books)
    val full = codes.join(lut, Seq("s", "code"))
      .filter(col("qid") =!= col("id"))
      .groupBy(col("qid"), col("id").as("cid"))
      .agg(sum(col("pdot")).as("adc_dot"))
    // an arbitrary "probed" subset: even candidate ids only
    val cand = full.select(col("qid"), col("cid"))
      .filter(col("cid") % 2 === 0)
    val restricted = cand
      .join(codes.withColumnRenamed("id", "cid"), Seq("cid"))
      .join(lut, Seq("qid", "s", "code"))
      .groupBy(col("qid"), col("cid"))
      .agg(sum(col("pdot")).as("adc_dot"))
    val mismatch = restricted.as("r")
      .join(full.as("f"), Seq("qid", "cid"))
      .filter(col("r.adc_dot") =!= col("f.adc_dot"))
    assert(restricted.count() == cand.count())
    assert(mismatch.count() == 0)
  }
}
