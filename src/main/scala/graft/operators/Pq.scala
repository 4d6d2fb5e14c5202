package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Exact

/** Product Quantization (Jégou et al., "Product quantization for
  * nearest neighbor search", TPAMI 2011) over the suite's quantized
  * integer embedding grid — the third leg of the ANN stack next to IVF
  * (q40/q57) and SQ8 (q86): split each vector into `m` subvectors,
  * learn a tiny per-subspace codebook (`ksub` centroids) with Lloyd
  * iterations, and represent every vector by `m` small codes. A 64-dim
  * vector becomes m=4 bytes — 64× compression — and approximate inner
  * products need only a per-query lookup table of m × ksub partial
  * dots (ADC, asymmetric distance computation).
  *
  * Determinism contract (the KMeans.fit discipline, mirrored verbatim
  * in q113's oracle): all subvectors live on the 1e-6 integer grid,
  * assignment minimizes the EXACT integer L2 surrogate
  * `‖c‖² − 2⟨x,c⟩` (the ‖x‖² term is constant per vector) with
  * smallest-code tiebreak, means round back to the grid with the
  * `(2s+n) div (2n)` integer formula, initialization is the `ksub`
  * smallest ids (no RNG), and the iteration count is fixed. Training
  * twice on any partitioning gives bit-identical codebooks.
  *
  * Scale shape:
  *  - training/encoding joins broadcast the m×ksub codebook (64 rows
  *    here; m·ksub ≤ a few thousand in any real config) against the
  *    (id, s) subvector stream — the ksub-way candidate expansion is
  *    consumed map-side by a partial `min_by` before the exchange, so
  *    the network only ever carries n·m assignment rows;
  *  - ADC scoring joins the n·m code stream with the broadcast LUT and
  *    partial-sums map-side to n rows per query — the PQ linear-scan
  *    shape (SIMD LUT-add in native engines; here one broadcast hash
  *    join + map-side combine, no corpus shuffle);
  *  - nothing is ever all-pairs: candidates are capped per query and
  *    only the capped set pays the exact-rescore join.
  */
object Pq {

  /** Slice each quantized vector into `m` contiguous subvectors:
    * (id, s ∈ [0,m), sq ARRAY<LONG> of length dim/m). */
  def subvectors(vectors: DataFrame, id: String, q: String, m: Int,
                 subDim: Int): DataFrame = {
    val slices = array((0 until m).map(s =>
      slice(col(q), s * subDim + 1, subDim)): _*)
    vectors.select(col(id), posexplode(slices).as(Seq("s", "sq")))
  }

  /** Integer L2 surrogate ‖c‖² − 2⟨x,c⟩ (argmin-equivalent to true L2
    * for a fixed x) — exact BIGINT arithmetic. */
  private def l2Surrogate(sq: org.apache.spark.sql.Column,
                          cv: org.apache.spark.sql.Column) =
    VectorOps.qnorm2(cv) - lit(2L) * VectorOps.qdot(sq, cv)

  /** Train per-subspace codebooks: (s, code ∈ [0,ksub), cv ARRAY<LONG>).
    * `sub` is the [[subvectors]] output; ids must be unique per s. */
  def trainCodebooks(sub: DataFrame, id: String, ksub: Int,
                     iters: Int): DataFrame = {
    require(ksub > 0 && iters >= 0, s"ksub=$ksub iters=$iters")
    val spark = sub.sparkSession
    // init: the ksub smallest ids seed EVERY subspace (code = rank in id
    // order) — ksub driver rows, the KMeans.fit bounded-collect pattern.
    val idType = sub.schema(id).dataType
    val initIds = sub.select(col(id)).distinct().orderBy(col(id)).limit(ksub)
      .collect().zipWithIndex
      .map { case (r, i) => org.apache.spark.sql.Row(r.get(0), i) }
    val codeOfId = spark.createDataFrame(
      spark.sparkContext.parallelize(initIds.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(id, idType),
        org.apache.spark.sql.types.StructField("code",
          org.apache.spark.sql.types.IntegerType))))
    val init = sub.join(broadcast(codeOfId), Seq(id))
      .select(col("s"), col("code"), col("sq").as("cv"))

    (0 until iters).foldLeft(init) { (books, _) =>
      // assignment carries the subvector THROUGH the aggregate (first()
      // is exact here: every row of an (id, s) group holds the same sq),
      // so the update's posexplode reads it directly — the previous
      // `assignCodes(...).join(sub, ...)` re-shuffled the n·m subvector
      // stream once per Lloyd iteration just to re-attach sq. Codes are
      // the identical min_by; only the join is gone.
      val assigned = sub.join(broadcast(books), Seq("s"))
        .select(col(id), col("s"), col("sq"), col("code"),
          l2Surrogate(col("sq"), col("cv")).as("d2"))
        .groupBy(col(id), col("s"))
        .agg(min_by(col("code"), struct(col("d2"), col("code"))).as("code"),
          first(col("sq")).as("sq"))
      // update: per-(s, code, dim) exact means via posexplode over the
      // carried subvector, then one array reassembly — the grid-rounded
      // integer mean is the identical formula, replayed as
      // (2*sum+count)//(2*count) in the oracle. The one-wide-aggregate
      // variant (subDim element_at sums in a single groupBy) was
      // A/B-profiled and lost even at subDim=16 (see the shape note in
      // [[KMeans.fit]] and plans/r14/WIDEAGG_AB.txt); posexplode keeps
      // the update codegen'd at any width with no probed-width
      // assumption.
      val updated = assigned
        .select(col("s"), col("code"), posexplode(col("sq")).as(Seq("__j", "__x")))
        .groupBy(col("s"), col("code"), col("__j"))
        .agg(Exact.exactIntSum(col("__x")).as("__sm"), count(lit(1)).as("__n"))
        .select(col("s"), col("code"), col("__j"),
          expr("CAST((__sm * 2 + __n) div (__n * 2) AS BIGINT)").as("__mv"))
        .groupBy(col("s"), col("code"))
        .agg(transform(array_sort(collect_list(struct(col("__j"), col("__mv")))),
          t => t.getField("__mv")).as("cv2"))
      // empty codes keep their centroid; checkpoint cuts the per-
      // iteration lineage doubling (m·ksub rows — trivial). Lazy: the
      // next iteration's codebook broadcast build (or the caller's
      // first action) materializes it — the KMeans.fit discipline.
      books.join(updated, Seq("s", "code"), "left")
        .select(col("s"), col("code"), coalesce(col("cv2"), col("cv")).as("cv"))
        .localCheckpoint(false)
    }
  }

  /** Encode: nearest codebook entry per (id, subspace) under the exact
    * integer L2 surrogate, smallest-code tiebreak → (id, s, code). */
  def assignCodes(sub: DataFrame, id: String, books: DataFrame): DataFrame =
    sub.join(broadcast(books), Seq("s"))
      .select(col(id), col("s"), col("code"),
        l2Surrogate(col("sq"), col("cv")).as("d2"))
      .groupBy(col(id), col("s"))
      .agg(min_by(col("code"), struct(col("d2"), col("code"))).as("code"))

  /** Per-query ADC lookup table: partial dot of each query subvector
    * with each codebook entry → (qid, s, code, pdot). Size = queries ×
    * m × ksub — broadcastable whenever the query batch is. */
  def adcLut(querySub: DataFrame, id: String, books: DataFrame): DataFrame =
    querySub.join(broadcast(books), Seq("s"))
      .select(col(id).as("qid"), col("s"), col("code"),
        VectorOps.qdot(col("sq"), col("cv")).as("pdot"))
}
