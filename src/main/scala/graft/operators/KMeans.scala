package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Exact

/** Deterministic spherical k-means over QUANTIZED embedding vectors —
  * the centroid-training step that upgrades IVF ANN (VectorQueries q32)
  * from "centroids = a modulo sample" to learned cells.
  *
  * Everything is exact-integer so training is REPRODUCIBLE: vectors are
  * the 1e-6-grid quantized longs used by the whole vector stack
  * ([[VectorOps.quantized]]), per-cell means accumulate with
  * [[Exact.exactIntSum]] (order-free split-long sums) and round back to
  * the integer grid — two runs over any partitioning of the same input
  * produce bit-identical centroids. No RNG anywhere: initialization is
  * the k smallest ids (data-independent and stable), iterations are a
  * FIXED unrolled count (no driver-side convergence actions).
  *
  * Scale posture per iteration (the 100 TB contract):
  *  - assignment: the k centroids travel as three parallel arrays on a
  *    SINGLE broadcast row and the argmax-cosine runs inside one
  *    codegen'd expression ([[graft.plans.CellArgMaxCosineLong]]) —
  *    map-only, no n x k row blow-up, no shuffle of the corpus;
  *  - update: per-(cell, dim) exact means via posexplode (map-side
  *    combined — each task ships at most k·dims partial-sum rows) plus
  *    a k·dims → k array reassembly; every operator stays inside
  *    whole-stage codegen at ANY vector width (the one-wide-aggregate
  *    alternative leaves codegen past ~100 fields and measured slower
  *    at dims=64 — see the shape note in [[fit]]);
  *  - empty cells inherit their previous centroid (left join + coalesce)
  *    so k never silently shrinks.
  */
object KMeans {

  /** Train `k` centroids with `iters` Lloyd iterations.
    *
    * @param vectors (id, q) — id ascending-unique, q = quantized
    *        ARRAY<LONG>; the update step is width-agnostic per row
    *        (posexplode), so no width is probed and no fixed-width
    *        assumption is baked into the plan — though the vector index
    *        writers enforce uniform dims upstream anyway.
    * @return (cell INT, cq ARRAY<LONG>) — k rows
    */
  def fit(vectors: DataFrame, id: String, q: String, k: Int, iters: Int): DataFrame = {
    require(k > 0, "k must be positive")
    require(iters >= 0, "iters must be non-negative")
    // NB: a corpus with fewer than k vectors yields fewer than k
    // centroids (init is the first k rows in id order) — the "empty
    // cells keep their centroid" guarantee below covers iteration-time
    // shrinkage, not undersized input.
    val v = vectors.select(col(id).as("__vid"), col(q).as("__vq"))
      .withColumn("__vn2", VectorOps.qnorm2(col("__vq")))

    // init: the k smallest ids, numbered 0..k-1 in id order. The ids are
    // collected to the driver (k rows — bounded by the caller's centroid
    // budget, ⌈√n⌉ on the q40 path) and joined back as a broadcast map:
    // no global-ORDER-BY window (which would be a single-partition sort
    // and warn `WindowExec: No Partition Defined`), and the numbering is
    // deterministic because ids are unique.
    val spark = vectors.sparkSession
    val idType = v.schema("__vid").dataType
    val initIds = v.select(col("__vid")).orderBy(col("__vid")).limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => org.apache.spark.sql.Row(r.get(0), i) }
    val cellOfId = spark.createDataFrame(
      spark.sparkContext.parallelize(initIds.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__vid", idType),
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType))))
    val init = v.join(broadcast(cellOfId), Seq("__vid"))
      .select(col("cell"), col("__vq").as("cq"))

    (0 until iters).foldLeft(init) { (cents, _) =>
      // assignment: per vector, the cell with max (cosine, -cell) — the
      // cell tiebreak makes ties deterministic. ONE map-only codegen'd
      // pass: the k centroids ride along as three parallel arrays on a
      // single broadcast row and the argmax runs inside
      // CellArgMaxCosineLong — no n x k row blow-up and no per-
      // iteration aggregate exchange (the crossJoin + max_by
      // formulation this replaces shuffled the whole corpus per pass).
      val assigned = v.crossJoin(broadcast(
          VectorOps.centroidArrays(cents, "cell", "cq")))
        .select(col("__vid"), col("__vq"),
          VectorOps.cellArgMax(col("__vq"), col("__vn2"),
            col("cells"), col("cqs"), col("cn2s")).cast("int").as("cell"))
      // update: exact per-(cell, dim) mean via posexplode, rounded back
      // to the grid — the mean is (2s + n) div (2n) with INTEGRAL
      // division (truncation toward zero): exact integer arithmetic,
      // and DuckDB's `//` truncates identically, so the whole training
      // loop stays oracle-mirrorable (q40).
      //
      // Shape note (r14, measured): the r13-snapshot "one wide hash
      // aggregate keyed by cell" variant (dims element_at exact sums in
      // one groupBy) was A/B-profiled against this posexplode shape at
      // dims=64/subDim=16 and LOST consistently (q40 3.2-4.0 s wide vs
      // 2.2-2.5 s posexplode; q113 3.2 vs 2.6-2.9; q115 5.0-5.5 vs
      // 3.8-4.4; plans/r14/WIDEAGG_AB.txt): at dims=64 the update
      // carries ~130 aggregate buffer fields — past
      // spark.sql.codegen.maxFields, so the stage leaves whole-stage
      // codegen, and the generated row-update projection is a huge
      // method the JVM refuses to JIT. The posexplode shape pays one
      // extra (tiny, k×dims-row) exchange per round but keeps every
      // operator codegen'd at ANY width — no dims probe, no ragged-
      // width hazard, no Janino cliff at real embedding widths.
      val updated = assigned
        .select(col("cell"), posexplode(col("__vq")).as(Seq("__pos", "__x")))
        .groupBy(col("cell"), col("__pos"))
        .agg(Exact.exactIntSum(col("__x")).as("__s"), count(lit(1)).as("__n"))
        .select(col("cell"), col("__pos"),
          expr("CAST((__s * 2 + __n) div (__n * 2) AS BIGINT)").as("__m"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("__pos"), col("__m")))),
          s => s.getField("__m")).as("cq2"))
      // empty cells keep their previous centroid. localCheckpoint (k
      // rows — trivial) cuts the iteration lineage: without it every
      // iteration references the previous centroids TWICE (assignment +
      // fallback join), so the physical plan doubles per iteration
      // (8 BNLJs / 48 exchanges at iters=2 before the cut). LAZY: the
      // next iteration's centroid-array broadcast build (or the
      // caller's first action) is the job that materializes it —
      // sequential, and it completes before the fallback join's stages
      // read the same blocks, so each iteration costs one scheduled job
      // instead of two.
      cents.join(updated, Seq("cell"), "left")
        .select(col("cell"), coalesce(col("cq2"), col("cq")).as("cq"))
        .localCheckpoint(false)
    }
  }

  /** Assign each vector to its trained cell: (id, cell). Same broadcast
    * argmax-cosine as training (one map-side pass, no corpus shuffle). */
  def assign(vectors: DataFrame, id: String, q: String, centroids: DataFrame): DataFrame = {
    val c = centroids.withColumn("cn2", VectorOps.qnorm2(col("cq")))
    vectors.select(col(id), col(q).as("__vq"))
      .withColumn("__vn2", VectorOps.qnorm2(col("__vq")))
      .crossJoin(broadcast(c))
      .select(col(id), col("cell"),
        VectorOps.cosine(VectorOps.qdot(col("__vq"), col("cq")),
          col("__vn2"), col("cn2")).as("__cos"))
      .groupBy(col(id))
      .agg(max_by(col("cell"), struct(col("__cos"), -col("cell"))).as("cell"))
  }
}
