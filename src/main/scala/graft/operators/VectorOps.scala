package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-vector operators: exact cosine similarity, top-k search, and
  * LSH-style bucketing for approximate search at scale.
  *
  * All similarity math is done in QUANTIZED INTEGER space: each element is
  * rounded to a 1e-6 grid and dot products / squared norms are exact BIGINT
  * sums. The only floating-point steps are the final `cast / sqrt / divide`
  * — identical operand values on any engine or partition order, so results
  * are bit-identical and oracle-checkable. (A float dot product would
  * differ in the last ulps between Spark and DuckDB and break hash
  * comparison.) Bounds: |q| <= ~1e7 per element → per-pair sums < 2^63 for
  * dims up to ~1e4.
  */
object VectorOps {

  /** Quantize an ARRAY<FLOAT/DOUBLE> to ARRAY<BIGINT> on a 1e-6 grid.
    * The element is cast to DOUBLE before multiplying — DuckDB would
    * otherwise compute FLOAT*INT in 32-bit and round different values. */
  def quantized(v: Column, scale: Double = 1e6): Column =
    transform(v, x => round(x.cast("double") * lit(scale)).cast("long"))

  /** Exact dot product of two quantized arrays (BIGINT). A custom
    * codegen'd expression ([[graft.plans.ArrayDotLong]]): the built-in
    * `aggregate(zip_with(...))` is interpreted + allocating and was >10x
    * slower on all-pairs workloads. */
  def qdot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.ArrayDotLong(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))

  /** Exact squared norm of a quantized array (BIGINT). */
  def qnorm2(a: Column): Column = qdot(a, a)

  /** Cosine similarity from exact integer dot/norms; the three FP ops
    * (cast, sqrt, divide) are correctly rounded and engine-independent. */
  def cosine(dot: Column, n2a: Column, n2b: Column): Column =
    dot.cast("double") / sqrt(n2a.cast("double")) / sqrt(n2b.cast("double"))

  /** Pack a centroid table into ONE row of three parallel arrays
    * (cells ARRAY<BIGINT>, cqs ARRAY<ARRAY<BIGINT>>, cn2s ARRAY<BIGINT>),
    * sorted by cell id — the broadcast-row input of [[cellArgMax]].
    * The interpreted `transform` lambdas run over k elements of a SINGLE
    * row, so the cost is negligible and the per-vector hot path stays
    * fully codegen'd. */
  def centroidArrays(cents: DataFrame, cellCol: String, cqCol: String): DataFrame =
    cents
      .select(struct(col(cellCol).cast("long").as("cell"), col(cqCol).as("cq"),
        qnorm2(col(cqCol)).as("cn2")).as("c"))
      .agg(sort_array(collect_list(col("c"))).as("cs"))
      .select(
        transform(col("cs"), s => s.getField("cell")).as("cells"),
        transform(col("cs"), s => s.getField("cq")).as("cqs"),
        transform(col("cs"), s => s.getField("cn2")).as("cn2s"))

  /** Per-GROUP [[centroidArrays]]: one packed row per value of
    * `groupCol` — the broadcast table of a TWO-LEVEL IVF, where each
    * coarse cell carries only its member centroids and a vector's fine
    * assignment joins its coarse cell's row (still a broadcast: the
    * whole table is the k centroids re-grouped, same few MB). */
  def centroidArraysBy(cents: DataFrame, groupCol: String,
                       cellCol: String, cqCol: String): DataFrame =
    cents
      .select(col(groupCol), struct(col(cellCol).cast("long").as("cell"),
        col(cqCol).as("cq"), qnorm2(col(cqCol)).as("cn2")).as("c"))
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(col("c"))).as("cs"))
      .select(col(groupCol),
        transform(col("cs"), s => s.getField("cell")).as("cells"),
        transform(col("cs"), s => s.getField("cq")).as("cqs"),
        transform(col("cs"), s => s.getField("cn2")).as("cn2s"))

  /** IVF cell assignment as one codegen'd map-only expression
    * ([[graft.plans.CellArgMaxCosineLong]]): the cell id with maximal
    * cosine (ties to the smallest id). Replaces the crossJoin + max_by
    * formulation, which materializes n x k rows and shuffles a hash
    * aggregate per assignment pass. */
  def cellArgMax(q: Column, qn2: Column, cells: Column, cqs: Column, cn2s: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.ColumnBridge
    b.column(graft.plans.CellArgMaxCosineLong(
      b.expression(q), b.expression(qn2), b.expression(cells),
      b.expression(cqs), b.expression(cn2s)))
  }

  /** Multi-word sign SIGNATURE of a quantized vector column (by name):
    * an ARRAY<BIGINT> of ⌈dim/64⌉ words; bit (i mod 64) of word
    * (i div 64) is set iff element i > 0 — random-hyperplane LSH with
    * axis planes, OR-folded per word so bit 63 stays exact where a SUM
    * would overflow. The 1-bit member of the compression ladder (q202 /
    * q206 / [[SigIndex]]): 8·⌈d/64⌉ bytes per vector is 1/256 the
    * bytes of the fp32 vector, and candidate ranking is Σ popcount(xor)
    * Hamming distance over aligned words ([[hamming]]).
    *
    * VERDICT r10 #2 lifted the old hard 64-dim cap: word w folds ONLY
    * elements [64w, 64w+63], so `shiftleft`'s 6-bit shift masking can
    * never alias a bit across words (the hazard the old raise guarded).
    * At dim <= 64 the single word equals the old scalar signature bit
    * for bit. The tail word of a non-multiple-of-64 dim folds the
    * remaining elements only.
    *
    * Both halves of the family are native codegen'd expressions: the
    * per-VECTOR pack is [[graft.plans.SignSigWords]] (one primitive
    * loop replacing the interpreted transform/aggregate/zip_with
    * chain — neutral at bench scale, but the corpus-sized pack pass
    * of a 100 TB build belongs in codegen), and the per-PAIR hot
    * scan is [[hamming]]. */
  def signSig(colName: String): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.SignSigWords(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(col(colName))))

  /** Hamming distance between two [[signSig]] signatures — the hot
    * corpus-wide scan of the sign-hash family, as the codegen'd
    * [[graft.plans.HammingXorLong]] (Σ bit_count(a[w] ^ b[w]); a tight
    * primitive loop inside WholeStageCodegen, no per-word lambdas). */
  def hamming(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.HammingXorLong(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))

  /** Sign-bit LSH bucket over the first `bits` dimensions (axis-aligned
    * random-hyperplane hashing). 2^bits buckets; vectors only compete
    * within their bucket — the approximate-search scale path that replaces
    * the all-pairs product with a `groupBy(bucket)` equi-join. */
  def signBucket(v: Column, bits: Int = 4): Column = signBucketAt(v, 0, bits)

  /** Sign-bit bucket over `bits` dimensions starting at 0-based dimension
    * `start` — one hash table of a MULTI-TABLE LSH family (each table
    * buckets a disjoint dim slice, so a pair colliding in ANY table
    * becomes a candidate; more tables = higher recall, wider buckets =
    * fewer false candidates). */
  def signBucketAt(v: Column, start: Int, bits: Int): Column =
    (0 until bits).map { i =>
      when(element_at(v, start + i + 1) >= 0, lit(1 << (bits - 1 - i))).otherwise(lit(0))
    }.reduce(_ + _)
}
