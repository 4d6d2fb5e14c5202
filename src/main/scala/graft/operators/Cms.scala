package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch — the FREQUENCY member of the sketch tier, next to
  * KMV (distinct, [[Kmv]]) and the bottom-k quantile pairs
  * ([[graft.plans.QuantilePairSketch]]): estimate per-item counts from
  * d×w bounded counters instead of a corpus-sized exact groupBy.
  *
  * Counters are (j, bucket, n) rows with bucket_j(x) =
  * hash60(j || '|' || x) mod w — the md5-derived [[Kmv.hash60]]
  * discipline, so an oracle replays every bucket exactly. Estimates
  * take the MIN over the d rows (Cormode & Muthukrishnan 2005): always
  * >= the true count (one-sided), within ~2n/w with probability
  * 1 - (1/2)^d under pairwise-independent hashing.
  *
  * Why this scales where exact counting doesn't: the counter table is
  * d×w rows NO MATTER the corpus (d=4, w=1024 → 4096 rows, kilobytes)
  * — partials combine map-side and the exchange moves counters, not
  * tokens; it is additive ((A ⊎ B) sketches to the elementwise sum —
  * the stream/merge basis, spec-proved), and the estimate join
  * broadcasts the sketch, never the corpus.
  */
object Cms {

  val DefaultDepth = 4
  val DefaultWidth = 1024

  /** Row-j bucket of a token — pure, engine-replayable. */
  def bucket(token: Column, j: Int, w: Int): Column =
    pmod(Kmv.hash60(concat(lit(s"$j|"), token)), lit(w.toLong))

  private def bucketsArray(token: Column, d: Int, w: Int): Column =
    array((0 until d).map(j => bucket(token, j, w)): _*)

  /** Build the (j, bucket, n) counter table from a token frame — one
    * map pass + one d×w-bounded aggregate. Null tokens are skipped
    * (a null hashes to a null bucket, which would silently become a
    * phantom counter row). */
  def build(tokens: DataFrame, tokenCol: String,
            d: Int = DefaultDepth, w: Int = DefaultWidth): DataFrame = {
    require(d >= 1 && w >= 2, s"CMS geometry must be d >= 1, w >= 2, got d=$d w=$w")
    tokens
      .filter(col(tokenCol).isNotNull)
      .select(posexplode(bucketsArray(col(tokenCol), d, w)).as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket")).agg(count(lit(1)).as("n"))
  }

  /** [[build]] over PRE-AGGREGATED (token, weight) rows: counters are
    * weight sums, so `buildWeighted(tokens.groupBy(t).count, t, "count")`
    * equals `build(tokens, t)` exactly while hashing each DISTINCT
    * token once instead of once per occurrence (r14: the d md5s per row
    * were the whole cost of q93's sketch build — 4x fewer md5s when
    * keys repeat 4x). Null tokens skipped as in [[build]]. */
  def buildWeighted(tokens: DataFrame, tokenCol: String, weightCol: String,
                    d: Int = DefaultDepth, w: Int = DefaultWidth): DataFrame = {
    require(d >= 1 && w >= 2, s"CMS geometry must be d >= 1, w >= 2, got d=$d w=$w")
    tokens
      .filter(col(tokenCol).isNotNull)
      .select(col(weightCol).as("__w"),
        posexplode(bucketsArray(col(tokenCol), d, w)).as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket")).agg(sum(col("__w")).as("n"))
  }

  /** Merge two counter tables (elementwise sum) — the additive
    * homomorphism a streaming fold or a partition-wise build uses. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("j"), col("bucket")).agg(sum(col("n")).as("n"))

  /** Point-estimate counts for `queries`' `tokenCol`: min over the d
    * counter rows. The sketch side is d×w rows — broadcast; absent
    * buckets count 0 (a token the sketch never saw estimates 0 only
    * if some row never collided — still one-sided). Keeps every other
    * column of `queries`. NULL query tokens are skipped — mirroring
    * [[build]]'s null discipline; a null would otherwise estimate 0
    * and read as "absent from the corpus". */
  def estimate(cms: DataFrame, queries: DataFrame, tokenCol: String,
               d: Int = DefaultDepth, w: Int = DefaultWidth): DataFrame = {
    // the working columns would silently collide with caller columns
    // of the same name (the saltedJoin __salt lesson) — fail loudly
    val reserved = Seq("j", "bucket", "est_n").filter(queries.columns.contains)
    require(reserved.isEmpty,
      s"queries frame already has column(s) ${reserved.mkString(", ")} — rename before estimate")
    val carried = queries.columns.map(col)
    queries
      .filter(col(tokenCol).isNotNull)
      .select(carried :+ posexplode(bucketsArray(col(tokenCol), d, w))
        .as(Seq("j", "bucket")): _*)
      .join(broadcast(cms), Seq("j", "bucket"), "left")
      .groupBy(carried: _*)
      .agg(min(coalesce(col("n"), lit(0L))).as("est_n"))
  }
}
