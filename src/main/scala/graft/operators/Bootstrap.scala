package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Poisson-bootstrap kernel (Chamandy et al. 2012) —
  * shared by the batch CI query (q171) and [[graft.streaming.BootstrapStream]]
  * so the two sides cannot drift.
  *
  * Each row's multiplicity in replicate r is Poisson(1), drawn as a
  * PURE ROW FUNCTION and inverted through the Poisson(1) CDF pinned as
  * integer thresholds (the tail past 8, mass ~1.1e-6, is capped at 9).
  * Replicate totals are plain sums of multiplicity×weight — LINEAR in
  * the input multiset, so totals over any partition of the data merge
  * by addition: the property that makes the streaming fold exact (and,
  * like every additive sketch, replay must be batchId-guarded —
  * addition is not absorbing).
  *
  * The per-replicate uniform costs ONE md5 PER ROW, not per (row,
  * replicate): the row's 32-hex md5 splits into three 40-bit seeds
  * (s0, s1, s2), and replicate r's uniform is the random quadratic
  * u(r) = (s0 + s1·r + s2·r²) mod 2^40 — a polynomial hash with random
  * coefficients, hence 3-WISE INDEPENDENT across replicates (pairwise
  * independence is what the bootstrap variance needs; three-wise is a
  * margin). Hashing each (row, replicate) through md5 instead measured
  * 65 s at sf0.1 — 38M string hashes — vs ~2 s for the polynomial; all
  * products stay < 2^53 (s·r² ≤ 2^40·2^12), so the arithmetic is exact
  * BIGINT on both engines with no wrap semantics in play.
  */
object Bootstrap {

  /** Replicate count: 64 gives 5%/50%/95% order statistics at ranks
    * 4/32/61 under the ceil(p·R) lower-discrete convention (q117).
    * The r² term caps the exact-arithmetic envelope at R ≤ 2^11. */
  val R = 64

  /** Uniform width: 2^40, matching the threshold table. */
  val Mod40: Long = 1L << 40

  /** floor(CDF_Poisson(1)(k) · 2^40) for k = 0..8. */
  val PoissonCdf40: Seq[Long] = Seq(
    404487723187L, 808975446375L, 1011219307969L, 1078633928500L,
    1095487583633L, 1098858314660L, 1099420103164L, 1099500358665L,
    1099510390602L)

  /** The inverse-CDF CASE over a uniform column named `h` — one string,
    * interpolated into BOTH the Spark plan and the DuckDB oracle so the
    * thresholds cannot desync (the q93 discipline). */
  def poissonCaseSql(h: String): String =
    PoissonCdf40.zipWithIndex
      .map { case (t, k) => s"WHEN $h < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 9 END")

  /** The three 40-bit polynomial seeds of a row (compute BEFORE any
    * replicate explode — this is the only md5). DuckDB twin of seed i:
    * `CAST(('0x' || substr(md5(prefix || key), 1+10*i, 10)) AS BIGINT)`. */
  def seeds(prefix: String, key: Column): Seq[Column] = {
    val md = md5(concat(lit(prefix), key))
    (0 until 3).map(i =>
      conv(substring(md, 1 + 10 * i, 10), 16, 10).cast("long"))
  }

  /** Replicate `rep`'s uniform in [0, 2^40) from the row seeds. */
  def uniform(s0: Column, s1: Column, s2: Column, rep: Column): Column =
    pmod(s0 + s1 * rep + s2 * rep * rep, lit(Mod40))

  /** Poisson(1) multiplicity from the row seeds and replicate index. */
  def multiplicity(s0: Column, s1: Column, s2: Column, rep: Column): Column = {
    val u = uniform(s0, s1, s2, rep)
    PoissonCdf40.zipWithIndex.reverse
      .foldLeft(lit(9): Column) { case (els, (t, k)) =>
        when(u < t, k).otherwise(els)
      }
  }

  /** Per-replicate weighted totals of `rows`: one md5 + one map pass
    * over rows×R with map-side partial aggregation into R groups — the
    * shuffle carries R rows per partition regardless of corpus size.
    * `key` must be a unique string row id; `weight` a LONG. */
  def replicateTotals(rows: DataFrame, key: Column, weight: Column,
                      prefix: String = "boot|", r: Int = R): DataFrame = {
    val Seq(s0, s1, s2) = seeds(prefix, key)
    rows.select(s0.as("__s0"), s1.as("__s1"), s2.as("__s2"), weight.as("__w"))
      .withColumn("rep", explode(sequence(lit(0), lit(r - 1))))
      .select(col("rep"),
        (multiplicity(col("__s0"), col("__s1"), col("__s2"), col("rep"))
          * col("__w")).as("__mw"))
      .groupBy(col("rep")).agg(sum(col("__mw")).as("total"))
  }
}
