package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic ("exact") numeric aggregation helpers.
  *
  * Floating-point `sum`/`avg` over a shuffled Dataset is
  * order-of-combination dependent: partial aggregates merge in arrival
  * order, so two runs — or Spark vs the DuckDB oracle — can differ in the
  * last ulps, which breaks hash comparison. The fix is to aggregate in
  * integer space: quantize each value to a fixed scale (cents for money),
  * sum exactly as DECIMAL(38,0) (associative, commutative — order-free,
  * and safe past 2^63 where a long sum would silently wrap with ANSI
  * off), and divide back out once at the end (a single correctly-rounded
  * IEEE division, bit-identical across engines). Map-side partial
  * aggregation stays exact throughout — the property that matters at
  * 100 TB.
  */
object Exact {

  /** Quantize a double column to a BIGINT at 10^scale (e.g. scale=2 → cents). */
  def quantize(c: Column, scale: Int = 2): Column = {
    val factor = math.pow(10, scale)
    round(c * lit(factor)).cast("long")
  }

  /** Exact integer sum of an already-quantized LONG column, as
    * DECIMAL(38,0) — via SPLIT LONG ACCUMULATORS, not a decimal sum.
    *
    * A decimal(38,0) `sum` is exact but leaves the hash-agg fast path
    * (~2.6x slower than a long sum: 0.99 s vs 0.38 s on the same
    * 600k-row 3-column agg — the q01/q14 regression in BENCH_r02). A
    * bare long sum is fast but silently wraps past 2^63 with ANSI off
    * (at 100 TB, ~1e12 rows x ~1e7 cents crosses it). The split takes
    * both: two's-complement decompose each value q into
    * `hi = q >> 20` (arithmetic shift = floor division) and
    * `lo = q & (2^20-1)` ∈ [0, 2^20), so `q = hi*2^20 + lo` exactly for
    * ANY long including negatives. Each part is summed as a plain LONG
    * (codegen fast path, map-side combinable), and the two per-group
    * scalars recombine exactly in decimal. Overflow bounds: safe for
    * |q| < 2^40 (= $10^10 at cents) and up to 2^42 (~4e12) rows PER
    * GROUP — both comfortably past the 100 TB contract; beyond them use
    * [[exactSumWide]].
    */
  def exactIntSum(q: Column): Column = {
    val M = 1L << 20
    val hi = sum(shiftright(q, 20))
    val lo = sum(q.bitwiseAND(lit(M - 1)))
    hi.cast("decimal(38,0)") * lit(M) + lo.cast("decimal(38,0)")
  }

  /** Order-independent exact sum of a double column; result is DOUBLE.
    * The exact integer sum (see [[exactIntSum]]) matches the oracle's
    * HUGEINT sum; the single cast-to-double is correctly rounded and
    * bit-identical on both sides.
    */
  def exactSum(c: Column, scale: Int = 2): Column = {
    val factor = math.pow(10, scale)
    exactIntSum(quantize(c, scale)).cast("double") / lit(factor)
  }

  /** Order-independent exact mean of a double column; result is DOUBLE. */
  def exactAvg(c: Column, scale: Int = 2): Column = {
    val factor = math.pow(10, scale)
    exactIntSum(quantize(c, scale)).cast("double") / lit(factor) / count(lit(1))
  }

  /** Decimal-accumulator variant with NO row-count/magnitude bound —
    * the fallback when a single group can exceed [[exactIntSum]]'s
    * (generous) envelope. */
  def exactSumWide(c: Column, scale: Int = 2): Column = {
    val factor = math.pow(10, scale)
    sum(quantize(c, scale).cast("decimal(38,0)")).cast("double") / lit(factor)
  }

  /** DuckDB-SQL fragments matching the Spark expressions above, for
    * oracle pairs. Keep the operation order IDENTICAL to the Column
    * variants — both engines then perform the same IEEE ops.
    */
  def sumSql(expr: String, scale: Int = 2): String = {
    val factor = math.pow(10, scale).toLong
    s"CAST(sum(CAST(round($expr * $factor.0) AS BIGINT)) AS DOUBLE) / $factor.0"
  }

  def avgSql(expr: String, scale: Int = 2): String = {
    val factor = math.pow(10, scale).toLong
    s"CAST(sum(CAST(round($expr * $factor.0) AS BIGINT)) AS DOUBLE) / $factor.0 / count(*)"
  }
}
