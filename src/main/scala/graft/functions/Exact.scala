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

  /** Order-independent exact sum of a double column; result is DOUBLE.
    *
    * The quantized values are summed as DECIMAL(38,0), not BIGINT: at
    * 100 TB (~1e12 rows × ~1e7 cents > 2^63) a long sum would silently
    * wrap with ANSI off, while DuckDB promotes to HUGEINT — decimal keeps
    * both engines exact (the oracle's HUGEINT and our decimal represent
    * the same integer; the single cast-to-double is correctly rounded and
    * bit-identical on both sides).
    */
  def exactSum(c: Column, scale: Int = 2): Column = {
    val factor = math.pow(10, scale)
    sum(quantize(c, scale).cast("decimal(38,0)")).cast("double") / lit(factor)
  }

  /** Order-independent exact mean of a double column; result is DOUBLE. */
  def exactAvg(c: Column, scale: Int = 2): Column = {
    val factor = math.pow(10, scale)
    sum(quantize(c, scale).cast("decimal(38,0)")).cast("double") / lit(factor) / count(lit(1))
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
