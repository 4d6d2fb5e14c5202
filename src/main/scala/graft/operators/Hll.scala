package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The HyperLogLog register algebra — ONE home for register building,
  * the max-merge, and the estimator, shared by q148 and
  * [[graft.streaming.HllStream]] so the "streamed sketch equals the
  * batch sketch" contract holds by construction (the Kmv.scala
  * discipline, applied to the second distinct sketch).
  *
  * Geometry is fixed at m=256 registers (p=8) over the shared 60-bit
  * md5 keying (Kmv.hash60 / TextOps.gramHashes): idx = low 8 bits,
  * rank = leading-zero count of the remaining 52 bits + 1. All DuckDB
  * oracles mirror these formulas; change them only together.
  *
  * Determinism contract (the q148 derivation): the harmonic
  * denominator is carried as the RATIONAL INTEGER
  * S = Σ 2^(32−min(r,32)) so the raw estimator is ONE double division
  * by a precomputed constant; the small-range linear-counting branch
  * (E ≤ 2.5m, V>0) is the only ln() in the suite and is dormant at
  * oracle cardinalities.
  */
object Hll {

  val M = 256
  val AlphaC: Double =
    0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * 4294967296.0

  /** Register rank of a 60-bit hash's upper 52 bits: 53 − bit_length,
    * with the all-zero tail pinned to 53. */
  def rho(hv: Column): Column = {
    val w = shiftright(hv, 8)
    when(w === 0, lit(53)).otherwise(lit(53) - length(conv(w, 10, 2)))
  }

  /** (key, idx, r) register table from a BIGINT 60-bit hash column —
    * two cascaded hash aggregates, map-side combinable, at most m rows
    * per key. */
  def registers(df: DataFrame, key: String, hv: String): DataFrame =
    df.select(col(key), col(hv).bitwiseAND(lit((M - 1).toLong)).as("idx"),
        rho(col(hv)).as("rho"))
      .groupBy(col(key), col("idx"))
      .agg(max(col("rho")).as("r"))

  /** Max-merge of two register tables — the set-union homomorphism
    * (max is idempotent AND commutative, so merge is replay-safe:
    * folding the same batch twice is a no-op). */
  def merge(a: DataFrame, b: DataFrame, key: String): DataFrame =
    a.unionByName(b).groupBy(col(key), col("idx"))
      .agg(max(col("r")).as("r"))

  /** Per-key estimate from a register table: (key, n_filled, v_zero,
    * s_rational, est_hll). */
  def estimate(reg: DataFrame, key: String): DataFrame =
    reg.groupBy(col(key))
      .agg(count(lit(1)).as("n_filled"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 32 - least(r, 32))"))
          .as("s_present"))
      .withColumn("v_zero", lit(M) - col("n_filled"))
      .withColumn("s_rational",
        col("s_present") + col("v_zero") * lit(4294967296L))
      .withColumn("est_raw", lit(AlphaC) / col("s_rational").cast("double"))
      .withColumn("est_hll",
        when(col("v_zero") > 0 && col("est_raw") <= lit(2.5 * M),
          lit(M.toDouble) *
            log(lit(M.toDouble) / col("v_zero").cast("double")))
          .otherwise(col("est_raw")))
      .select(col(key), col("n_filled"), col("v_zero"), col("s_rational"),
        col("est_hll"))
}
