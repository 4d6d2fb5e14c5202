package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Poisson-bootstrap kernel (Chamandy et al. 2012) —
  * shared by the batch CI query (q171) and [[graft.streaming.BootstrapStream]]
  * so the two sides cannot drift.
  *
  * Each row's multiplicity in replicate r is Poisson(1), drawn as a
  * PURE ROW FUNCTION: a 40-bit md5 hash of (key, replicate) inverted
  * through the Poisson(1) CDF pinned as integer thresholds (the tail
  * past 8, mass ~1.1e-6, is capped at 9). Replicate totals are plain
  * sums of multiplicity×weight — LINEAR in the input multiset, so
  * totals over any partition of the data merge by addition: the
  * property that makes the streaming fold exact (and, like every
  * additive sketch, replay must be batchId-guarded — addition is not
  * absorbing).
  */
object Bootstrap {

  /** Replicate count: 64 gives 5%/50%/95% order statistics at ranks
    * 4/32/61 under the ceil(p·R) lower-discrete convention (q117). */
  val R = 64

  /** Uniform-hash width feeding the inverse CDF (md5 hex digits / 4). */
  val HashBits = 40

  /** floor(CDF_Poisson(1)(k) · 2^40) for k = 0..8. */
  val PoissonCdf40: Seq[Long] = Seq(
    404487723187L, 808975446375L, 1011219307969L, 1078633928500L,
    1095487583633L, 1098858314660L, 1099420103164L, 1099500358665L,
    1099510390602L)

  /** The inverse-CDF CASE over a hash column named `h` — one string,
    * interpolated into BOTH the Spark plan and the DuckDB oracle so the
    * thresholds cannot desync (the q93 discipline). */
  def poissonCaseSql(h: String): String =
    PoissonCdf40.zipWithIndex
      .map { case (t, k) => s"WHEN $h < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 9 END")

  /** Poisson(1) multiplicity of the row identified by string `key` in
    * replicate `rep` (both engines: md5(prefix ‖ key ‖ '-' ‖ rep)). */
  def multiplicity(prefix: String, key: Column, rep: Column): Column = {
    val h = Sampling.hashBits(prefix,
      concat(key, lit("-"), rep.cast("string")), HashBits)
    PoissonCdf40.zipWithIndex.reverse
      .foldLeft(lit(9): Column) { case (els, (t, k)) =>
        when(h < t, k).otherwise(els)
      }
  }

  /** Per-replicate weighted totals of `rows`: one map pass over rows×R
    * with map-side partial aggregation into R groups — the shuffle
    * carries R rows per partition regardless of corpus size. `key`
    * must be a unique string row id; `weight` a LONG. */
  def replicateTotals(rows: DataFrame, key: Column, weight: Column,
                      prefix: String = "boot|", r: Int = R): DataFrame =
    rows.select(key.as("__k"), weight.as("__w"))
      .withColumn("rep", explode(sequence(lit(0), lit(r - 1))))
      .select(col("rep"),
        (multiplicity(prefix, col("__k"), col("rep")) * col("__w")).as("__mw"))
      .groupBy(col("rep")).agg(sum(col("__mw")).as("total"))
}
