package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.plans.QuantilePairSketch

/** Column algebra for the mergeable quantile sketch
  * ([[graft.plans.QuantilePairSketch]]) — ONE home for the aggregate,
  * the set-union merge, and the rank read-off, shared by q66, the q60
  * profiler, and the streaming profile so the comparability contracts
  * cannot drift (the [[Kmv]] discipline).
  *
  * All DuckDB oracles mirror these formulas exactly:
  *  - the sample is the k smallest DISTINCT (hv, v) pairs
  *    (`row_number() OVER (ORDER BY hv, v) <= k` after DISTINCT);
  *  - the p-quantile is the sampled value at rank
  *    `max(1, ceil(p * m))` of the m sampled values sorted ascending.
  */
object QSketch {

  /** Bottom-k (hash, value) pair aggregate. Keep BOTH inputs bare
    * column references — TypedImperativeAggregate evaluates children
    * interpreted per row (the Profile pre-projection lesson). */
  def pairSketch(hv: Column, v: Column, k: Int): Column =
    ColumnBridge.column(QuantilePairSketch(
      ColumnBridge.expression(hv), ColumnBridge.expression(v), k).toAggregateExpression())

  private val emptyPairs = "array<struct<hv:bigint,v:double>>"

  /** Bottom-k of the union of two pair sketches (either nullable) —
    * array_sort's natural struct order IS the (hv, v) pair order, so
    * this is the same set-union homomorphism as [[Kmv.mergeArrays]]. */
  def mergePairs(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(
      coalesce(a, array().cast(emptyPairs)),
      coalesce(b, array().cast(emptyPairs))))), 1, k)

  /** The p-quantile read-off: sampled value at rank max(1, ceil(p·m)),
    * null for an empty sketch. Exact when the group had ≤ k rows. */
  def quantile(pairs: Column, p: Double): Column = {
    require(p > 0.0 && p <= 1.0, s"quantile p must be in (0, 1], got $p")
    val values = array_sort(transform(pairs, x => x.getField("v")))
    val m = size(values)
    val rank = greatest(lit(1L), ceil(lit(p) * m.cast("double"))).cast("int")
    when(m > 0, element_at(values, rank))
  }
}
