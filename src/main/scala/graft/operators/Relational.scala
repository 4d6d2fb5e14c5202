package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact

/** Core relational operators — the Spark-first re-expression of the
  * reference's operator inventory (SURVEY.md §2). Each is a pure
  * `DataFrame => DataFrame` transform, designed so Catalyst keeps
  * pushdown/pruning freedom and the physical plan scales:
  *
  *  - aggregations are hash aggs with map-side partials (groupBy/agg);
  *  - order-dependent pandas semantics (`last`, keep-first dedup) are
  *    expressed with deterministic window row_number / max_by — never
  *    Spark's non-deterministic `first`/`last`;
  *  - top-k is orderBy+limit → TakeOrderedAndProject (no global sort);
  *  - small dimensions are broadcast explicitly.
  */
object Relational {

  /** Monthly aggregation (reference transform.py:111-134, A1/A2/F5):
    * truncate an event timestamp to month, group, exact mean, plus a
    * deterministic "last value in month" = value at max (orderCol, tieCol).
    */
  def monthlyAgg(df: DataFrame, ts: String, value: String, keys: Seq[String],
                 tieBreak: String): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("month", date_trunc("month", col(ts)))
      .groupBy(keyCols :+ col("month"): _*)
      .agg(
        Exact.exactAvg(col(value)).as("avg_value"),
        max_by(col(value), struct(col(ts), col(tieBreak))).as("last_value"),
        count(lit(1)).as("n_obs"))
  }

  /** Per-group month-over-month delta via lag window (reference
    * summary.py:70-71, W1). Input must already be one row per
    * (keys, month). */
  def momChange(monthly: DataFrame, keys: Seq[String], metric: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("month"))
    monthly.withColumn("mom_change", col(metric) - lag(col(metric), 1).over(w))
  }

  /** Top-k by metric with full deterministic tiebreakers (reference
    * summary.py:77, O2). Compiles to TakeOrderedAndProject. */
  def topK(df: DataFrame, k: Int, metricDesc: String, tieBreakers: Seq[String]): DataFrame =
    df.orderBy(col(metricDesc).desc +: tieBreakers.map(col(_).asc): _*).limit(k)

  /** Deterministic dedup: keep the first row per key in (orderBy) order —
    * the well-defined form of pandas sort+drop_duplicates keep-first
    * (reference transform.py:12,107, A4).
    *
    * Expressed as `groupBy(keys).agg(min_by(struct(rest), struct(order)))`
    * rather than a window `row_number`. The window form must shuffle the
    * ENTIRE table and sort each reducer partition; the aggregate form
    * partial-aggregates before the exchange (`partial_min_by` in the
    * plan), shuffling only one combined row per key per map task — the
    * property that matters at 100 TB. (Physically a SortAggregate, not
    * HashAggregate — struct-typed buffers are not UnsafeRow-mutable —
    * but the map-side combine is unaffected.) Callers MUST pass an `order` that is
    * a total order over rows within a key (include every value column if
    * keys can fully duplicate), otherwise the kept row is undefined.
    * Order columns must be non-null (or identical under ties). */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    keepByOrd(df, keys, struct(order: _*), minSide = true)

  /** Latest row per group (reference summary.py:33-38, A5/W3): row at max
    * order columns per key. Same hash-agg shape as [[dedupKeepFirst]]. */
  def latestPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    keepByOrd(df, keys, struct(order: _*), minSide = false)

  private def keepByOrd(df: DataFrame, keys: Seq[String], ord: Column,
                        minSide: Boolean): DataFrame = {
    val rest = df.columns.filterNot(keys.contains)
    val row = struct(rest.map(col): _*)
    val picked = if (minSide) min_by(row, ord) else max_by(row, ord)
    df.groupBy(keys.map(col): _*)
      .agg(picked.as("__row"))
      .select(keys.map(col) ++ rest.map(c => col(s"__row.$c").as(c)): _*)
  }

  /** Dimension-enrich left join with an explicit broadcast of the small
    * side (reference main.py:56, J1). */
  def enrichLeft(fact: DataFrame, dim: DataFrame, key: String): DataFrame =
    fact.join(broadcast(dim), Seq(key), "left")

  /** Two-phase SALTED count/exact-sum for heavily skewed grouping keys.
    *
    * A plain `groupBy(hotKey)` sends every row of a hot key to one
    * reducer; at 100 TB a single key can hold billions of rows. Phase 1
    * groups by (keys, salt) — `buckets` reducers share each hot key —
    * and phase 2 merges the per-salt partials. Both phases are exact:
    * the value is quantized to integer cents, so partial sums combine
    * associatively with no FP drift. The salt derives from
    * `monotonically_increasing_id` (spreads identical rows, unlike a
    * content hash); it never reaches the output, so results are
    * independent of the salt assignment.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], value: String,
                     buckets: Int = 16, scale: Int = 2): DataFrame = {
    val factor = math.pow(10, scale)
    val partial = df
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(buckets.toLong)))
      .groupBy(keys.map(col) :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__n"),
        sum(Exact.quantize(col(value), scale).cast("decimal(38,0)")).as("__s"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n"),
        (sum(col("__s")).cast("double") / lit(factor)).as("sum_value"))
  }
}
