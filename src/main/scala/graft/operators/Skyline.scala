package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-frontier (skyline) extraction: the rows not dominated on a
  * (minimize cost, maximize gain) pair — `q` dominates `p` when
  * `q.cost <= p.cost && q.gain >= p.gain` with at least one strict.
  * The price/quality trade-off query every curation pipeline runs when
  * it must pick, per budget level, the best document/part/source.
  *
  * The naive formulation is an all-pairs anti-join (EXISTS dominator) —
  * quadratic, dead at scale. For the 2-D case a total order saves it:
  * sort by cost, then a row survives iff its gain exceeds the running
  * max gain of all STRICTLY cheaper rows (and it has the max gain among
  * its exact-cost peers). That running max is a prefix aggregate — but a
  * single global-ORDER-BY window is a one-partition WindowExec, the
  * anti-pattern this suite bans (LayoutSpec "no corpus-sized
  * WindowExec"). So it is computed the distributed way:
  *
  *  1. bucket rows by `cost / bucketWidth` (map-side, no shuffle);
  *  2. per-bucket `max(gain)` — a tiny aggregate, one row per bucket;
  *  3. exclusive prefix-max across the bucket table (bounded
  *     cardinality: cost-range / width — the ONLY single-partition
  *     window, over ~thousands of rows no matter the input size);
  *  4. broadcast the prefix back and finish with per-bucket RANGE
  *     windows (partitioned by bucket → parallel), where "strictly
  *     cheaper" = `RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING`
  *     on the integer cost.
  *
  * Work: one shuffle by bucket + per-bucket sort — O(n log(n/B)) and
  * embarrassingly parallel. Pick `bucketWidth` so the cost range yields
  * ≥ cluster-parallelism buckets; per-bucket skew is bounded by the
  * cost distribution, and AQE's skew split applies to the exchange.
  */
object Skyline {

  /** Frontier of `df` minimizing integer `costCol`, maximizing integer
    * `gainCol`. Keeps all input columns; ties (equal cost AND equal
    * gain) all survive — neither dominates the other strictly.
    */
  def frontier(df: DataFrame, costCol: Column, gainCol: Column,
               bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val rows = df
      .withColumn("__c", costCol.cast("long"))
      .withColumn("__g", gainCol.cast("long"))
      .withColumn("__b", floor(col("__c") / lit(bucketWidth)))
    // (2) + (3): exclusive prefix-max over the bucket digest.
    val perBucket = rows.groupBy(col("__b")).agg(max(col("__g")).as("__bmax"))
    val pref = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixed = perBucket
      .withColumn("__pmax", max(col("__bmax")).over(pref))
      .select(col("__b"), col("__pmax"))
    // (4): per-bucket strictly-cheaper running max (RANGE excludes
    // exact-cost peers) + exact-cost peer max for the strict-in-one rule.
    val cheaperInBucket = Window.partitionBy(col("__b")).orderBy(col("__c"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val atCost = Window.partitionBy(col("__b"), col("__c"))
    val scored = rows
      .join(broadcast(prefixed), Seq("__b"), "left")
      .withColumn("__cheaper",
        greatest(
          coalesce(max(col("__g")).over(cheaperInBucket), lit(Long.MinValue)),
          coalesce(col("__pmax"), lit(Long.MinValue))))
      .withColumn("__atc", max(col("__g")).over(atCost))
    scored
      .filter(col("__g") > col("__cheaper") && col("__g") === col("__atc"))
      .drop("__b", "__c", "__g", "__pmax", "__cheaper", "__atc")
  }

  /** Merge a batch of candidate points into an existing frontier —
    * the streaming-state kernel (SkylineStream): associative and
    * order-insensitive, so stream == batch for any micro-batch split.
    * Pure Scala on small in-memory frontiers (state, not data plane).
    */
  def mergeFrontier(frontier: Seq[(Long, Long)],
                    batch: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val all = (frontier ++ batch).distinct.sortBy { case (c, g) => (c, -g) }
    val out = Seq.newBuilder[(Long, Long)]
    var best = Long.MinValue
    var lastCost = Long.MinValue
    var costBest = Long.MinValue
    for ((c, g) <- all) {
      if (c != lastCost) { lastCost = c; costBest = g } // first = max gain at c
      if (g > best && g == costBest) out += ((c, g))
      if (g > best) best = g
    }
    out.result()
  }
}
