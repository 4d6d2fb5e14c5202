package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.plans.{AsofJoin, AsofJoinStrategy}
import org.apache.spark.sql.graftbridge.ColumnBridge

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
      // preserve the input's column order — callers publish fixed
      // schema contracts (silver tiers) that a keys-first reorder
      // would silently break for positional consumers
      .select(df.columns.map(c =>
        if (keys.contains(c)) col(c) else col(s"__row.$c").as(c)): _*)
  }

  /** Dimension-enrich left join with an explicit broadcast of the small
    * side (reference main.py:56, J1). */
  def enrichLeft(fact: DataFrame, dim: DataFrame, key: String): DataFrame =
    fact.join(broadcast(dim), Seq(key), "left")

  /** AS-OF join: each left row picks the LATEST right row (per key) with
    * `rightTs <= leftTs` — the time-series enrichment join Spark lacks as
    * a built-in operator.
    *
    * Composed from built-ins rather than a custom physical operator
    * (SURVEY preference order (a)): union both sides, then one running
    * `last(_, ignoreNulls)` window per key ordered by (ts, side) with
    * right rows sorting before left rows on equal timestamps (ASOF `>=`
    * inclusion). Cost at scale: ONE shuffle by key + per-partition sort —
    * the same shape a dedicated as-of operator would need; no
    * range-condition BNLJ anywhere. Right-side timestamp ties per key are
    * broken arbitrarily — pre-dedupe the right side if ties are possible.
    * Left rows with no prior right row get null values (left-join
    * semantics).
    */
  /** Native as-of join — the custom-plan path (plans/AsofJoin:
    * logical node + Strategy + sorted-merge exec). Same semantics and
    * output shape as [[asofJoinLatest]] (left outer, latest right row
    * with time <= left time, right values prefixed), proven
    * row-identical in AsofNativeSpec; q85's oracle checks it
    * end-to-end. Registers the planner Strategy on the session
    * idempotently, so it works in sessions without the
    * SparkSessionExtensions install.
    *
    * 100 TB posture: one hash exchange + sort per side (what a
    * SortMergeJoin costs), then an O(1)-state per-partition merge —
    * no union schema, no running-last window buffer; bucketed inputs
    * that already satisfy the distribution plan with NO exchange.
    */
  def asofJoinNative(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String,
                     valuePrefix: String = "asof_"): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    val rightVals = right.columns.filterNot(c => keys.contains(c) || c == rightTs)
    val renamedKeys = keys.map(k => s"__rk_$k")
    val outVals = rightVals.map(c => s"$valuePrefix$c")
    val clash = left.columns.toSet
      .intersect((renamedKeys :+ "__rts").toSet ++ outVals)
    require(clash.isEmpty, s"left side may not use columns $clash")
    // Same null contract as asofJoinLatest: a null right key/time
    // matches nothing — drop up front, or ascending-sort placement
    // would leak null-time rows ahead of real ones.
    val rPrep = right.na.drop(keys :+ rightTs).select(
      keys.map(k => col(k).as(s"__rk_$k")) ++
        Seq(col(rightTs).as("__rts")) ++
        rightVals.map(c => col(c).as(s"$valuePrefix$c")): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rPrep.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val node = AsofJoin(lPlan, rPlan,
      keys.map(attr(lPlan, _)), renamedKeys.map(attr(rPlan, _)),
      attr(lPlan, leftTs), attr(rPlan, "__rts"))
    ColumnBridge.ofRows(spark, node)
      .drop((renamedKeys :+ "__rts"): _*)
  }

  def asofJoinLatest(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String,
                     valuePrefix: String = "asof_"): DataFrame = {
    val reserved = Set("__ts", "__side", "__rv", "__last")
    require(!left.columns.exists(reserved), s"left side may not use columns $reserved")
    // Right VALUE columns are safe (they travel inside the __rv struct),
    // but right key/timestamp columns are projected as-is and would
    // silently collide in the union.
    require(!(keys :+ rightTs).exists(reserved),
      s"right-side key/timestamp columns may not use $reserved")
    val rightVals = right.columns.filterNot(c => keys.contains(c) || c == rightTs)
    // SQL ASOF semantics: a NULL right timestamp satisfies no `<=`
    // comparison and a NULL key matches no equi-join — drop both up
    // front, or asc_nulls_first would sort a null-ts right row ahead of
    // everything and leak its values into unmatched left rows.
    val rPrep = right
      .na.drop(keys :+ rightTs)
      .select(
        keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
          struct(rightVals.map(col): _*).as("__rv")): _*)
    val lPrep = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val unioned = lPrep.unionByName(rPrep, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc_nulls_first, col("__side").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__last", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        rightVals.map(c => col(s"__last.$c").as(s"$valuePrefix$c")): _*)
  }

  /** Two-phase SALTED count/exact-sum for heavily skewed grouping keys.
    *
    * A plain `groupBy(hotKey)` sends every row of a hot key to one
    * reducer; at 100 TB a single key can hold billions of rows. Phase 1
    * groups by (keys, salt) — `buckets` reducers share each hot key —
    * and phase 2 merges the per-salt partials. Both phases are exact:
    * the value is quantized to integer cents, so partial sums combine
    * associatively with no FP drift. The salt is DETERMINISTIC — a
    * content hash of the whole row — because a nondeterministic salt
    * (monotonically_increasing_id, rand) used as a grouping key can
    * double-count or lose rows if an upstream stage is recomputed after
    * a failure with different row order. The trade: full-duplicate rows
    * share a salt, so a hot key whose rows are ALL identical is not
    * spread — in practice rows differ in some column (id, timestamp),
    * which is what the hash spreads on. Results never depend on the
    * salt assignment either way (exact integer partials).
    */
  /** Deterministic whole-row salt in [0, buckets) — the ONE salting
    * discipline shared by [[saltedJoin]] and [[saltedSumCount]]:
    * xxhash64 of every column, so the salt is a pure function of the
    * row (no RNG, identical under any partitioning). Fails fast on a
    * pre-existing `__salt` column, which `withColumn` would otherwise
    * silently clobber and the operators would then drop. */
  private def saltCol(df: DataFrame, buckets: Int) = {
    require(!df.columns.contains("__salt"),
      "input already has a __salt column — rename it before salting")
    pmod(xxhash64(df.columns.map(col): _*), lit(buckets.toLong))
  }

  def saltedSumCount(df: DataFrame, keys: Seq[String], value: String,
                     buckets: Int = 16, scale: Int = 2): DataFrame = {
    val factor = math.pow(10, scale)
    val partial = df
      .withColumn("__salt", saltCol(df, buckets))
      .groupBy(keys.map(col) :+ col("__salt"): _*)
      // phase-1 partials use the split-long exact sum (hash-agg fast
      // path; see Exact.exactIntSum) — phase 2 sums one decimal per
      // (key, salt), a tiny input where decimal cost is irrelevant
      .agg(count(lit(1)).as("__n"),
        Exact.exactIntSum(Exact.quantize(col(value), scale)).as("__s"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n"),
        (sum(col("__s")).cast("double") / lit(factor)).as("sum_value"))
  }

  /** Skew-safe equi-join: the fact side takes the deterministic
    * [[saltCol]] salt and the (small) right side is replicated once per
    * salt value, so a hot join key spreads across `buckets` reducers
    * instead of flooding one. Results are identical to the plain join
    * (spec-asserted) for the FACT-PRESERVING join types only — inner,
    * left/left_outer, left_semi, left_anti. Right/full outer joins are
    * rejected: each unmatched right replica would surface as its own
    * spurious output row (replication is invisible to fact-side
    * semantics but not to right-side preservation).
    *
    * Use when the right side is too big to broadcast outright but its
    * `buckets`-fold replication still fits the shuffle comfortably
    * (dim tables, per-key aggregate summaries); for genuinely big-big
    * skewed joins prefer AQE's runtime skew-join splitting, which this
    * complements, not replaces.
    *
    * Limitation (shared with [[saltedSumCount]]): the salt is a pure
    * function of the whole row, so byte-identical DUPLICATE fact rows
    * sharing the hot key all land in one bucket — the skew mitigation
    * degrades exactly when the hot key's rows are full duplicates
    * (common in raw event logs). For duplicate-heavy facts, dedup or
    * attach a distinguishing column first, or rely on AQE skew
    * splitting, which splits by partition size, not row content. */
  def saltedJoin(fact: DataFrame, right: DataFrame, keys: Seq[String],
                 buckets: Int = 16, joinType: String = "inner"): DataFrame = {
    val factPreserving =
      Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
        "left_anti", "leftanti")
    require(factPreserving(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports fact-preserving join types only, got '$joinType' — " +
        "a right/full outer join would emit one spurious row per unmatched replica")
    require(!right.columns.contains("__salt"),
      "right side already has a __salt column — rename it before salting")
    val salted = fact.withColumn("__salt", saltCol(fact, buckets))
    val replicated = right.withColumn("__salt",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
