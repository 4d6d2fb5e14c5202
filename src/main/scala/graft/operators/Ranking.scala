package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT ranking over a total order — the scale-safe
  * replacement for `Window.partitionBy(lowCardinalityKey)` rank
  * functions.
  *
  * A window partitioned by a low-cardinality key (e.g. 3 return flags)
  * sorts each key's ENTIRE slice of the corpus on one reducer — at
  * 100 TB that is ~1/3 of the table through a single task. This
  * operator computes the same 1-based rank with a classic two-pass
  * shape instead:
  *
  *   1. ONE range exchange on (group, orderCols) — Spark's
  *      RangePartitioner gives every partition a contiguous key range,
  *      so all rows of partition p sort before all rows of p+1.
  *   2. A tiny side pass counts rows per (partition, group) —
  *      `numPartitions × |groups|` rows — and turns the counts into
  *      per-(partition, group) cumulative offsets with windows OVER THE
  *      COUNTS ONLY (kilobytes, never the corpus).
  *   3. The corpus pass sorts within each range partition and takes the
  *      row's 0-based position from `monotonically_increasing_id`'s
  *      per-partition counter (its low 33 bits — valid while a range
  *      partition holds < 2^33 rows, which sizing `numPartitions`
  *      guarantees long before memory does). rank = group offset +
  *      (position − offset of earlier groups in this partition) + 1.
  *
  * Net plan: one full shuffle (the range exchange, materialized once —
  * both passes read the same checkpointed partitions), one broadcast
  * of the tiny offset table, zero WindowExec over the corpus. Window
  * partition sizes never exceed the range-partition size regardless of
  * group-key cardinality.
  *
  * Correctness notes:
  *  - `orderCols` MUST be a total order within each group (include
  *    unique tiebreakers): with no ties, rank = row_number = dense_rank
  *    and the derived percent_rank/cume_dist/ntile below are exact.
  *  - Ordering is ascending NULLS FIRST on every order column (Spark's
  *    default), matching `ORDER BY c ASC NULLS FIRST` windows.
  *  - The range-partitioned frame is materialized EAGERLY
  *    (localCheckpoint) before either pass reads it: RangePartitioner
  *    samples with an rdd-id-dependent seed, so two physically
  *    distinct exchanges over the same data may pick different
  *    boundaries — the checkpoint makes both passes read one set of
  *    physical partitions by construction.
  *  - `numPartitions` is always explicit (REPARTITION_BY_NUM), which
  *    AQE never coalesces — both passes see identical partitioning.
  */
object Ranking {

  /** Adds `rankName` (1-based rank of the row within its `groupCol`
    * group under `orderCols` ascending-nulls-first) and `sizeName`
    * (total rows in the group) without any corpus-sized window
    * partition. Pass the input pre-projected to the columns you need:
    * the range-partitioned frame is checkpointed, so payload columns
    * ride along in block-manager storage — at real scale rank the key
    * columns only and join payloads back by key.
    */
  def rankInGroup(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[String],
      numPartitions: Int = 0,
      rankName: String = "rk",
      sizeName: String = "grp_n"): DataFrame = {
    val reserved = Set("__pid", "__idx", "__cnt", "__grp_off", "__pid_off",
      rankName, sizeName)
    require(!df.columns.exists(reserved),
      s"rankInGroup input may not use columns $reserved")
    require(orderCols.nonEmpty, "rankInGroup needs at least one order column")
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val keyCols = (groupCol +: orderCols).map(col)

    // The ONE corpus shuffle — materialized EAGERLY so the counts pass
    // and the corpus pass read the SAME physical partitions. Without
    // this, column pruning gives the counts branch its own (narrower)
    // range exchange, and RangePartitioner's reservoir sample is seeded
    // by the rdd id, so two physically distinct exchanges can pick
    // DIFFERENT boundaries — rows near a boundary would then be counted
    // in partition p but ranked in p±1: silently wrong ranks. The
    // checkpoint pins one set of boundaries by construction (no
    // reliance on ReusedExchange firing). Price: the frame is held in
    // the block manager — pre-project to the key columns for 100 TB
    // inputs (q63 does) and join payloads back by key afterwards.
    val ranged = df.repartitionByRange(parts, keyCols: _*).localCheckpoint(true)

    // Tiny pass: rows per (range partition, group). spark_partition_id
    // must live in a Project (non-deterministic exprs are not allowed
    // as grouping expressions directly).
    val counts = ranged
      .select(spark_partition_id().as("__pid"), col(groupCol))
      .groupBy(col("__pid"), col(groupCol))
      .agg(count(lit(1)).as("__cnt"))

    // Offsets over the counts only (parts × |groups| rows):
    //  __grp_off — rows of this group in earlier partitions;
    //  __pid_off — rows of EARLIER groups in this partition (groups
    //              appear in key order inside a range partition);
    //  sizeName  — total rows in the group.
    val wGrpPrev = Window.partitionBy(col(groupCol)).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wGrpAll = Window.partitionBy(col(groupCol))
    val wPidPrev = Window.partitionBy(col("__pid"))
      .orderBy(col(groupCol).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__grp_off", coalesce(sum(col("__cnt")).over(wGrpPrev), lit(0L)))
      .withColumn("__pid_off", coalesce(sum(col("__cnt")).over(wPidPrev), lit(0L)))
      .withColumn(sizeName, sum(col("__cnt")).over(wGrpAll))
      .select(col("__pid"), col(groupCol).as("__grp"), col("__grp_off"),
        col("__pid_off"), col(sizeName))

    // Corpus pass: position within the range partition in sorted order.
    // monotonically_increasing_id = (partitionId << 33) | rowIndex; the
    // non-deterministic projection also pins the sort (EliminateSorts
    // cannot remove a sort below a non-deterministic Project).
    val local = ranged
      .sortWithinPartitions(keyCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__idx", monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)))

    // Null-safe group match so a NULL group ranks like any other group.
    val off = broadcast(offsets)
    local
      .join(off, local("__pid") === off("__pid") && col(groupCol) <=> col("__grp"))
      .withColumn(rankName,
        col("__grp_off") + (col("__idx") - col("__pid_off")) + lit(1L))
      .drop(off("__pid"))
      .drop("__grp", "__pid", "__idx", "__grp_off", "__pid_off")
  }

  /** SQL NTILE(buckets) from (rank, group size) over a TOTAL order: the
    * first `n % buckets` tiles take ⌈n/buckets⌉ rows, the rest
    * ⌊n/buckets⌋. Exact integer arithmetic (floor over long/long
    * division — exact below 2^53 rows per group). */
  def ntileFromRank(rk: Column, n: Column, buckets: Int): Column = {
    require(buckets >= 1, s"ntile needs >= 1 bucket, got $buckets")
    val b = lit(buckets.toLong)
    val q = floor(n / b)            // ⌊n/b⌋ rows in the small tiles
    val rem = pmod(n, b)            // n % b big tiles of q+1 rows
    val cut = rem * (q + lit(1L))   // rows covered by the big tiles
    when(rk <= cut, floor((rk - lit(1L)) / (q + lit(1L))) + lit(1L))
      .otherwise(rem + floor((rk - cut - lit(1L)) / q) + lit(1L))
  }

  /** SQL percent_rank from (rank, group size), ties-free total order:
    * (rank−1)/(n−1), 0.0 for a single-row group. IEEE-identical to any
    * engine computing the same division. */
  def percentRankFromRank(rk: Column, n: Column): Column =
    when(n === lit(1L), lit(0.0))
      .otherwise((rk - lit(1L)).cast("double") / (n - lit(1L)).cast("double"))

  /** SQL cume_dist from (rank, group size), ties-free total order:
    * rank/n. */
  def cumeDistFromRank(rk: Column, n: Column): Column =
    rk.cast("double") / n.cast("double")
}
