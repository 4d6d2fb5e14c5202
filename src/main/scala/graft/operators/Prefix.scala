package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT prefix sums over an integer total order — the
  * running-total sibling of [[Skyline]]'s prefix-max and [[Ranking]]'s
  * two-pass rank. A cumulative sum expressed as a single
  * global-ORDER-BY window is a one-partition WindowExec over the whole
  * frame — the anti-pattern this suite bans. The same value is computed
  * here the distributed way:
  *
  *  1. bucket rows by `key div bucketWidth` (map-side, no extra
  *     shuffle beyond the bucket hash exchange);
  *  2. per-bucket totals of each weight — one tiny row per bucket;
  *  3. EXCLUSIVE prefix sum across the bucket digest (the only
  *     unpartitioned window, over ~keyRange/bucketWidth rows no matter
  *     the input size);
  *  4. broadcast the digest back and finish with per-bucket RANGE
  *     windows (partitioned by bucket → parallel):
  *     `cum = digestPrefix + inBucketInclusive`.
  *
  * The intended input is a VALUE HISTOGRAM (one row per distinct key,
  * e.g. cents → counts): rank statistics (Mann-Whitney, KS, Lorenz)
  * only ever need prefix sums over the compressed value domain, never
  * over raw rows. Duplicate keys are still well-defined — the RANGE
  * frame gives every row of a tied key the same inclusive total.
  *
  * Keys must be non-negative (`key div width` truncation == floor only
  * then); weights must be LONG columns. Work: one hash exchange on the
  * bucket + per-bucket sort — O(n log(n/B)), embarrassingly parallel;
  * per-bucket skew is bounded by the key distribution and AQE's skew
  * split applies to the exchange.
  */
object Prefix {

  /** Adds an inclusive prefix sum `cum_<w>` (total of `w` over rows
    * with key <= this row's key) for each weight column `w`, ordered by
    * non-negative integer `keyCol` ascending. Exclusive variants are
    * one subtraction away (`cum_w - w`) when keys are unique. */
  def scanSums(df: DataFrame, keyCol: String, weightCols: Seq[String],
               bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(weightCols.nonEmpty, "scanSums needs at least one weight column")
    val reserved = Set("__b") ++ weightCols.flatMap(w => Seq(s"__t_$w", s"__p_$w", s"cum_$w"))
    require(!df.columns.exists(reserved),
      s"scanSums input may not use columns $reserved")

    val bucketed = df.withColumn("__b", expr(s"`$keyCol` div ${bucketWidth}L"))

    // (2) + (3): per-bucket totals, then the exclusive digest prefix —
    // the sole unpartitioned window, over the digest only.
    val digest = bucketed.groupBy(col("__b"))
      .agg(weightCols.map(w => sum(col(w)).as(s"__t_$w")).head,
        weightCols.map(w => sum(col(w)).as(s"__t_$w")).tail: _*)
    val pref = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixed = digest.select(
      col("__b") +: weightCols.map(w =>
        coalesce(sum(col(s"__t_$w")).over(pref), lit(0L)).as(s"__p_$w")): _*)

    // (4): per-bucket inclusive RANGE window + digest offset.
    val inBucket = Window.partitionBy(col("__b")).orderBy(col(keyCol))
      .rangeBetween(Window.unboundedPreceding, 0)
    val joined = bucketed.join(broadcast(prefixed), Seq("__b"))
    val withCums = weightCols.foldLeft(joined) { (acc, w) =>
      acc.withColumn(s"cum_$w", col(s"__p_$w") + sum(col(w)).over(inBucket))
    }
    withCums.drop("__b" +: weightCols.map(w => s"__p_$w"): _*)
  }
}
