package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact order statistics WITHOUT a global sort.
  *
  * q36 answers percentiles with Spark's `percentile` (whole-group
  * buffering) and q66 with a bounded sketch (approximate); this is the
  * third point in the design space: EXACT selection at unbounded scale.
  * A 100 TB global median cannot afford `ORDER BY` (a full shuffle sort
  * of the table) or a per-group buffer (executor OOM); selection pays a
  * constant number of full-column aggregate passes instead, with O(1)
  * driver state per requested rank.
  *
  * Pass structure (all ranks answered TOGETHER — one scan serves every
  * probe, the multi-probe discipline):
  *  1. one (min, max, count) aggregate;
  *  2. one bounded histogram aggregate (≤ [[HistBuckets]] buckets over
  *     the value domain, collected to the driver — 64k longs, the same
  *     bounded-collect envelope as the √n centroid law) that narrows
  *     every rank's bracket to a single bucket;
  *  3. ≤ log2(bucket width) rounds of bisection, each round ONE
  *     conditional-count aggregate answering every still-open rank's
  *     midpoint probe at once.
  *
  * For a 2^63 domain that is ≤ 3 + 47 full scans regardless of row
  * count; for real money-in-cents domains the histogram leaves ~150-wide
  * buckets and the whole answer costs ~10 scans. The column is cached by
  * the CALLER (one narrow projection), so each pass is an in-memory
  * scan. Deterministic: depends only on the multiset of values.
  */
object Selection {

  /** Histogram fan-out of the narrowing pass; 2^16 keeps the driver
    * collect bounded while dividing a cents-scale domain into ~100-wide
    * brackets. */
  val HistBuckets: Int = 1 << 16

  /** The k-th smallest value (1-based, duplicates counted) of a LONG
    * column for EVERY rank in `ks`, sharing scans across ranks. */
  def kthSmallestMulti(df: DataFrame, value: Column,
                       ks: Seq[Long]): Map[Long, Long] = {
    val v = value.cast("long")
    val bounds = df.agg(min(v), max(v), count(lit(1))).head()
    require(!bounds.isNullAt(0), "kthSmallestMulti on an empty column")
    val (gLo, gHi, n) = (bounds.getLong(0), bounds.getLong(1), bounds.getLong(2))
    ks.foreach(k => require(k >= 1 && k <= n, s"k=$k out of range 1..$n"))
    val span = BigInt(gHi) - BigInt(gLo)
    require(span <= BigInt(Long.MaxValue),
      s"value domain [$gLo, $gHi] spans more than 2^63")

    // --- pass 2: histogram narrowing -----------------------------------
    // bucket(x) = (x - gLo) >> s ∈ [0, HistBuckets); the width is the
    // smallest power of two that fits the domain into the fan-out, so
    // bucketing is an exact integer shift (a long `/` in Column space
    // would detour through DOUBLE and lose exactness past 2^53).
    // Cumulative counts locate each rank's bucket, shrinking its
    // bracket from the whole domain to one bucket in a single scan.
    val s = math.max(0, 64 - java.lang.Long.numberOfLeadingZeros(gHi - gLo) - 16)
    val width = 1L << s
    val hist = df.groupBy(shiftright(v - gLo, s).as("b"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // brackets(k) = (lo, hi) with the invariant: answer(k) ∈ [lo, hi]
    // and |{x ≤ lo - 1}| < k (so bisection below stays global-rank)
    var brackets: Map[Long, (Long, Long)] = {
      var cum = 0L
      val bucketCum = hist.map { case (b, c) => cum += c; (b, cum) }
      ks.map { k =>
        val (b, _) = bucketCum.find(_._2 >= k).get
        val lo = gLo + b * width
        val hi = math.min(gHi, lo + width - 1)
        k -> (math.max(gLo, lo), hi)
      }.toMap
    }

    // --- pass 3: batched bisection -------------------------------------
    // One aggregate per ROUND (not per rank): every open bracket's
    // midpoint becomes a conditional-count column in the same scan.
    while (brackets.exists { case (_, (lo, hi)) => lo < hi }) {
      val open = brackets.filter { case (_, (lo, hi)) => lo < hi }
      val mids = open.values.map { case (lo, hi) => lo + (hi - lo) / 2 }
        .toSeq.distinct.sorted
      val counts = df.agg(
          count(lit(1)).as("_n"), // anchor; probes below are positional
          mids.map(m => sum(when(v <= m, 1L).otherwise(0L))): _*)
        .head()
      val le = mids.zipWithIndex.map { case (m, i) =>
        m -> (if (counts.isNullAt(i + 1)) 0L else counts.getLong(i + 1))
      }.toMap
      brackets = brackets.map {
        case (k, (lo, hi)) if lo < hi =>
          val mid = lo + (hi - lo) / 2
          if (le(mid) >= k) k -> (lo, mid) else k -> (mid + 1, hi)
        case done => done
      }
    }
    brackets.map { case (k, (lo, _)) => k -> lo }
  }

  /** Single-rank convenience over [[kthSmallestMulti]]. */
  def kthSmallest(df: DataFrame, value: Column, k: Long): Long =
    kthSmallestMulti(df, value, Seq(k))(k)

  /** ceil(p_num * n / p_den) clamped to >= 1 — the 1-based rank of the
    * lower discrete p-quantile, mirrored literally in oracle SQL. */
  def discreteRank(n: Long, pNum: Long, pDen: Long): Long =
    math.max(1L, (pNum * n + pDen - 1) / pDen)
}
