package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Deterministic sampling operators for corpus curation (reference has no
  * sampling surface; this is north-star E4 extension work — reproducible
  * subsets are how a 100 TB corpus becomes a training mix).
  *
  * Everything here is a pure function of (row key, constants): no RNG
  * state, no partition dependence — the same row keeps or drops on any
  * cluster layout, any rerun, either engine. All arithmetic is integer
  * (md5-derived hashes + integer division), so the DuckDB oracles replay
  * it bit-for-bit; see CorpusQueries q74/q77.
  *
  * Two shapes:
  *  - [[priorityPacked]]: weight-proportional top-k per group WITHOUT a
  *    window — priorities pack into one BIGINT and a bounded bottom-k
  *    aggregate (the KMV TreeSet, [[Kmv.sketch]]) picks winners map-side.
  *    The q63 lesson applies: `row_number() OVER (PARTITION BY
  *    low-cardinality)` funnels the corpus through one task per group;
  *    a mergeable k-bounded aggregate never does.
  *  - [[balanceAccept]]: per-stratum acceptance threshold DERIVED FROM
  *    DATA (downsample every stratum to the smallest stratum's size in
  *    expectation) — a two-pass shape: tiny count agg, then a map-only
  *    filtered scan. Unlike Curation.mixtureKeep (fixed configured
  *    rates), the rate here comes from the corpus itself.
  */
object Sampling {

  /** Exact integer division of two BIGINT columns (`a div b`). `a / b`
    * in the Column API is DOUBLE division — above 2^53 the mantissa
    * drops low bits and the quotient is silently wrong, which breaks
    * the integer-exactness contract. Spark's `div` and DuckDB's `//`
    * BOTH truncate toward zero (verified on negative operands:
    * -7 // 2 = -3 in DuckDB), so the twin is exact for ANY sign —
    * q142's negative Theil-Sen slopes rely on this. */
  def ldiv(a: Column, b: Column): Column =
    ColumnBridge.column(
      IntegralDivide(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** md5-derived uniform hash with `bits`/4 hex digits (bits must be a
    * multiple of 4, ≤ 60): value in [0, 2^bits). The `prefix` decorrelates
    * independent sampling decisions over the same key (same discipline as
    * q44's "split|" / q49's "mix|"). DuckDB twin:
    * `CAST(('0x' || substr(md5(prefix || CAST(key AS VARCHAR)), 1, bits/4)) AS BIGINT)`. */
  def hashBits(prefix: String, key: Column, bits: Int): Column = {
    require(bits % 4 == 0 && bits > 0 && bits <= 60, s"bad hash width $bits")
    conv(substring(md5(concat(lit(prefix), key.cast("string"))), 1, bits / 4), 16, 10)
      .cast("long")
  }

  /** Number of uniform-hash bits behind [[priorityPacked]] (2^24). */
  val PriorityHashBits = 24

  /** Low-bits width reserved for the tiebreak id in the packed priority. */
  val PackIdBits = 24

  /** Weight-proportional sampling priority, packed with the row id into
    * ONE BIGINT so a bounded bottom-k aggregate can pick the top-k rows
    * per group with no window and no shuffle of the corpus:
    *
    *   priority = (weight * 2^24) div (h24 + 1)        (integer, exact)
    *   packed   = priority * 2^24 + (2^24 - 1 - id)
    *
    * Taking the k LARGEST `packed` values yields the k largest
    * priorities with id-ASCENDING tiebreak (the id is stored
    * complemented). Feed `-packed` to [[Kmv.sketch]] (which keeps the k
    * smallest) and negate on the way out.
    *
    * This is priority/sequential-Poisson sampling (Ohlsson '98; Duffield
    * et al. '07): P(row in sample) is approximately proportional to its
    * weight, and the choice is a pure row function. Bounds enforced
    * in-plan via raise_error: weight ∈ [1, 2^15) and id ∈ [0, 2^24) keep
    * `packed` < 2^63 ((2^15-1)·2^24 max priority, times 2^24, plus the
    * id, is 2^63 - 2^48 + 2^24 - 1). Round 7 widened the id budget from
    * 2^21 after the sf1 scaling corpus (doc_id offsets to 9M) tripped
    * the loud guard exactly as designed. Corpora wider still raise
    * PackIdBits into a two-long struct aggregate — the packing is an
    * optimization, not the algorithm.
    */
  def priorityPacked(prefix: String, id: Column, weight: Column): Column = {
    val pHash = hashBits(prefix, id, PriorityHashBits)
    val idMax = (1L << PackIdBits) - 1L
    val wMax = 1L << 15
    val guarded = when(
      id >= 0 && id <= lit(idMax) && weight >= 1L && weight < lit(wMax),
      id)
      .otherwise(raise_error(concat(
        lit(s"priorityPacked bounds: id in [0,$idMax], weight in [1,$wMax): got id="),
        id.cast("string"), lit(" weight="), weight.cast("string"))).cast("long"))
    val priority = ldiv(weight * lit(1L << PriorityHashBits), pHash + lit(1L))
    priority * lit(1L << PackIdBits) + (lit(idMax) - guarded)
  }

  /** Unpack a [[priorityPacked]] value: (priority, id). */
  def unpackPriority(packed: Column): (Column, Column) = {
    val idMax = (1L << PackIdBits) - 1L
    (shiftright(packed, PackIdBits),
      lit(idMax) - packed.bitwiseAND(lit(idMax)))
  }

  /** Acceptance test that downsamples a stratum of size `nStratum` to
    * `targetCount` rows in expectation: accept iff
    * `h40 * nStratum < targetCount * 2^40`. The comparison runs in
    * DECIMAL(38,0) so it cannot overflow at any corpus size (a raw
    * BIGINT product would wrap past ~2^23 strata rows x 2^40 hash;
    * DuckDB twin uses HUGEINT). Map-only once the two counts are known:
    * the filter never shuffles. */
  def balanceAccept(h40: Column, nStratum: Column, targetCount: Column): Column = {
    val d = "decimal(38,0)"
    h40.cast(d) * nStratum.cast(d) < targetCount.cast(d) * lit(1L << 40).cast(d)
  }

  /** Temperature-balanced acceptance: accept a row of a stratum of size
    * `nStratum` with probability k·w / (nStratum·sumW), where w is the
    * stratum's tempered weight (e.g. floor(sqrt(n)) for τ = 2) and sumW
    * the sum of all strata weights — expected kept per stratum is
    * k·w/sumW, i.e. proportional to the TEMPERED share (the
    * multilingual-pretraining resampling discipline; τ = 2 upsamples
    * tails relative to raw frequency). Accept iff
    * `h40·nStratum·sumW < k·w·2^40`, in DECIMAL(38,0) (DuckDB HUGEINT)
    * so no product can wrap at any corpus size. Map-only once the
    * per-stratum counts are known. */
  def temperatureAccept(h40: Column, nStratum: Column, w: Column,
                        sumW: Column, k: Column): Column = {
    val d = "decimal(38,0)"
    h40.cast(d) * nStratum.cast(d) * sumW.cast(d) <
      k.cast(d) * w.cast(d) * lit(1L << 40).cast(d)
  }
}
