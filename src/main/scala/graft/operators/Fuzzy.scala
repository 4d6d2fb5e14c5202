package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching (entity resolution): find near-identical
  * strings WITHOUT the all-pairs cross join. The classic record-linkage
  * shape: a cheap deterministic blocking key partitions the corpus,
  * candidate pairs are generated only WITHIN a block (equi-join), and
  * the expensive edit-distance runs only on candidates.
  */
object Fuzzy {

  /** Per-block fuzzy-duplicate statistics under banded Levenshtein.
    *
    * Scale contract (the part that matters at 100 TB):
    *  - pair generation is an EQUI-join on the blocking key — never a
    *    cross join; total pair work is Σ |block|²/2;
    *  - blocks larger than `maxBlock` are EXCLUDED from pair generation
    *    and flagged `capped` in the output (same skew-guard discipline
    *    as VectorQueries.capCells): worst-case work is bounded by
    *    n_blocks * maxBlock² no matter how skewed the key is, and the
    *    exclusion is observable, never silent;
    *  - candidates are pre-pruned by the length band
    *    |len(a)-len(b)| <= maxDist (a lower bound on edit distance, so
    *    no true match is lost) before any Levenshtein runs;
    *  - the Levenshtein itself is the THRESHOLDED form
    *    (levenshtein(a, b, maxDist), Ukkonen banding: O(maxDist * len)
    *    per pair instead of O(len²), returns -1 above the threshold).
    *
    * Output, one row per block, all exact integers (oracle-replayable):
    * (blk, n_rows, capped, n_cand_pairs, n_matches, min_dist) with
    * min_dist = -1 when the block has no match. Choosing a blocking key
    * is the caller's semantic decision (prefix, phonetic code, sorted
    * token fingerprint, ...); pass it as `blockExpr`.
    */
  def blockedEditStats(df: DataFrame, id: String, name: String,
                       blockExpr: Column, maxDist: Int,
                       maxBlock: Long): DataFrame = {
    require(maxDist >= 0 && maxBlock > 0, "maxDist >= 0, maxBlock > 0")
    val t = df.filter(col(name).isNotNull)
      .select(col(id).as("id"), col(name).as("nm"), blockExpr.as("blk"))
    val sizes = t.groupBy(col("blk")).agg(count(lit(1)).as("n_rows"))
    // carry the block size onto each row; only uncapped blocks pair up
    val tb = t.join(sizes, Seq("blk")).filter(col("n_rows") <= maxBlock)
      .select(col("blk"), col("id"), col("nm"))
    val pairs = tb.as("a")
      .join(tb.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id") &&
          abs(length(col("a.nm")) - length(col("b.nm"))) <= maxDist)
      .select(col("a.blk").as("blk"),
        levenshtein(col("a.nm"), col("b.nm"), maxDist).as("d"))
    val matched = col("d") >= 0 && col("d") <= maxDist
    val pairStats = pairs.groupBy(col("blk")).agg(
      count(lit(1)).as("n_cand_pairs"),
      sum(when(matched, 1L).otherwise(0L)).as("n_matches"),
      min(when(matched, col("d"))).as("md"))
    sizes.join(pairStats, Seq("blk"), "left").select(
      col("blk"),
      col("n_rows"),
      (col("n_rows") > maxBlock).as("capped"),
      coalesce(col("n_cand_pairs"), lit(0L)).as("n_cand_pairs"),
      coalesce(col("n_matches"), lit(0L)).as("n_matches"),
      coalesce(col("md"), lit(-1)).cast("int").as("min_dist"))
  }
}
