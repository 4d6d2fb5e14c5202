package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding token accounting over a FIXTURE merge table —
  * the production-shaped replacement for whitespace token counts in
  * packing/budgeting queries (VERDICT r6 wishlist #1): an LLM data
  * pipeline budgets sequences in TOKENIZER tokens, and BPE (Sennrich
  * et al. 2016; the GPT-2 merge-rank encoder, Radford et al. 2019) is
  * the public standard.
  *
  * Encoder spec (implemented IDENTICALLY here and in the DuckDB oracle
  * CTE from [[oracleCte]], so cross-engine parity is provable):
  * a word starts as its character symbols; each step finds the
  * adjacent pair with the LOWEST merge rank and merges its LEFTMOST
  * occurrence; encoding stops at the fixpoint (no adjacent pair is in
  * the merge table). One occurrence per step — the textbook greedy
  * encoder; it can deviate from merge-all-occurrences-per-rank
  * variants only when a merge creates a new lower-rank pair, and the
  * spec here is the normative one both engines implement.
  *
  * Scale shape: the encoder is WORD-local (stream-safe, no corpus
  * state), and consumers run it over the DISTINCT vocabulary only —
  * token totals then come from a broadcast join of (word -> n_bpe)
  * onto per-(group, word) counts, so the per-row cost at 100 TB is a
  * hash probe, not an encode. The merge table is a fixture constant
  * compiled into both the expression and the oracle SQL from THIS one
  * list — they cannot drift.
  */
object Bpe {

  /** The fixture merge table, rank = position. Public-knowledge toy
    * vocabulary (English character bigrams + corpus-relevant chains up
    * to depth 4, e.g. s+p, sp+ar, spar+k) — stands in for a published
    * merges.txt, which this container cannot fetch. */
  val Merges: Vector[(String, String)] = Vector(
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("o", "w"),
    ("a", "n"), ("s", "t"), ("a", "r"), ("o", "r"), ("j", "o"),
    ("jo", "in"), ("r", "ow"), ("s", "c"), ("sc", "an"), ("h", "a"),
    ("s", "h"), ("ha", "sh"), ("s", "p"), ("sp", "ar"), ("spar", "k"),
    ("b", "a"), ("ba", "t"), ("bat", "c"), ("batc", "h"), ("k", "e"),
    ("ke", "y"), ("v", "a"), ("va", "l"), ("u", "e"), ("g", "r"),
    ("gr", "o"), ("gro", "u"), ("grou", "p"), ("d", "a"), ("da", "t"),
    ("dat", "a"), ("q", "u"), ("d", "u"), ("du", "p"), ("g", "g"))

  private val rank: Map[(String, String), Int] =
    Merges.zipWithIndex.toMap

  /** Number of BPE symbols the word encodes to. Pure, word-local. */
  def countSymbols(word: String): Int = segment(word).length

  /** The full segmentation (exposed for specs / debugging). */
  def segment(word: String): Vector[String] = {
    if (word == null || word.isEmpty) return Vector.empty
    var s: Vector[String] = word.map(_.toString).toVector
    var done = false
    while (!done && s.length > 1) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var i = 0
      while (i < s.length - 1) {
        val r = rank.getOrElse((s(i), s(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPos = i } // leftmost wins ties
        i += 1
      }
      if (bestPos < 0) done = true
      else s = (s.take(bestPos) :+ (s(bestPos) + s(bestPos + 1))) ++
        s.drop(bestPos + 2)
    }
    s
  }

  // Word-level memo — the same trick production tokenizers use: the
  // corpus vocabulary is tiny relative to occurrences (Heaps' law), so
  // encoding each distinct word once and hash-probing every other
  // occurrence removes ~all encode CPU from the hot path. Bounded so a
  // pathological unbounded vocabulary (random strings) degrades to
  // plain encoding instead of eating the executor heap; thread-safe
  // and value-deterministic (pure function), so concurrent tasks can
  // share it freely.
  private val MemoCap = 1 << 20
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private def countMemo(w: String): Long = {
    val cached = memo.get(w)
    if (cached ne null) cached.longValue()
    else {
      val v = countSymbols(w).toLong
      if (memo.size < MemoCap) memo.put(w, java.lang.Long.valueOf(v))
      v
    }
  }

  /** Static entry point for generated Java (whole-stage codegen calls
    * this via the object's static forwarder). */
  def count(s: UTF8String): Long = countMemo(s.toString)

  /** Whole-text total: split on single spaces and sum the per-word
    * counts, all in compiled code — the per-token hot path for
    * document-level budgets (one call per DOCUMENT instead of a
    * higher-order transform+aggregate per token, which pays lambda
    * dispatch + boxing per element). Same tokenization contract as
    * TextOps.tokens (split(text, " ") keeping empties; empty words
    * count 0 symbols). */
  def countText(s: UTF8String): Long = {
    val words = s.toString.split(" ", -1)
    var total = 0L
    var i = 0
    while (i < words.length) { total += countMemo(words(i)); i += 1 }
    total
  }

  /** `bpe_count(word): BIGINT` as a codegen'd native expression. */
  def countCol(word: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.BpeCountLong(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(word)))

  /** Static entry point for generated Java: the fixpoint segmentation
    * as a Catalyst array value. */
  def segmentsData(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      segment(s.toString).map(w => UTF8String.fromString(w): Any).toArray)

  /** `bpe_count_text(text): BIGINT` as a codegen'd native expression —
    * document-level sum of per-word symbol counts. */
  def countTextCol(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.BpeCountTextLong(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))

  /** `bpe_segments(word): ARRAY<STRING>` as a codegen'd native
    * expression. */
  def segmentsCol(word: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.BpeSegmentsArray(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(word)))

  /** DuckDB literal list of merge keys ('lhs|rhs' at list position
    * rank+1) — the oracle's rank lookup is
    * `NULLIF(list_position(<this>, a || '|' || b), 0)` (DuckDB's
    * list_position returns 0, NOT NULL, for a missing element). */
  def sqlMergeList: String =
    Merges.map { case (a, b) => s"'$a|$b'" }.mkString("[", ", ", "]")

  /** DuckDB CTE fragment replaying the EXACT encoder on the distinct
    * words of a prior CTE `wordsCte` (one VARCHAR column `w`). Appends
    * recursive states until the fixpoint; yields `bpe(w, n_bpe)`.
    * Interpolate after a `WITH RECURSIVE`. */
  def oracleCte(wordsCte: String): String = {
    val ml = sqlMergeList
    s"""bpe_step AS (
        SELECT w, list_transform(range(1, length(w) + 1),
                 i -> w[i:i]) AS s
        FROM (SELECT DISTINCT w FROM $wordsCte)
        UNION ALL
        SELECT w,
               list_concat(list_concat(s[1:p-1], [s[p] || s[p+1]]), s[p+2:]) AS s
        FROM (
          SELECT w, s,
                 list_position(rk, list_min(rk)) AS p
          FROM (SELECT w, s,
                       list_transform(range(1, len(s)),
                         i -> NULLIF(list_position($ml, s[i] || '|' || s[i+1]), 0)) AS rk
                FROM bpe_step) h
          WHERE list_min(rk) IS NOT NULL) g),
      bpe AS (
        SELECT w, CAST(len(s) AS BIGINT) AS n_bpe
        FROM bpe_step
        WHERE list_min(list_transform(range(1, len(s)),
                i -> NULLIF(list_position($ml, s[i] || '|' || s[i+1]), 0))) IS NULL)"""
  }

  /** Like [[oracleCte]] but yields the full fixpoint SEGMENTATION
    * `bpe_seg(w, s LIST<VARCHAR>)` instead of just its length — for
    * oracles that need the symbol stream itself (e.g. q134's
    * next-merge-candidate counts). Interpolate after `WITH RECURSIVE`;
    * do not combine with [[oracleCte]] in one query (both define
    * `bpe_step`). */
  def oracleSegCte(wordsCte: String): String = {
    val ml = sqlMergeList
    s"""bpe_step AS (
        SELECT w, list_transform(range(1, length(w) + 1),
                 i -> w[i:i]) AS s
        FROM (SELECT DISTINCT w FROM $wordsCte)
        UNION ALL
        SELECT w,
               list_concat(list_concat(s[1:p-1], [s[p] || s[p+1]]), s[p+2:]) AS s
        FROM (
          SELECT w, s,
                 list_position(rk, list_min(rk)) AS p
          FROM (SELECT w, s,
                       list_transform(range(1, len(s)),
                         i -> NULLIF(list_position($ml, s[i] || '|' || s[i+1]), 0)) AS rk
                FROM bpe_step) h
          WHERE list_min(rk) IS NOT NULL) g),
      bpe_seg AS (
        SELECT w, s
        FROM bpe_step
        WHERE list_min(list_transform(range(1, len(s)),
                i -> NULLIF(list_position($ml, s[i] || '|' || s[i+1]), 0))) IS NULL)"""
  }
}
