package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text / LLM-data-pipeline operators over a document corpus: exact and
  * near-duplicate detection, fingerprinting, and quality metrics.
  *
  * Everything is built from codegen'd Spark built-ins (no UDFs); the hash
  * primitive is `md5`, chosen because it exists with identical output in
  * both Spark and DuckDB — which makes every operator here oracle-checkable
  * end to end (the correctness harness compares against DuckDB SQL running
  * the same formulas).
  *
  * Scale design (the 100 TB contract):
  *  - near-dup detection is MinHash + LSH banding: candidates come from a
  *    `groupBy(band)` equi-join, never an all-pairs product;
  *  - SimHash pairs come from a pigeonhole chunk-join (hamming <= d with
  *    c > d chunks guarantees one exact chunk match), also never all-pairs;
  *  - per-doc signatures are one explode + hash-agg, map-side combinable.
  */
object TextOps {

  /** Near-dup banding geometry + verification threshold, shared by the
    * batch path (TextQueries q17/q39/q43) and the streaming path
    * (streaming/NearDupStream). Tune HERE: a divergence between the two
    * paths would silently break the stream == batch equivalence the
    * NearDupStreamSpec proves. 64 perms / 16 bands x 4 rows puts the
    * LSH S-curve threshold at ~(1/16)^(1/4) ≈ 0.5. */
  val MinhashPerms = 64
  val LshBands = 16
  val LshBandRows = 4
  val DefaultJaccardThreshold = 0.5

  /** Whitespace tokenization — the corpus contract (documents.text is
    * single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram hashes WITH multiplicity (no array_distinct — q78's
    * repetition metrics need every occurrence), as 60-bit md5-derived
    * longs so downstream sorts/counts move longs, not strings.
    * Documents shorter than n tokens produce an empty array (guarded:
    * an unguarded `sequence(1, len-n+1)` would DESCEND for short docs
    * and fabricate grams). */
  def gramHashes(toks: Column, n: Int): Column = {
    val g = transform(
      sequence(lit(1), size(toks) - lit(n - 1)),
      i => Kmv.hash60(
        concat_ws(" ", (0 until n).map(o => element_at(toks, i + lit(o))): _*)))
    when(size(toks) >= n, g).otherwise(array().cast("array<bigint>"))
  }

  /** Count of the most frequent element of a SORTED array = its longest
    * equal-run, via one aggregate() fold with (prev, run, best) state —
    * map-only, the no-shuffle path to "top n-gram count per doc".
    * Empty arrays give 0. */
  def topRunLength(sorted: Column): Column =
    aggregate(
      sorted,
      struct(lit(Long.MinValue).as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(acc.getField("prev") === x, acc.getField("run") + lit(1L))
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Distinct word n-gram shingles, mirrored exactly by the DuckDB
    * fragment (`t[i] || ' ' || t[i+1] ...`, 1-based `range`). Documents
    * shorter than n tokens produce an empty shingle set. */
  def shingles(toks: Column, n: Int = 3): Column = {
    val grams = transform(
      sequence(lit(1), size(toks) - lit(n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + lit(o))): _*))
    array_distinct(when(size(toks) >= n, grams).otherwise(array().cast("array<string>")))
  }

  /** One MinHash value: the lexicographic minimum of `md5(perm || '|' ||
    * shingle)` over the document's shingles. Seeded by the permutation
    * index, so signatures are deterministic across engines and runs. */
  def minhash(shingleCol: Column, perm: Int): Column =
    array_min(transform(shingleCol, s => md5(concat(lit(s"$perm|"), s))))

  /** MinHash signature matrix from ONE base hash per shingle.
    *
    * Permutation k is the universal family h_k(x) = (a_k*x + b_k) mod p
    * over a 28-bit md5-derived base hash, with FIXED seeded random
    * constants per k. The per-k randomness is essential: an earlier
    * "cheap" family h_k = a + k*b made the comparison between two
    * shingles LINEAR in k (it flips at most once across all k), so one
    * unshared shingle with a small base hash could win every
    * permutation — at sf0.1 that missed a true pair with jaccard 0.947
    * whose miss probability under independent permutations is ~5e-12.
    * All arithmetic stays below 2^59 (no overflow, ANSI-safe).
    *
    * Input: one row per (id, shingle col "s"). Output: (id, m0..m{n-1}).
    */
  def minhashSignatures(exploded: DataFrame, id: String, perms: Int): DataFrame = {
    val P = 2147483647L // 2^31 - 1 (prime)
    val rnd = new scala.util.Random(42) // java.util.Random LCG: spec-stable
    val consts = Seq.fill(perms)((1L + rnd.nextInt(Int.MaxValue - 1).toLong,
      rnd.nextInt(Int.MaxValue).toLong))
    val x = conv(substring(md5(col("s")), 1, 7), 16, 10).cast("long")
    val minCols = consts.zipWithIndex.map { case ((a, b), k) =>
      min(pmod(lit(a) * col("__x") + lit(b), lit(P))).as(s"m$k")
    }
    exploded.withColumn("__x", x)
      .groupBy(col(id))
      .agg(minCols.head, minCols.tail: _*)
  }

  /** One row per (id, shingle) via a codegen-friendly explode of the
    * shingle START POSITIONS — `transform`+`concat_ws` higher-order
    * lambdas are interpreted per element and dominated the signature
    * pipeline. Shingle MULTIPLICITY is preserved (no distinct): min-based
    * signatures (MinHash, fingerprints) are multiset-invariant, so this
    * is both cheaper and equivalent; use [[shingles]] where the distinct
    * SET is required (exact Jaccard). */
  def explodedShingles(df: org.apache.spark.sql.DataFrame, id: String, text: String,
                       n: Int = 3): org.apache.spark.sql.DataFrame = {
    val t = col("__t")
    df.select(col(id), tokens(col(text)).as("__t"))
      .select(col(id), t,
        explode(when(size(t) >= n, sequence(lit(1), size(t) - lit(n - 1)))
          .otherwise(array().cast("array<int>"))).as("__i"))
      .select(col(id),
        concat_ws(" ", (0 until n).map(o => element_at(t, col("__i") + lit(o))): _*).as("s"))
  }

  /** LSH band hash: md5 over the concatenation of `rows` consecutive
    * minhashes. Documents agreeing on any band become candidates. */
  def bandHash(minhashes: Seq[Column], band: Int, rows: Int): Column =
    md5(concat_ws("|", minhashes.slice(band * rows, band * rows + rows): _*))

  /** 32-bit SimHash: bit j is the sign of the count-weighted sum of
    * (2*b-1) where b is the parity of hex digit j of md5(token). Parity
    * of a uniform hex digit is a uniform bit; 32 bits is ample for
    * hamming<=3 near-dup detection (random pairs center at hamming 16).
    *
    * Input: one row per (id, token, cnt). Output: (id, simhash: long).
    */
  def simhash(tokenCounts: DataFrame, id: String, token: String, cnt: String): DataFrame = {
    // One md5 per token row, then 32 wide integer sum-aggregates (hash
    // aggregation with long buffers) — NOT an explode over bit index j,
    // which would multiply the shuffle by 32x for the same result.
    //
    // The 32 digit parities are extracted from THREE pre-parsed hex
    // chunks (15+15+2 digits, each `conv`ed to a long once) with
    // shift/mask bit ops — not 32 separate conv(substring) string
    // parses per row, which dominated the per-row cost (q18 was the
    // heaviest bench line). Identical bits, same simhash values.
    def chunk(start: Int, len: Int) =
      conv(substring(col("__h"), start, len), 16, 10).cast("long")
    def parity(j: Int): Column = {
      // 0-based hex digit j lives in chunk j/15 at in-chunk position
      // j%15 (last chunk holds digits 30..31); parity = low bit of the
      // digit = bit 4*(width-1-pos) of the chunk's long value
      val (c, pos, width) =
        if (j < 15) (col("__k0"), j, 15)
        else if (j < 30) (col("__k1"), j - 15, 15)
        else (col("__k2"), j - 30, 2)
      shiftright(c, 4 * (width - 1 - pos)).bitwiseAND(lit(1L)).cast("int")
    }
    val contribs = (0 until 32).map { j =>
      sum(col(cnt) * (lit(2) * parity(j) - lit(1))).as(s"__c$j")
    }
    tokenCounts
      .withColumn("__h", md5(col(token)))
      .withColumn("__k0", chunk(1, 15))
      .withColumn("__k1", chunk(16, 15))
      .withColumn("__k2", chunk(31, 2))
      .groupBy(col(id))
      .agg(contribs.head, contribs.tail: _*)
      .select(col(id),
        (0 until 32).map(j => when(col(s"__c$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Candidate pairs within hamming distance `maxHamming` of each other,
    * via pigeonhole chunk-join: the 32-bit simhash is cut into `chunks`
    * 8-bit chunks; any pair with hamming <= chunks-1 must agree exactly on
    * at least one chunk, so a per-chunk equi-join is COMPLETE (no recall
    * loss) while avoiding the all-pairs product. Output: (a_id, b_id,
    * hamming), a_id < b_id, exact-verified.
    */
  def simhashPairs(sigs: DataFrame, id: String, maxHamming: Int, chunks: Int = 4): DataFrame = {
    require(maxHamming < chunks, "pigeonhole completeness needs maxHamming < chunks")
    val chunked = sigs.select(
      col(id), col("simhash"),
      explode(array((0 until chunks).map { c =>
        struct(lit(c).as("c"), shiftright(col("simhash"), 8 * c).bitwiseAND(lit(255L)).as("v"))
      }: _*)).as("chunk"))
    // Join two explicit ALIASES of the same frame. Dataset column refs
    // (a("chunk") === b("chunk")) carry the same attribute id on both
    // sides of a self-join, which Spark logs as a trivially-true
    // predicate and rescues via disambiguation — and if that rescue ever
    // failed, the condition would silently degrade to `a_id < b_id`
    // alone: a complete-but-O(n^2) cross product. Qualified names over
    // aliases make the chunk equality a real equi-key unconditionally.
    val a = chunked.alias("a")
    val b = chunked.alias("b")
    a.join(b, col("a.chunk") === col("b.chunk") && col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("a_id"), col(s"b.$id").as("b_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Fixed-size token chunking with overlap — the training-data prep
    * step that splits long documents into model-window-sized pieces.
    * One row per chunk: (id, chunk_idx, chunk text, chunk token count).
    * Chunk starts step by `stride` (stride < size -> overlapping
    * windows); the tail chunk may be short but is never empty. Explode
    * over chunk starts keeps the whole thing codegen'd and
    * partition-local (no shuffle). `carry` columns ride along unchanged
    * (e.g. `source`), saving a corpus-wide re-join when a consumer needs
    * per-chunk metadata. */
  def chunked(df: DataFrame, id: String, text: String,
              chunkSize: Int, stride: Int, carry: Seq[String] = Nil): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    val t = col("__t")
    val cc = carry.map(col)
    val nChunks = ceil((size(t) - lit(chunkSize)) / lit(stride.toDouble)).cast("int") + lit(1)
    df.select(col(id) +: cc :+ tokens(col(text)).as("__t"): _*)
      .select(col(id) +: cc :+ t
        :+ explode(sequence(lit(0), greatest(nChunks - 1, lit(0)))).as("__c"): _*)
      .select(col(id) +: cc
        :+ col("__c").as("chunk_idx")
        :+ concat_ws(" ", slice(t, col("__c") * stride + 1, lit(chunkSize))).as("chunk")
        :+ size(slice(t, col("__c") * stride + 1, lit(chunkSize)))
          .cast("long").as("n_tokens"): _*)
      .filter(col("n_tokens") > 0)
  }

  /** Winnowing document fingerprints (the MOSS rolling-selection scheme:
    * Schleimer/Wilkerson/Aiken, SIGMOD'03): hash every `gram`-token
    * gram, then keep the MINIMUM hash of each `window` consecutive
    * grams. Guarantee: any shared token run of length >= gram+window-1
    * between two documents produces at least one shared fingerprint —
    * local plagiarism/quotation detection that whole-document hashes
    * miss. Entirely per-row array ops (codegen'd, shuffle-free); output
    * one row per (id, distinct fp), ready for a fp equi-join — never an
    * all-pairs product. */
  def winnowFingerprints(df: DataFrame, id: String, text: String,
                         gram: Int = 4, window: Int = 4): DataFrame = {
    require(gram > 0 && window > 0, "gram and window must be positive")
    // Shape: explode gram START POSITIONS and keep every expression a
    // scalar (codegen'd md5 per gram row, then a running `min` window
    // over the next `window-1` rows). The array formulation —
    // transform(sequence, j => array_min(slice(grams, j, w))) followed
    // by explode — is catastrophically slow: the nested interpreted
    // HOF array is re-evaluated under the Generate, turning a 0.3 s
    // stage into ~300 s at sf0.1. Cost here is one shuffle by doc id +
    // per-doc sort (docs are bounded length), all codegen.
    val t = col("__t")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id)).orderBy(col("__i"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, window - 1)
    df.select(col(id), tokens(col(text)).as("__t"))
      // shorter docs have no complete window; filtering (not a `when`
      // fallback) keeps every sequence() ascending
      .filter(size(t) >= gram + window - 1)
      .select(col(id), t, (size(t) - lit(gram - 1)).as("__G"),
        explode(sequence(lit(1), size(t) - lit(gram - 1))).as("__i"))
      .select(col(id), col("__G"), col("__i"),
        md5(concat_ws(" ",
          (0 until gram).map(o => element_at(t, col("__i") + lit(o))): _*)).as("__h"))
      .select(col(id), col("__G"), col("__i"), min(col("__h")).over(w).as("fp"))
      .filter(col("__i") <= col("__G") - lit(window - 1))
      .select(col(id), col("fp"))
      .distinct()
  }

  /** Distinct shingle SETS for exact-Jaccard verification: one row per
    * (id, sh ARRAY<STRING>). collect_set order is irrelevant — only
    * intersection/size arithmetic consumes it. */
  def shingleSets(df: DataFrame, id: String, text: String, n: Int = 3): DataFrame =
    explodedShingles(df, id, text, n)
      .groupBy(col(id)).agg(collect_set(col("s")).as("sh"))

  /** ASYMMETRIC containment join with PREFIX FILTERING (the SSJoin /
    * ppjoin family — Chaudhuri et al. ICDE'06, Xiao et al. WWW'08):
    * all ordered pairs (a, b) with C(a→b) = |sh(a) ∩ sh(b)| / |sh(a)|
    * ≥ tNum/tDen. Containment is what resemblance (Jaccard, q17) can't
    * see: a boilerplate template fully embedded in a much larger page
    * has tiny Jaccard but containment ≈ 1 — the quote/template/
    * boilerplate detector of a curation pipeline (Broder's containment,
    * SPEX-style supserset dedup).
    *
    * Why not all-pairs: the prefix-filter theorem — if |A∩B| ≥ α then
    * ANY (|A|−α+1)-subset of A intersects B — makes candidate
    * generation an EQUI-JOIN: a's prefix shingles (its |A|−α+1
    * RAREST, by global document frequency — rarest-first makes
    * posting lists short) against the full inverted index. The filter
    * is LOSSLESS for any fixed prefix length (pure set theory; the
    * ordering only buys efficiency), so results equal the quadratic
    * definition — which is exactly what q114's all-pairs oracle checks.
    *
    * Threshold arithmetic is integer-only (α = ⌈tNum·|A|/tDen⌉ via
    * (tNum·|A|+tDen−1) div tDen; the final test is inter·tDen ≥
    * |A|·tNum): no float threshold crossing to drift across engines.
    *
    * Scale shape: shingle-df aggregate (shuffle by shingle), per-doc
    * rank window (shuffle by doc — partitioned by doc id, never
    * global), prefix⋈index equi-join on the shingle (hot shingles have
    * high df and therefore fall OUTSIDE prefixes, so posting-list skew
    * is self-limiting), candidate dedup, then one set-join verify pass
    * over candidates only. The size prune (|B| ≥ α) drops pairs no
    * verify could pass.
    */
  def containmentPairs(df: DataFrame, id: String, text: String,
                       tNum: Int, tDen: Int, n: Int = 3): DataFrame = {
    require(tNum > 0 && tDen >= tNum, s"threshold $tNum/$tDen")
    // Materialize the tokenize+shingle scan ONCE (the GraphOps rule: a
    // self-join must not re-run its expensive input): ex feeds the size
    // and document-frequency aggregates, the prefix window, the
    // inverted-index candidate join, AND (via collect_set) both sides
    // of the exact verification — six references that would otherwise
    // each re-tokenize the corpus.
    //
    // Shingles are carried as 60-bit md5-derived LONGS (r14, guide
    // §2.3 "shuffle fewer bytes"): every downstream exchange — the df
    // aggregate, the prefix window, the inverted-index join, the set
    // arrays on both verify sides — moves 8-byte keys instead of
    // ~20-byte gram strings, and set intersection hashes longs. This is
    // the persisted layout of the near-dup index (hash60 = the exact
    // expression the oracle replays); sizes/intersections are identical
    // to the string-set computation modulo md5-60-bit collisions.
    val ex = explodedShingles(df, id, text, n)
      .select(col(id), Kmv.hash60(col("s")).as("s"))
      .distinct().localCheckpoint()
    val sizes = ex.groupBy(col(id)).agg(count(lit(1)).as("__nsh"))
    val dfreq = ex.groupBy(col("s")).agg(count(lit(1)).as("__df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id)).orderBy(col("__df").asc, col("s").asc)
    val prefixes = ex.join(dfreq, Seq("s"))
      .withColumn("__rn", row_number().over(w))
      .join(sizes, Seq(id))
      .withColumn("__alpha",
        Sampling.ldiv(lit(tNum) * col("__nsh") + lit(tDen - 1), lit(tDen)))
      .filter(col("__rn") <= col("__nsh") - col("__alpha") + lit(1))
      .select(col(id).as("a_id"), col("s"), col("__alpha"))
    val cand = prefixes
      .join(ex.select(col(id).as("b_id"), col("s")), Seq("s"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), col("__alpha"))
      .distinct()
      .join(sizes.select(col(id).as("b_id"), col("__nsh").as("__nb")), Seq("b_id"))
      .filter(col("__nb") >= col("__alpha"))
      .select(col("a_id"), col("b_id"))
    // ex is already the DISTINCT per-doc shingle list, so collect_set
    // over it equals shingleSets(df) without another corpus scan.
    // Eagerly checkpointed (r14): the verify step joins `sets` on BOTH
    // sides, and the two references do not share their exchange (the
    // per-side aggregate expressions differ), so the un-checkpointed
    // form built the set arrays TWICE — the two single largest jobs in
    // the q114 profile (~0.8 s each at sf0.1).
    val sets = ex.groupBy(col(id)).agg(collect_set(col("s")).as("sh"))
      .localCheckpoint()
    cand
      .join(sets.select(col(id).as("a_id"), col("sh").as("__sha")), Seq("a_id"))
      .join(sets.select(col(id).as("b_id"), col("sh").as("__shb")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        size(col("__sha")).cast("long").as("n_a"),
        size(col("__shb")).cast("long").as("n_b"),
        size(array_intersect(col("__sha"), col("__shb"))).cast("long").as("inter"))
      .filter(col("inter") * lit(tDen.toLong) >= col("n_a") * lit(tNum.toLong))
      .withColumn("containment", col("inter").cast("double") / col("n_a"))
  }

  /** Exact-Jaccard verification of candidate (a_id, b_id) pairs against
    * a (doc_id, sh) shingle-set store: joins both sides' sets, computes
    * |a ∩ b| ONCE via a two-step projection (CollapseProject refuses to
    * inline the non-cheap intersection referenced twice, so this holds
    * without relying on codegen subexpression elimination), and keeps
    * pairs at or above `threshold`. Shared by q17/q39/q43 and the
    * streaming near-dup index. */
  def jaccardVerify(cand: DataFrame, sets: DataFrame, id: String,
                    threshold: Double = DefaultJaccardThreshold): DataFrame =
    cand
      .join(sets.select(col(id).as("a_id"), col("sh").as("sha")), Seq("a_id"))
      .join(sets.select(col(id).as("b_id"), col("sh").as("shb")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        size(array_intersect(col("sha"), col("shb"))).as("__i"),
        size(col("sha")).as("__na"), size(col("shb")).as("__nb"))
      .select(col("a_id"), col("b_id"),
        (col("__i").cast("double") / (col("__na") + col("__nb") - col("__i")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /** One-shot batch near-dup pairs over a static corpus: MinHash
    * signatures → (band, band-hash) equi-join candidates → exact-Jaccard
    * verification, with the geometry constants above. Output: (a_id,
    * b_id, jaccard), a_id < b_id. Shared by the streaming index's batch
    * reference ([[graft.streaming.NearDupStream.batchPairs]] delegates
    * here) and the curated-corpus write path
    * ([[graft.pipeline.CuratedCorpus]]), so every consumer finds the
    * same pairs. Never an all-pairs product: candidates come from the
    * band equi-join; exact verification touches only collisions. */
  def nearDupPairs(docs: DataFrame, id: String, text: String,
                   threshold: Double = DefaultJaccardThreshold): DataFrame = {
    val sigs = minhashSignatures(explodedShingles(docs, id, text), id, MinhashPerms)
    val mh = (0 until MinhashPerms).map(k => col(s"m$k"))
    val bands = sigs.select(col(id),
      explode(array((0 until LshBands).map { b =>
        struct(lit(b).as("band"), bandHash(mh, b, LshBandRows).as("bh"))
      }: _*)).as("x"))
      .select(col(id), col("x.band").as("band"), col("x.bh").as("bh"))
    val cand = bands.alias("a")
      .join(bands.alias("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("a_id"), col(s"b.$id").as("b_id"))
      .distinct()
    jaccardVerify(cand, shingleSets(docs, id, text), id, threshold)
  }

  /** Exact Jaccard similarity of two (distinct-element) shingle arrays:
    * |a ∩ b| / (|a| + |b| - |a ∩ b|) — the single integer division is
    * bit-identical across engines. */
  def jaccard(a: Column, b: Column): Column = {
    // NOTE: the val-bound `inter` still embeds the same expression tree
    // twice — within one projection, codegen subexpression elimination
    // normally dedupes it, but hot paths should not rely on that: the
    // q17/q39 candidate-verification path (TextQueries.nearDupPairs)
    // projects the intersection size as its own column in a separate
    // step so CollapseProject cannot duplicate it. This helper is the
    // convenience/compositional form.
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter)
  }
}
