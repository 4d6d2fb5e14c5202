package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Bloom, Kmv, Relational, TextOps}

/** LLM-data-pipeline text operators over the `documents` corpus
  * (BASELINE north-star E1/E2/E4 + fingerprinting/quality/lang-id):
  * exact content dedup, MinHash+LSH near-dup, SimHash near-dup,
  * n-gram-Jaccard similarity, token statistics, quality scoring,
  * heuristic language ID, and min-hash document fingerprinting.
  *
  * Every query is DuckDB-oracle-checked: all hashing is md5 (identical
  * in both engines), all ratios are single integer→double divisions,
  * all integer outputs are BIGINT on both sides.
  */
object TextQueries {

  // Near-dup parameters live in TextOps (single source of truth shared
  // with streaming/NearDupStream); these are interpolation aliases.
  private val MinhashPerms = TextOps.MinhashPerms
  private val Bands = TextOps.LshBands
  private val BandRows = TextOps.LshBandRows
  private val JaccardThreshold = TextOps.DefaultJaccardThreshold

  // The testdata corpus arrives as one small parquet file -> one input
  // partition; the per-row work here (shingling, hashing) is CPU-heavy,
  // so spread it across the cluster first. GATED: when the input is
  // already at least core-wide (the 100 TB layout), the extra exchange
  // would be a pure waste — leave the scan partitioning alone.
  private def docs(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    if (d.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism) d
    else d.repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
  }

  private val shingleSqlCte =
    """s AS (
        SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) sh
        FROM (SELECT doc_id, string_split(text, ' ') t FROM documents))"""

  /** [[shingleSqlCte]] over 60-bit gram HASHES — the exact expression
    * NearDupIndex format 2 persists (VERDICT r12 #4), so the q210/q214/
    * q219 oracles verify the hashed layout bit for bit: Jaccard over
    * distinct hashes replaces Jaccard over distinct strings, identical
    * arithmetic on both engines. */
  private val hashedShingleSqlCte =
    """s AS (
        SELECT doc_id, list_distinct(list_transform(
               list_transform(range(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]),
               g -> CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT))) sh
        FROM (SELECT doc_id, string_split(text, ' ') t FROM documents))"""

  // --- E1: exact content-hash dedup (reference A4 generalized) ----------
  private val q16 = Q(
    (spark, dir) => {
      val d = docs(spark, dir)
      val raw = d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      val kept = Relational
        .dedupKeepFirst(d.withColumn("__ch", md5(col("text"))),
          keys = Seq("__ch"), order = Seq(col("doc_id")))
        .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
      raw.join(kept, Seq("source"), "left")
        .select(col("source"), col("n_docs"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (col("n_docs") - coalesce(col("n_kept"), lit(0L))).as("n_dups"))
        .orderBy(col("source"))
    },
    // Dedup is GLOBAL (one survivor per content hash corpus-wide, lowest
    // doc_id wins); the per-source report counts each source's surviving
    // rows. A per-source count(DISTINCT md5) would diverge whenever the
    // same text appears under two sources (it does at sf0.1).
    Some("""
      WITH kept AS (
        SELECT source FROM (
          SELECT source, row_number() OVER (
            PARTITION BY md5(text) ORDER BY doc_id ASC NULLS FIRST) AS rn
          FROM documents) WHERE rn = 1),
      r AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
      k AS (SELECT source, count(*) AS n_kept FROM kept GROUP BY 1)
      SELECT r.source, n_docs, coalesce(n_kept, 0) AS n_kept,
             n_docs - coalesce(n_kept, 0) AS n_dups
      FROM r LEFT JOIN k ON r.source = k.source
      ORDER BY r.source ASC NULLS FIRST"""))

  // --- E2: near-dup detection, MinHash + LSH banding ---------------------
  // Spark path: 64 minhashes -> 16 bands -> groupBy(band) candidates ->
  // exact-Jaccard verify. The ORACLE is exact all-pairs Jaccard, so any
  // LSH recall loss would surface as a row mismatch. (At 64 perms / 16
  // bands, P(miss) at j=0.9 is ~4e-8; the corpus is bimodal j<=0.07 or
  // j>=0.9.) At scale the banding join replaces the O(n^2) product.
  //
  // The 64 permutations derive from ONE md5 per shingle via a seeded
  // universal family (see TextOps.minhashSignatures — per-k random
  // constants are REQUIRED for independent permutations; a linear-in-k
  // family missed a jaccard-0.947 pair at sf0.1).
  /** LSH candidate pairs verified by exact Jaccard (shared by q17/q39). */
  private def nearDupPairs(spark: SparkSession, dir: String): DataFrame = {
      // ONE tokenize+shingle pass (r14, the BM25 one-pass discipline):
      // the exploded shingle stream feeds the MinHash signatures AND the
      // exact-Jaccard verification sets; un-checkpointed, each side
      // re-ran the corpus scan + tokenize + explode. collect_set over
      // the multiplicity-preserving stream equals shingleSets exactly.
      val ex = TextOps.explodedShingles(docs(spark, dir), "doc_id", "text")
        .localCheckpoint()
      val sigs = TextOps.minhashSignatures(ex, "doc_id", MinhashPerms)
      val banded = sigs.select(col("doc_id"),
        explode(array((0 until Bands).map { b =>
          struct(lit(b).as("band"),
            struct((0 until BandRows)
              .map(i => col(s"m${b * BandRows + i}").as(s"r$i")): _*).as("bh"))
        }: _*)).as("bd"))
      val cand = banded.as("a")
        .join(banded.as("b"),
          col("a.bd") === col("b.bd") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .distinct()
      // Exact-Jaccard verification via the shared TextOps.jaccardVerify
      // (single intersection eval through a two-step projection; also
      // the streaming path's verifier, so the semantics cannot drift).
      // The candidate subtree has exactly ONE consumer, so nothing needs
      // persist() and the bench measures a cold plan honestly. No
      // broadcast hint: the set table is corpus-sized, so a forced
      // broadcast would hit the driver / 8 GB broadcast limits at scale
      // — AQE broadcasts when it is actually small and shuffle-joins
      // otherwise.
      TextOps.jaccardVerify(cand,
        ex.groupBy(col("doc_id")).agg(collect_set(col("s")).as("sh")),
        "doc_id", JaccardThreshold)
  }

  private val q17 = Q(
    (spark, dir) => nearDupPairs(spark, dir).orderBy(col("a_id"), col("b_id")),
    Some(s"""
      WITH $shingleSqlCte,
      p AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        FROM s a JOIN s b ON a.doc_id < b.doc_id)
      SELECT a_id, b_id, jaccard FROM p WHERE jaccard >= $JaccardThreshold
      ORDER BY a_id ASC NULLS FIRST, b_id ASC NULLS FIRST"""))

  // --- E2d: near-dup CLUSTERS + canonical survivor -----------------------
  // Pairs alone don't dedup a corpus: (a,b) and (b,c) must collapse into
  // one cluster. Connected components of the verified pair graph, each
  // labeled by its minimum doc_id (the canonical survivor). Oracle:
  // transitive closure via recursive CTE over the exact all-pairs graph.
  private val q39 = Q(
    (spark, dir) => {
      graft.operators.GraphOps
        .connectedComponents(nearDupPairs(spark, dir), "a_id", "b_id")
        .select(col("node").as("doc_id"), col("cluster_id"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH RECURSIVE $shingleSqlCte,
      p AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
              >= $JaccardThreshold),
      e AS (SELECT a_id AS s, b_id AS t FROM p
            UNION SELECT b_id, a_id FROM p
            UNION SELECT a_id, a_id FROM p
            UNION SELECT b_id, b_id FROM p),
      reach(s, t) AS (
        SELECT s, t FROM e
        UNION
        SELECT reach.s, e.t FROM reach JOIN e ON reach.t = e.s)
      SELECT s AS doc_id, min(t) AS cluster_id FROM reach GROUP BY s
      ORDER BY doc_id ASC NULLS FIRST"""))

  // --- E2f: quality-based survivor selection per near-dup cluster --------
  // What a production training-data dedup actually ships: among the
  // members of each near-dup cluster, KEEP the best document — here by
  // type-token ratio (the q21 quality signal; a single exact-int
  // division, so the ranking is bit-identical across engines), doc_id
  // as the deterministic tiebreak. Output one row per multi-member
  // cluster: (cluster_id, survivor_id, n_members).
  private val q43 = Q(
    (spark, dir) => {
      val clusters = graft.operators.GraphOps
        .connectedComponents(nearDupPairs(spark, dir), "a_id", "b_id")
        .select(col("node").as("doc_id"), col("cluster_id"))
      val t = TextOps.tokens(col("text"))
      val quality = docs(spark, dir).select(col("doc_id"),
        (size(array_distinct(t)).cast("double") / size(t)).as("ttr"))
      clusters.join(quality, Seq("doc_id"))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          max_by(col("doc_id"), struct(col("ttr"), -col("doc_id"))).as("survivor_id"))
        .select(col("cluster_id"), col("survivor_id"), col("n_members"))
        .orderBy(col("cluster_id"))
    },
    Some(s"""
      WITH RECURSIVE $shingleSqlCte,
      p AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
              >= $JaccardThreshold),
      e AS (SELECT a_id AS s, b_id AS t FROM p
            UNION SELECT b_id, a_id FROM p
            UNION SELECT a_id, a_id FROM p
            UNION SELECT b_id, b_id FROM p),
      reach(s, t) AS (
        SELECT s, t FROM e
        UNION
        SELECT reach.s, e.t FROM reach JOIN e ON reach.t = e.s),
      cl AS (SELECT s AS doc_id, min(t) AS cluster_id FROM reach GROUP BY s),
      qm AS (SELECT doc_id,
                    CAST(len(list_distinct(t2)) AS DOUBLE) / len(t2) AS ttr
             FROM (SELECT doc_id, string_split(text, ' ') t2 FROM documents)),
      jj AS (SELECT cl.cluster_id, cl.doc_id, qm.ttr
             FROM cl JOIN qm ON qm.doc_id = cl.doc_id),
      rr AS (SELECT cluster_id, doc_id,
                    row_number() OVER (PARTITION BY cluster_id
                      ORDER BY ttr DESC NULLS LAST, doc_id ASC NULLS FIRST) AS rn,
                    count(*) OVER (PARTITION BY cluster_id) AS n_members
             FROM jj)
      SELECT cluster_id, doc_id AS survivor_id, CAST(n_members AS BIGINT) AS n_members
      FROM rr WHERE rn = 1
      ORDER BY cluster_id ASC NULLS FIRST"""))

  // --- E4g: deterministic train/val/test split ---------------------------
  // Reproducible dataset splits are a training-data primitive: the
  // split is a pure function of the stable document id (salted md5
  // bucket 0-99 -> 80/10/10), so it is identical on any cluster, any
  // partitioning, any rerun — no RNG, no state. Per-(split, source)
  // counts are the auditable output.
  private val q44 = Q(
    (spark, dir) => {
      val b = conv(substring(
        md5(concat(lit("split|"), col("doc_id").cast("string"))), 1, 7), 16, 10)
        .cast("long") % 100
      docs(spark, dir)
        .select(col("source"),
          when(b < 80, "train").when(b < 90, "val").otherwise("test").as("split"))
        .groupBy(col("split"), col("source"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("split"), col("source"))
    },
    Some("""
      WITH b AS (
        SELECT source,
               CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 7))
                 AS BIGINT) % 100 AS bkt
        FROM documents)
      SELECT CASE WHEN bkt < 80 THEN 'train'
                  WHEN bkt < 90 THEN 'val'
                  ELSE 'test' END AS split,
             source, CAST(count(*) AS BIGINT) AS n_docs
      FROM b GROUP BY 1, 2
      ORDER BY split ASC NULLS FIRST, source ASC NULLS FIRST"""))

  // --- E2b: SimHash near-dup (pigeonhole chunk-join, no all-pairs) -------
  private val q18 = Q(
    (spark, dir) => {
      // pre-grouping to (doc, token, cnt) halves the downstream md5 +
      // digit-extraction work (the corpus repeats tokens heavily);
      // measured faster than feeding raw occurrences despite the
      // extra shuffle
      val tok = docs(spark, dir)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("cnt"))
      val sigs = TextOps.simhash(tok, "doc_id", "token", "cnt")
      TextOps.simhashPairs(sigs, "doc_id", maxHamming = 3)
        .select(col("a_id"), col("b_id"), col("hamming").cast("long").as("hamming"))
        .orderBy(col("a_id"), col("b_id"))
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, t AS token, count(*) AS cnt
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) t FROM documents)
        GROUP BY 1, 2),
      bits AS (
        SELECT doc_id, j,
               sum(cnt * (2 * ((strpos('0123456789abcdef',
                    substr(md5(token), CAST(j AS INT) + 1, 1)) - 1) % 2) - 1)) AS contrib
        FROM tok CROSS JOIN (SELECT unnest(range(32)) AS j)
        GROUP BY 1, 2),
      sh AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN contrib > 0 THEN CAST(power(2, j) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS simhash
        FROM bits GROUP BY 1)
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      ORDER BY a_id ASC NULLS FIRST, b_id ASC NULLS FIRST"""))

  // --- E4: per-language token statistics ---------------------------------
  private val q19 = Q(
    (spark, dir) => {
      docs(spark, dir)
        .select(col("lang"), size(TextOps.tokens(col("text"))).as("nt"), col("n_chars"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nt")).as("total_tokens"),
          sum(col("n_chars")).as("total_chars"),
          (sum(col("nt")).cast("double") / count(lit(1))).as("avg_tokens"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH d AS (SELECT lang, string_split(text, ' ') t, n_chars FROM documents)
      SELECT lang, count(*) AS n_docs,
             CAST(sum(len(t)) AS BIGINT) AS total_tokens,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             CAST(sum(len(t)) AS DOUBLE) / count(*) AS avg_tokens
      FROM d GROUP BY 1 ORDER BY lang ASC NULLS FIRST"""))

  // --- E4b: global top-20 terms ------------------------------------------
  private val q20 = Q(
    (spark, dir) => {
      docs(spark, dir)
        .select(explode(TextOps.tokens(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc_nulls_last, col("term"))
        .limit(20)
    },
    Some("""
      SELECT t AS term, count(*) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) t FROM documents)
      GROUP BY 1 ORDER BY freq DESC NULLS LAST, term ASC NULLS FIRST LIMIT 20"""))

  // --- E4c: per-document quality scoring ---------------------------------
  private val Stopwords = operators.Curation.Stopwords
  private val q21 = Q(
    (spark, dir) => {
      val t = TextOps.tokens(col("text"))
      val stop = array(Stopwords.map(lit): _*)
      docs(spark, dir)
        .select(col("doc_id"),
          size(t).cast("long").as("n_tokens"),
          size(array_distinct(t)).cast("long").as("n_types"),
          size(filter(t, x => array_contains(stop, x))).cast("long").as("n_stop"),
          col("n_chars"))
        .select(col("doc_id"), col("n_tokens"), col("n_types"),
          (col("n_types").cast("double") / col("n_tokens")).as("type_token_ratio"),
          (col("n_stop").cast("double") / col("n_tokens")).as("stopword_ratio"),
          (col("n_chars").cast("double") / col("n_tokens")).as("avg_token_len"))
        .orderBy(col("type_token_ratio").desc_nulls_last, col("doc_id"))
        .limit(20)
    },
    Some(s"""
      WITH d AS (SELECT doc_id, string_split(text, ' ') t, n_chars FROM documents),
      m AS (
        SELECT doc_id, len(t) AS n_tokens, n_chars,
               len(list_distinct(t)) AS n_types,
               len(list_filter(t, x -> list_contains(
                 [${Stopwords.map("'" + _ + "'").mkString(",")}], x))) AS n_stop
        FROM d)
      SELECT doc_id, n_tokens, n_types,
             CAST(n_types AS DOUBLE) / n_tokens AS type_token_ratio,
             CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
             CAST(n_chars AS DOUBLE) / n_tokens AS avg_token_len
      FROM m
      ORDER BY type_token_ratio DESC NULLS LAST, doc_id ASC NULLS FIRST LIMIT 20"""))

  // --- E4d: heuristic language-ID score vs labeled lang ------------------
  private val EnMarkers = Seq("the", "a", "and", "spark", "fast")
  private val XMarkers = Seq("table", "data", "vector", "stream")
  private val q22 = Q(
    (spark, dir) => {
      val t = TextOps.tokens(col("text"))
      def score(ws: Seq[String]) =
        size(filter(t, x => array_contains(array(ws.map(lit): _*), x)))
      docs(spark, dir)
        .select(col("lang"), score(EnMarkers).as("s_en"), score(XMarkers).as("s_x"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("s_en") >= col("s_x"), 1L).otherwise(0L)).as("n_en_like"))
        .orderBy(col("lang"))
    },
    Some(s"""
      WITH d AS (SELECT doc_id, lang, string_split(text, ' ') t FROM documents),
      s AS (
        SELECT doc_id, lang,
          len(list_filter(t, x -> list_contains(
            [${EnMarkers.map("'" + _ + "'").mkString(",")}], x))) AS s_en,
          len(list_filter(t, x -> list_contains(
            [${XMarkers.map("'" + _ + "'").mkString(",")}], x))) AS s_x
        FROM d)
      SELECT lang, count(*) AS n,
             CAST(sum(CASE WHEN s_en >= s_x THEN 1 ELSE 0 END) AS BIGINT) AS n_en_like
      FROM s GROUP BY 1 ORDER BY lang ASC NULLS FIRST"""))

  // --- E2c: min-shingle-hash document fingerprint clusters ---------------
  private val q23 = Q(
    (spark, dir) => {
      TextOps.explodedShingles(docs(spark, dir), "doc_id", "text")
        .groupBy(col("doc_id")).agg(min(md5(col("s"))).as("fp"))
        .groupBy(col("fp"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .filter(col("n_docs") > 1)
        .orderBy(col("fp"))
    },
    Some(s"""
      WITH $shingleSqlCte,
      f AS (SELECT doc_id, list_min(list_transform(sh, x -> md5(x))) AS fp FROM s)
      SELECT fp, count(*) AS n_docs, min(doc_id) AS min_doc, max(doc_id) AS max_doc
      FROM f WHERE fp IS NOT NULL
      GROUP BY 1 HAVING count(*) > 1
      ORDER BY fp ASC NULLS FIRST"""))
      // fp IS NOT NULL: documents shorter than the shingle width have no
      // fingerprint; the Spark side (exploded shingles) never emits rows
      // for them, so the oracle must exclude them too.

  // --- E2e: winnowing fingerprint pairs (rolling-hash dedup) -------------
  // MOSS-style local fingerprints (TextOps.winnowFingerprints): pairs of
  // documents sharing >= 2 winnowed window-minima — catches shared RUNS
  // (quotation/plagiarism/boilerplate) that whole-document hashing (q16)
  // and global min-hash (q23) both miss. Candidates come from an fp
  // equi-join; no all-pairs product anywhere.
  private val q41 = Q(
    (spark, dir) => {
      val fps = TextOps.winnowFingerprints(docs(spark, dir), "doc_id", "text")
      fps.alias("a")
        .join(fps.alias("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
        .orderBy(col("a_id"), col("b_id"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE len(string_split(text, ' ')) >= 7),
      g AS (SELECT doc_id, list_transform(range(1, len(t) - 2), i ->
              md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS gr
            FROM d),
      f AS (SELECT doc_id, list_distinct(list_transform(range(1, len(gr) - 2), j ->
              list_min(gr[j:j+3]))) AS fps
            FROM g),
      x AS (SELECT doc_id, unnest(fps) AS fp FROM f),
      p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_shared
            FROM x a JOIN x b ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
      SELECT a_id, b_id, CAST(n_shared AS BIGINT) AS n_shared
      FROM p WHERE n_shared >= 2
      ORDER BY a_id ASC NULLS FIRST, b_id ASC NULLS FIRST"""))

  // --- E4e: token counting — whitespace, BPE-ish regex, and REAL BPE ----
  // Three token accountings per source: whitespace split, a regex
  // proxy, and true byte-pair-encoding symbols under the fixture merge
  // table (functions/Bpe + plans/BpeCountLong, VERDICT r6 wishlist #1).
  // The BPE path is the 100 TB shape: the codegen'd encoder runs over
  // the DISTINCT vocabulary only, and corpus totals come from a
  // broadcast (word -> n_bpe) probe against per-(source, word) counts
  // — per-row cost at scale is a hash lookup, not an encode. The
  // oracle replays the merge table with a recursive CTE built from the
  // SAME Scala merge list (Bpe.oracleCte), so the two sides cannot
  // drift.
  private val TokenRe = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  private val q24 = Q(
    (spark, dir) => {
      // all three token accountings ride ONE map-side projection + ONE
      // aggregate: whitespace and regex counts are plain expressions,
      // and the BPE total is the document-level bpe_count_text native
      // expression (per-word encode amortized by the tokenizer-style
      // word memo in Bpe.count — the distinct-vocabulary dedup happens
      // in the memo instead of a broadcast join, saving the explode,
      // the distinct, and the join stages)
      docs(spark, dir)
        .select(col("source"),
          size(TextOps.tokens(col("text"))).as("ws"),
          size(regexp_extract_all(col("text"), lit(TokenRe), lit(0))).as("re"),
          functions.Bpe.countTextCol(col("text")).as("nb"))
        .groupBy(col("source"))
        .agg(sum(col("ws")).as("ws_tokens"), sum(col("re")).as("re_tokens"),
          sum(col("nb")).as("bpe_tokens"))
        .orderBy(col("source"))
    },
    Some(s"""
      WITH RECURSIVE words AS (
        SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
      ${functions.Bpe.oracleCte("words")},
      wc AS (SELECT source, w, count(*) AS c FROM words GROUP BY 1, 2),
      b AS (SELECT source, CAST(sum(c * n_bpe) AS BIGINT) AS bpe_tokens
            FROM wc JOIN bpe USING (w) GROUP BY 1),
      base AS (
        SELECT source,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
               CAST(sum(len(regexp_extract_all(text, '$TokenRe'))) AS BIGINT) AS re_tokens
        FROM documents GROUP BY 1)
      SELECT base.source, ws_tokens, re_tokens, bpe_tokens
      FROM base JOIN b ON base.source = b.source
      ORDER BY base.source ASC NULLS FIRST"""))

  // --- E4f: TF-IDF keyword extraction ------------------------------------
  // Top-3 most characteristic terms per document (doc_id < 10). The
  // score is the rational surrogate tf * N / df — exact integers and ONE
  // float division, so Spark and DuckDB agree bit-for-bit (a log-based
  // idf would hit libm rounding differences between engines; the ranking
  // is order-isomorphic for fixed tf since x -> ln(x) is monotonic).
  private val q34 = Q(
    (spark, dir) => {
      val tok = docs(spark, dir)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = docs(spark, dir).agg(count(lit(1)).as("n_total"))
      val scored = tf.filter(col("doc_id") < 10)
        .join(broadcast(dfreq), Seq("term"))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"),
          ((col("tf") * col("n_total")).cast("double") / col("df")).as("tfidf"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc_nulls_last, col("term").asc_nulls_first)
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("doc_id"), col("term"), col("tfidf"))
        .orderBy(col("doc_id"), col("tfidf").desc_nulls_last, col("term"))
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT count(*) AS n_total FROM documents),
      scored AS (
        SELECT doc_id, tf.term,
               CAST(tf * n_total AS DOUBLE) / df AS tfidf
        FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
        WHERE doc_id < 10),
      r AS (
        SELECT doc_id, term, tfidf, row_number() OVER (PARTITION BY doc_id
                 ORDER BY tfidf DESC NULLS LAST, term ASC NULLS FIRST) AS rn
        FROM scored)
      SELECT doc_id, term, tfidf FROM r WHERE rn <= 3
      ORDER BY doc_id ASC NULLS FIRST, tfidf DESC NULLS LAST, term ASC NULLS FIRST"""))

  // --- E4g: document chunking (32-token windows, 16-token stride) --------
  private val q38 = Q(
    (spark, dir) => {
      TextOps.chunked(docs(spark, dir), "doc_id", "text", chunkSize = 32, stride = 16)
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          md5(col("chunk")).as("chunk_md5"), col("n_tokens"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },
    Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') t FROM documents),
      c AS (
        SELECT doc_id,
               unnest(range(greatest(CAST(ceil((len(t) - 32) / 16.0) AS INT) + 1, 1)))
                 AS chunk_idx,
               t
        FROM d)
      SELECT doc_id, chunk_idx,
             md5(array_to_string(t[chunk_idx * 16 + 1 : chunk_idx * 16 + 32], ' '))
               AS chunk_md5,
             CAST(len(t[chunk_idx * 16 + 1 : chunk_idx * 16 + 32]) AS BIGINT) AS n_tokens
      FROM c
      WHERE len(t[chunk_idx * 16 + 1 : chunk_idx * 16 + 32]) > 0
      ORDER BY doc_id ASC NULLS FIRST, chunk_idx ASC NULLS FIRST"""))

  // --- E4f: eval-set decontamination (train/eval n-gram overlap) ---------
  // The step a training pipeline runs before the split ships: how much of
  // each training document is textually present in the eval set? Eval =
  // the deterministic doc_id % 10 == 0 slice (in production: the actual
  // benchmark corpus); contamination = fraction of a train doc's DISTINCT
  // 5-grams that occur anywhere in the eval set. The exact/near dupes
  // planted across sources surface as contamination 1.0 — precisely the
  // docs a decontamination pass must drop.
  //
  // Scale shape: the gram TEXT never shuffles — each gram is projected
  // map-side to a 120-bit md5-derived key (two longs, 16 bytes vs the
  // ~30-60-byte gram string; collision odds at even 10^15 grams are
  // ~1e-6, and a collision only over-counts one hit). One distinct on
  // (doc_id, h) then ONE hash-partitioned window over h marks grams
  // that appear anywhere in the eval slice — no join, no diamond, no
  // persist; the corpus text is scanned exactly once. The eval slice
  // here is a 10% doc_id carve-out, so it rides the same hash
  // partitioning as the train side (NOT a broadcast — that only
  // applies when the eval set is a real bounded benchmark corpus).
  /** Per-TRAIN-doc distinct-5-gram counts vs the eval slice: (doc_id,
    * n_grams, n_hits). The q45/q47 shared core — q45 reports the overlap,
    * q47 acts on it (removal). The implementation (and its scale-shape
    * notes) lives in [[graft.operators.Curation.contaminationCounts]],
    * the seam the curated-corpus write path shares. */
  private def trainEvalGramCounts(spark: SparkSession, dir: String): DataFrame =
    operators.Curation.contaminationCounts(docs(spark, dir))

  // Oracle twin of [[trainEvalGramCounts]]: same distinct-gram-hash +
  // windowed eval-presence + per-train-doc counts, shared by q45/q47 so
  // the two oracles cannot drift.
  private val gramCountSqlCte =
    """g AS (
        SELECT DISTINCT doc_id, md5(s) AS h FROM (
          SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 3),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                      || ' ' || t[i+4]))) AS s
          FROM (SELECT doc_id, string_split(text, ' ') t FROM documents))),
      hw AS (
        SELECT doc_id,
               max(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY h) AS hit
        FROM g),
      c AS (
        SELECT doc_id, count(*) AS n_grams, CAST(sum(hit) AS BIGINT) AS n_hits
        FROM hw WHERE doc_id % 10 <> 0 GROUP BY 1)"""

  private val q45 = Q(
    (spark, dir) => {
      trainEvalGramCounts(spark, dir)
        .filter(col("n_hits") > 0)
        .select(col("doc_id"), col("n_grams"), col("n_hits"),
          (col("n_hits").cast("double") / col("n_grams")).as("contamination"))
        .orderBy(col("contamination").desc_nulls_last, col("doc_id"))
    },
    Some(s"""
      WITH $gramCountSqlCte
      SELECT doc_id, n_grams, n_hits,
             CAST(n_hits AS DOUBLE) / n_grams AS contamination
      FROM c WHERE n_hits > 0
      ORDER BY contamination DESC NULLS LAST, doc_id ASC NULLS FIRST"""))

  // --- E4g: repetition ratio (gopher-style quality signal) ---------------
  // Max bigram frequency over total bigrams per document — the "most
  // repeated n-gram fraction" filter from published data-quality
  // pipelines (high ratio = boilerplate/template text). Multiplicity
  // matters, so this uses the RAW exploded bigrams (no distinct); one
  // count agg per (doc, gram) then a per-doc sum/max — two map-side
  // combinable aggs, no joins at all.
  private val q46 = Q(
    (spark, dir) => {
      val perGram = TextOps.explodedShingles(docs(spark, dir), "doc_id", "text", 2)
        .groupBy(col("doc_id"), col("s")).agg(count(lit(1)).as("c"))
      perGram.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("max_rep"))
        .select(col("doc_id"), col("n_bigrams"), col("max_rep"),
          (col("max_rep").cast("double") / col("n_bigrams")).as("rep_ratio"))
        .orderBy(col("rep_ratio").desc_nulls_last, col("doc_id"))
        .limit(20)
    },
    Some("""
      WITH b AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
                   i -> t[i] || ' ' || t[i+1])) AS s
                 FROM (SELECT doc_id, string_split(text, ' ') t FROM documents)),
      c AS (SELECT doc_id, s, count(*) AS c FROM b GROUP BY 1, 2),
      r AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                   CAST(max(c) AS BIGINT) AS max_rep
            FROM c GROUP BY 1)
      SELECT doc_id, n_bigrams, max_rep,
             CAST(max_rep AS DOUBLE) / n_bigrams AS rep_ratio
      FROM r ORDER BY rep_ratio DESC NULLS LAST, doc_id ASC NULLS FIRST
      LIMIT 20"""))

  // --- E4h: contamination REMOVAL (q45 acted on) --------------------------
  // The step after measuring contamination: DROP every train document
  // whose eval overlap crosses the threshold and account for it per
  // source. Threshold = half the doc's distinct 5-grams, compared in
  // integer space (2*n_hits >= n_grams) so no float crosses an engine
  // boundary. Train docs too short to produce a 5-gram have no counts
  // row and are kept (nothing measurable overlaps).
  //
  // Scale shape: q45's gram window + ONE left join keyed on doc_id
  // (the drop set is tiny — contaminated docs — so AQE broadcasts it)
  // and a per-source agg. No new corpus-wide shuffle.
  private val q47 = Q(
    (spark, dir) => {
      val dropIds = operators.Curation.contaminationDropIds(docs(spark, dir))
        .withColumn("__drop", lit(1))
      docs(spark, dir).filter(col("doc_id") % 10 =!= 0)
        .join(dropIds, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_train"), count(col("__drop")).as("n_dropped"))
        .select(col("source"), col("n_train"), col("n_dropped"),
          (col("n_train") - col("n_dropped")).as("n_kept"))
        .orderBy(col("source"))
    },
    Some(s"""
      WITH $gramCountSqlCte,
      dr AS (SELECT doc_id FROM c WHERE n_hits * 2 >= n_grams)
      SELECT d.source, count(*) AS n_train,
             count(dr.doc_id) AS n_dropped,
             count(*) - count(dr.doc_id) AS n_kept
      FROM documents d LEFT JOIN dr ON d.doc_id = dr.doc_id
      WHERE d.doc_id % 10 <> 0
      GROUP BY 1 ORDER BY d.source ASC NULLS FIRST"""))

  // --- E4i: quality-filter funnel (C4/Gopher-style cascade) ---------------
  // The per-source accounting a curation pipeline publishes with every
  // dataset release: documents surviving each filter stage, applied in
  // order — (1) token-count bounds [20, 90], (2) repetition cap
  // rep_ratio <= 0.08 (as 25*max_rep <= 2*n_bigrams — exact integers),
  // (3) stopword-ratio floor >= 0.02 (as 50*n_stop >= n_tokens).
  // Thresholds sit at the measured p90 tails of this corpus so each
  // stage does visible work.
  //
  // Scale shape: the per-doc flags are one map-side pass over text plus
  // the q46 bigram agg (both hash-partitioned by doc_id, joined on that
  // key), then ONE tiny per-source agg. Conditional sums, no windows.
  private val q48 = Q(
    (spark, dir) => {
      // Flag computation lives in operators/Curation (the single source
      // of truth shared with streaming/CurationStream)
      val flags = operators.Curation.funnelFlags(docs(spark, dir))
      flags.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("p_len"), 1L).otherwise(0L)).as("after_len"),
        sum(when(col("p_len") && col("p_rep"), 1L).otherwise(0L)).as("after_rep"),
        sum(when(col("p_len") && col("p_rep") && col("p_stop"), 1L)
          .otherwise(0L)).as("after_stop"))
        .orderBy(col("source"))
    },
    Some(s"""
      WITH b AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
                   i -> t[i] || ' ' || t[i+1])) AS s
                 FROM (SELECT doc_id, string_split(text, ' ') t FROM documents)),
      cg AS (SELECT doc_id, s, count(*) AS c FROM b GROUP BY 1, 2),
      rep AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nb,
                     CAST(max(c) AS BIGINT) AS mr
              FROM cg GROUP BY 1),
      st AS (SELECT doc_id, source,
                    CAST(len(t) AS BIGINT) AS nt,
                    CAST(len(list_filter(t, x -> list_contains(
                      [${Stopwords.map("'" + _ + "'").mkString(",")}], x)))
                      AS BIGINT) AS nstop
             FROM (SELECT doc_id, source, string_split(text, ' ') t
                   FROM documents)),
      f AS (SELECT st.source,
                   (nt >= 20 AND nt <= 90) AS p_len,
                   (coalesce(mr, 0) * 25 <= coalesce(nb, 0) * 2) AS p_rep,
                   (nstop * 50 >= nt) AS p_stop
            FROM st LEFT JOIN rep ON st.doc_id = rep.doc_id)
      SELECT source, count(*) AS n_docs,
             CAST(sum(CASE WHEN p_len THEN 1 ELSE 0 END) AS BIGINT) AS after_len,
             CAST(sum(CASE WHEN p_len AND p_rep THEN 1 ELSE 0 END) AS BIGINT)
               AS after_rep,
             CAST(sum(CASE WHEN p_len AND p_rep AND p_stop THEN 1 ELSE 0 END)
               AS BIGINT) AS after_stop
      FROM f GROUP BY 1 ORDER BY source ASC NULLS FIRST"""))

  // --- E4j: domain-mixture resampling ------------------------------------
  // Data mixing: each source gets a target sampling rate (the mixture
  // config; here a pure function of the source index — in production a
  // tiny broadcast table) and every document keeps/drops by a salted
  // md5 bucket of its doc_id. Deterministic on any cluster, any
  // partitioning, any rerun — the same property q44's split relies on —
  // so a resampled corpus is reproducible bit-for-bit. Output: per-source
  // target rate vs achieved counts.
  //
  // Scale shape: one map-side pass (hash + compare), one tiny agg. The
  // filter itself never shuffles — at 100 TB this is a scan-speed op.
  private val q49 = Q(
    (spark, dir) => {
      // Rate and keep rules live in operators/Curation (shared with
      // streaming/CurationStream)
      docs(spark, dir)
        .select(col("source"),
          operators.Curation.ratePermille(col("source")).as("rate_permille"),
          when(operators.Curation.mixtureKeep(col("doc_id"), col("source")), 1L)
            .otherwise(0L).as("__keep"))
        .groupBy(col("source"), col("rate_permille"))
        .agg(count(lit(1)).as("n_docs"), sum(col("__keep")).as("n_sampled"))
        .select(col("source"), col("rate_permille"), col("n_docs"),
          col("n_sampled"),
          (col("n_sampled").cast("double") / col("n_docs")).as("effective_rate"))
        .orderBy(col("source"))
    },
    Some("""
      WITH b AS (
        SELECT source,
               CASE TRY_CAST(regexp_replace(source, '[^0-9]', '', 'g') AS INT) % 4
                 WHEN 0 THEN 1000 WHEN 1 THEN 500 WHEN 2 THEN 250
                 ELSE 750 END AS rate_permille,
               CAST(('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 7))
                 AS BIGINT) % 1000 AS bkt
        FROM documents)
      SELECT source, CAST(rate_permille AS BIGINT) AS rate_permille,
             count(*) AS n_docs,
             CAST(sum(CASE WHEN bkt < rate_permille THEN 1 ELSE 0 END)
               AS BIGINT) AS n_sampled,
             CAST(sum(CASE WHEN bkt < rate_permille THEN 1 ELSE 0 END)
               AS DOUBLE) / count(*) AS effective_rate
      FROM b GROUP BY 1, 2 ORDER BY source ASC NULLS FIRST"""))

  // --- E4k: passage-level exact dedup (sub-document granularity) ---------
  // Whole-document hashing (q16) misses boilerplate and quoted passages
  // repeated ACROSS otherwise-distinct documents — the dedup granularity
  // "Deduplicating Training Data Makes Language Models Better" (Lee et
  // al., ACL'22) showed matters most. Split every doc into
  // NON-overlapping 16-token passages (chunked with stride = size), hash
  // each, and call a passage duplicated when its exact text appears in
  // >= 2 distinct documents. Per-source accounting: passages, duplicated
  // passages, duplicated fraction.
  //
  // Scale shape: the chunk explode is map-side (source carried through,
  // no re-join against the corpus); one hash-agg by passage hash counts
  // distinct docs; the chunk rows join that agg on the SAME hash key
  // (co-partitioned exchange) and fold into a tiny per-source agg. The
  // corpus-wide shuffle moves only (hash, doc_id, source) triples —
  // never document text.
  private val q50 = Q(
    (spark, dir) => {
      val ch = TextOps.chunked(docs(spark, dir), "doc_id", "text",
          chunkSize = 16, stride = 16, carry = Seq("source"))
        .select(col("doc_id"), col("source"), md5(col("chunk")).as("h"))
      val freq = ch.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("nd"))
      ch.join(freq, Seq("h"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_passages"),
          sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup_passages"))
        .select(col("source"), col("n_passages"), col("n_dup_passages"),
          (col("n_dup_passages").cast("double") / col("n_passages"))
            .as("dup_fraction"))
        .orderBy(col("source"))
    },
    Some("""
      WITH d AS (SELECT doc_id, source, string_split(text, ' ') t FROM documents),
      c AS (
        SELECT doc_id, source,
               unnest(range(greatest(CAST(ceil((len(t) - 16) / 16.0) AS INT) + 1, 1)))
                 AS chunk_idx,
               t
        FROM d),
      p AS (
        SELECT doc_id, source,
               md5(array_to_string(t[chunk_idx * 16 + 1 : chunk_idx * 16 + 16], ' '))
                 AS h
        FROM c
        WHERE len(t[chunk_idx * 16 + 1 : chunk_idx * 16 + 16]) > 0),
      f AS (SELECT h, count(DISTINCT doc_id) AS nd FROM p GROUP BY 1)
      SELECT p.source, count(*) AS n_passages,
             CAST(sum(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_passages,
             CAST(sum(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*) AS dup_fraction
      FROM p JOIN f USING (h)
      GROUP BY 1 ORDER BY p.source ASC NULLS FIRST"""))

  // --- E4l: cross-source duplicate-content matrix -------------------------
  // Which source pairs ship the same exact bytes? The mixture-design
  // companion to q16: per (source_a < source_b) pair, how many distinct
  // content hashes appear in BOTH. Drives dedup priority ("these two
  // crawls overlap heavily") and guards double-counting in q49's
  // mixture rates.
  //
  // Scale shape: distinct (hash, source) first — at most n_sources rows
  // per hash survive, so the self-join on hash fans out at most
  // n_sources² per hash (bounded by the catalog, not the corpus). Both
  // join sides share one shuffle key; output is a tiny pair matrix.
  private val q51 = Q(
    (spark, dir) => {
      val d = docs(spark, dir)
        .select(md5(col("text")).as("h"), col("source")).distinct()
      d.select(col("h"), col("source").as("src_a"))
        .join(d.select(col("h"), col("source").as("src_b")), Seq("h"))
        .filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_shared"))
        .orderBy(col("src_a"), col("src_b"))
    },
    Some("""
      WITH d AS (SELECT DISTINCT md5(text) AS h, source FROM documents)
      SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
      FROM d a JOIN d b ON a.h = b.h AND a.source < b.source
      GROUP BY 1, 2
      ORDER BY src_a ASC NULLS FIRST, src_b ASC NULLS FIRST"""))

  // --- E4m: training-sequence packing accounting --------------------------
  // The last prep step before text ships to a trainer: concatenate
  // documents and cut the stream into fixed context-window sequences
  // ("concat-then-chunk" packing, the standard pretraining recipe —
  // documents crossing a boundary are split, nothing is padded). The
  // packing key is (source, shard) with shard = doc_id % 8: the ordered
  // cumulative token sum runs per shard, NOT corpus-global — a single
  // unpartitioned window would funnel 100 TB through one partition (the
  // q40-era WindowExec hazard); sharding keeps every window partition
  // bounded while the assignment stays a pure function of (doc_id,
  // n_tokens), deterministic on any cluster. In production the shard
  // count scales with the corpus (it only changes which docs share a
  // boundary). Output per source: docs, tokens, sequences (per-shard
  // ceil), boundary-split docs, packing efficiency (token fill of the
  // allocated sequence slots; no padding waste is hidden because the
  // tail sequence of each shard is counted as a full slot).
  private val q56 = Q(
    (spark, dir) => {
      val B = 256L // context window: BPE tokens per packed sequence
      val S = 8L   // packing shards per source
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"), col("shard")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      // re-grounded on REAL BPE tokens (round 7): packing budgets are
      // tokenizer budgets — n_tokens comes from the document-level
      // bpe_count_text native expression: ONE compiled call per doc
      // (split + memoized per-word encode + sum), the same stage shape
      // as a whitespace count. The distinct-vocabulary BROADCAST
      // alternative (q24) pays 4 extra stages, and a transform/
      // aggregate HOF pays lambda dispatch + boxing per token — both
      // measured slower here. Raw table, no spread gate: the window's
      // own (source, shard) exchange redistributes right after the
      // scan, so a pre-repartition would only add a stage.
      val t = Tables.documents(spark, dir)
        .select(col("source"), col("doc_id"),
          functions.Bpe.countTextCol(col("text")).as("n_tokens"))
        .withColumn("shard", pmod(col("doc_id"), lit(S)))
      val c = t.withColumn("cb", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .withColumn("seq_a", expr(s"cb div $B"))
        .withColumn("seq_b", expr(s"(cb + n_tokens - 1) div $B"))
      // ONE aggregation chain: shard-level rollup is CO-PARTITIONED
      // with the window (same (source, shard) clustering — no exchange
      // between them), then a source-level rollup. The former
      // two-branch form scanned + windowed the corpus twice and paid a
      // join to glue the branches back — 2x the stages for the same
      // numbers.
      c.groupBy(col("source"), col("shard"))
        .agg(count(lit(1)).as("nd"),
          sum(col("n_tokens")).as("st"),
          sum(when(col("seq_b") > col("seq_a"), 1L).otherwise(0L)).as("ns"))
        .groupBy(col("source"))
        .agg(sum(col("nd")).as("n_docs"),
          sum(col("st")).as("total_tokens"),
          sum(expr(s"(st + ${B - 1}) div $B")).as("n_seqs"),
          sum(col("ns")).as("n_split_docs"))
        .select(col("source"), col("n_docs"), col("total_tokens"),
          col("n_seqs"), col("n_split_docs"),
          (col("total_tokens").cast("double") / (col("n_seqs") * B))
            .as("pack_efficiency"))
        .orderBy(col("source"))
    },
    Some(s"""
      WITH RECURSIVE words AS (
        SELECT source, doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents),
      ${functions.Bpe.oracleCte("words")},
      t AS (
        SELECT source, doc_id, doc_id % 8 AS shard,
               CAST(sum(n_bpe) AS BIGINT) AS n_tokens
        FROM words JOIN bpe USING (w) GROUP BY 1, 2, 3),
      c AS (
        SELECT source, shard, n_tokens,
               coalesce(sum(n_tokens) OVER (PARTITION BY source, shard
                 ORDER BY doc_id ASC NULLS FIRST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        FROM t),
      s AS (
        SELECT source, shard, n_tokens, cb // 256 AS seq_a,
               (cb + n_tokens - 1) // 256 AS seq_b
        FROM c),
      sq AS (SELECT source, shard, sum(n_tokens) AS st FROM s GROUP BY 1, 2),
      a1 AS (SELECT source, CAST(sum((st + 255) // 256) AS BIGINT) AS n_seqs,
                    CAST(sum(st) AS BIGINT) AS total_tokens
             FROM sq GROUP BY 1),
      a2 AS (SELECT source, count(*) AS n_docs,
                    CAST(sum(CASE WHEN seq_b > seq_a THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_split_docs
             FROM s GROUP BY 1)
      SELECT a1.source, n_docs, total_tokens, n_seqs, n_split_docs,
             CAST(total_tokens AS DOUBLE) / (n_seqs * 256) AS pack_efficiency
      FROM a1 JOIN a2 ON a1.source = a2.source
      ORDER BY a1.source ASC NULLS FIRST"""))

  // --- E4j: KMV distinct-vocabulary sketch per source --------------------
  // Exact COUNT(DISTINCT token) at 100 TB shuffles the entire distinct
  // (source, token) set — the distinct set IS the shuffle. The KMV
  // bottom-k sketch (plans/KmvSketchLong, a TypedImperativeAggregate)
  // carries at most k=256 longs per group per task, combines map-side,
  // and estimates distinct as (k-1)/normalized(kth) with ±1/√k ≈ 6%
  // error. Deterministic: "k smallest distinct md5-derived hashes" is a
  // pure function of the input SET, so any partitioning and any merge
  // order — and the DuckDB oracle's sort — produce identical bits.
  // n_tokens rides along to show sketch vs corpus size (6 orders of
  // magnitude apart at 100 TB).
  private val KmvK = 256

  /** Per-source KMV vocabulary sketch + token count — the q58/q61
    * shared core (single-sketch discipline: the overlap matrix reads
    * the SAME sketch the vocabulary estimate reports), built on the
    * one [[graft.operators.Kmv]] algebra every sketch consumer shares. */
  private def sourceVocabSketch(spark: SparkSession, dir: String): DataFrame =
    operators.Kmv.sourceVocabSketch(docs(spark, dir), KmvK)

  private val q58 = Q(
    (spark, dir) => {
      sourceVocabSketch(spark, dir)
        .select(col("source"), col("n_tokens"),
          size(col("kmv")).cast("long").as("kmv_n"),
          element_at(col("kmv"), -1).as("kmv_kth"),
          operators.Kmv.estimate(col("kmv"), KmvK).as("est_distinct"))
        .orderBy(col("source"))
    },
    Some(s"""
      WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS term FROM documents),
      cnt AS (SELECT source, count(*) AS n_tokens FROM tok GROUP BY 1),
      h AS (SELECT DISTINCT source,
                   CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) AS hv
            FROM tok),
      r AS (SELECT source, hv,
                   row_number() OVER (PARTITION BY source ORDER BY hv ASC) AS rn
            FROM h),
      kv AS (SELECT source, count(*) AS kmv_n, max(hv) AS kmv_kth
             FROM r WHERE rn <= $KmvK GROUP BY 1)
      SELECT c.source, c.n_tokens, kv.kmv_n, kv.kmv_kth,
             CASE WHEN kv.kmv_n < $KmvK THEN CAST(kv.kmv_n AS DOUBLE)
                  ELSE ${KmvK - 1}.0 * 1152921504606846976.0
                       / CAST(kv.kmv_kth AS DOUBLE) END AS est_distinct
      FROM cnt c JOIN kv USING (source)
      ORDER BY source ASC NULLS FIRST"""))

  // --- E4k: cross-source vocabulary overlap — from the sketches alone ----
  // The KMV set-operation estimator (Beyer et al., SIGMOD '07): for two
  // sources, the bottom-k of the UNION is computable from the two
  // bottom-k sketches (merge + trim), Jaccard ≈ |M ∩ A ∩ B| / |M|, and
  // overlap ≈ Jaccard × union-estimate. The exact version of this
  // matrix (q51 for duplicate content) costs a corpus-wide shuffle PER
  // CELL at 100 TB; this one reads 256 longs per source — the pair
  // join is source-catalog², never corpus-sized, and the corpus is
  // scanned exactly once to build the sketches. Single-sketch
  // discipline: q61 consumes the SAME sourceVocabSketch q58 reports,
  // so the matrix can never drift from the per-source estimates.
  private val q61 = Q(
    (spark, dir) => {
      // materialize the (tiny — one row per source) sketch ONCE before
      // the self-join: both pair sides would otherwise re-run the
      // corpus-wide sketch aggregate (the GraphOps materialize-once rule)
      val sk = sourceVocabSketch(spark, dir).select(col("source"), col("kmv"))
        .localCheckpoint()
      val a = sk.select(col("source").as("source_a"), col("kmv").as("ka"))
      val b = sk.select(col("source").as("source_b"), col("kmv").as("kb"))
      val m = operators.Kmv.mergeArrays(col("ka"), col("kb"), KmvK)
      a.join(b, col("source_a") < col("source_b"))
        .select(col("source_a"), col("source_b"),
          m.as("m"),
          size(array_intersect(array_intersect(m, col("ka")), col("kb")))
            .cast("long").as("inter_n"))
        .select(col("source_a"), col("source_b"), col("inter_n"),
          (col("inter_n").cast("double") / size(col("m"))).as("est_jaccard"),
          operators.Kmv.estimate(col("m"), KmvK).as("est_union"))
        .select(col("source_a"), col("source_b"), col("inter_n"),
          col("est_jaccard"), col("est_union"),
          (col("est_jaccard") * col("est_union")).as("est_overlap"))
        .orderBy(col("source_a"), col("source_b"))
    },
    Some(s"""
      WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS term FROM documents),
      h AS (SELECT DISTINCT source,
                   CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) AS hv
            FROM tok),
      r AS (SELECT source, hv,
                   row_number() OVER (PARTITION BY source ORDER BY hv ASC) AS rn
            FROM h),
      b AS (SELECT source, list(hv ORDER BY hv ASC) AS kmv
            FROM r WHERE rn <= $KmvK GROUP BY 1),
      p AS (SELECT x.source AS source_a, y.source AS source_b,
                   x.kmv AS ka, y.kmv AS kb,
                   list_sort(list_distinct(list_concat(x.kmv, y.kmv)))[1:$KmvK] AS m
            FROM b x JOIN b y ON x.source < y.source),
      s AS (SELECT source_a, source_b, m,
                   CAST(len(list_intersect(list_intersect(m, ka), kb)) AS BIGINT)
                     AS inter_n
            FROM p)
      SELECT source_a, source_b, inter_n,
             CAST(inter_n AS DOUBLE) / len(m) AS est_jaccard,
             CASE WHEN len(m) < $KmvK THEN CAST(len(m) AS DOUBLE)
                  ELSE ${KmvK - 1}.0 * 1152921504606846976.0
                       / CAST(m[-1] AS DOUBLE) END AS est_union,
             (CAST(inter_n AS DOUBLE) / len(m)) *
             (CASE WHEN len(m) < $KmvK THEN CAST(len(m) AS DOUBLE)
                   ELSE ${KmvK - 1}.0 * 1152921504606846976.0
                        / CAST(m[-1] AS DOUBLE) END) AS est_overlap
      FROM s
      ORDER BY source_a ASC NULLS FIRST, source_b ASC NULLS FIRST"""))

  // --- E4: PII scrubbing (functions/Redact) ------------------------------
  // Deterministic PII is injected per document (every 5th gets an
  // email, every 7th a phone, both derived from doc_id), then
  // functions/Redact scrubs it back out with RE2-safe patterns that the
  // oracle replays VERBATIM in DuckDB — counts AND the redacted text
  // length hash-match, so the replacement itself (not just detection)
  // is proven identical cross-engine. Scale shape: one codegen'd map
  // pass (regexp_count/regexp_replace built-ins), then a catalog-sized
  // rollup; nothing shuffles but the per-source partials.
  private val q71 = Q(
    (spark, dir) => {
      val injected = Tables.documents(spark, dir)
        .select(col("source"), col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 5 === 0,
              concat(lit(" contact user"), col("doc_id").cast("string"),
                lit("@example.com"))).otherwise(lit("")),
            when(col("doc_id") % 7 === 0,
              concat(lit(" call +55 11 9"),
                lpad((col("doc_id") * 37 % 10000).cast("string"), 4, "0"),
                lit("-"),
                lpad((col("doc_id") * 91 % 10000).cast("string"), 4, "0")))
              .otherwise(lit(""))).as("text2"))
      injected
        .select(col("source"),
          graft.functions.Redact.emailCount(col("text2")).as("emails"),
          graft.functions.Redact.phoneCount(col("text2")).as("phones"),
          length(graft.functions.Redact.scrub(col("text2"))).cast("long")
            .as("redacted_len"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("emails") + col("phones") > 0, 1L).otherwise(0L))
            .as("docs_with_pii"),
          sum(col("emails")).as("emails_redacted"),
          sum(col("phones")).as("phones_redacted"),
          sum(col("redacted_len")).as("total_redacted_chars"))
        .orderBy(col("source"))
    },
    Some("""
      WITH t AS (
        SELECT source,
               text
               || CASE WHEN doc_id % 5 = 0
                       THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                       ELSE '' END
               || CASE WHEN doc_id % 7 = 0
                       THEN ' call +55 11 9' || lpad(CAST(doc_id * 37 % 10000 AS VARCHAR), 4, '0')
                            || '-' || lpad(CAST(doc_id * 91 % 10000 AS VARCHAR), 4, '0')
                       ELSE '' END AS text2
        FROM documents),
      m AS (
        SELECT source,
               len(regexp_extract_all(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS emails,
               len(regexp_extract_all(text2, '\+[0-9]{2} [0-9]{2} [0-9]{5}-[0-9]{4}')) AS phones,
               length(regexp_replace(regexp_replace(text2,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                 '\+[0-9]{2} [0-9]{2} [0-9]{5}-[0-9]{4}', '[PHONE]', 'g')) AS redacted_len
        FROM t)
      SELECT source, count(*) AS n_docs,
             CAST(sum(CASE WHEN emails + phones > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
             CAST(sum(emails) AS BIGINT) AS emails_redacted,
             CAST(sum(phones) AS BIGINT) AS phones_redacted,
             CAST(sum(redacted_len) AS BIGINT) AS total_redacted_chars
      FROM m GROUP BY 1 ORDER BY source ASC NULLS FIRST"""))

  // --- E4: count-min frequency sketch vs exact counts --------------------
  // The frequency member of the sketch tier (KMV = distinct, q66 =
  // quantiles): the global top-20 exact token counts side by side with
  // the CMS estimate from d×w = 4×1024 bounded counters. The oracle
  // replays the identical md5-derived buckets and min-of-rows
  // estimate, so the sketch math is hash-checked cross-engine; the
  // one-sided guarantee (est_n >= freq, CmsSpec proves it for EVERY
  // token) is visible in the output. Scale shape: the counter table is
  // kilobytes regardless of corpus; the estimate join broadcasts the
  // sketch — the exact side exists here only as the evaluation
  // baseline (it is the corpus-sized groupBy the sketch replaces).
  // The token explode feeds both the sketch build and the exact
  // baseline UNPERSISTED on purpose: caching exploded string rows was
  // measured and REVERTED in round 4 (q17/q39/q43, docs/SCALING.md) —
  // re-running a codegen'd explode is cheaper than columnar-caching
  // its output; persist pays on wide/expensive subtrees only.
  private val q72 = Q(
    (spark, dir) => {
      val toks = docs(spark, dir)
        .select(explode(TextOps.tokens(col("text"))).as("term"))
      val cms = operators.Cms.build(toks, "term")
      val top = toks.groupBy(col("term")).agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc_nulls_last, col("term")).limit(20)
      operators.Cms.estimate(cms, top, "term")
        .select(col("term"), col("freq"), col("est_n"))
        .orderBy(col("freq").desc_nulls_last, col("term"))
    },
    Some("""
      WITH toks AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
      b AS (
        SELECT term, j.j,
               CAST(('0x' || substr(md5(CAST(j.j AS VARCHAR) || '|' || term), 1, 15)) AS BIGINT)
                 % 1024 AS bucket
        FROM toks CROSS JOIN (SELECT unnest(range(4)) AS j) j),
      cms AS (SELECT j, bucket, count(*) AS n FROM b GROUP BY 1, 2),
      top AS (
        SELECT term, count(*) AS freq FROM toks
        GROUP BY 1 ORDER BY freq DESC NULLS LAST, term ASC NULLS FIRST LIMIT 20),
      tb AS (
        SELECT t.term, t.freq, j.j,
               CAST(('0x' || substr(md5(CAST(j.j AS VARCHAR) || '|' || t.term), 1, 15)) AS BIGINT)
                 % 1024 AS bucket
        FROM top t CROSS JOIN (SELECT unnest(range(4)) AS j) j)
      SELECT tb.term, tb.freq, CAST(min(COALESCE(cms.n, 0)) AS BIGINT) AS est_n
      FROM tb LEFT JOIN cms ON cms.j = tb.j AND cms.bucket = tb.bucket
      GROUP BY 1, 2
      ORDER BY freq DESC NULLS LAST, term ASC NULLS FIRST"""))

  // --- E4t: Bloom-sketch decontamination vs corpus history --------------
  // Exact-dedup an INCOMING batch (doc_id % 3 == 0 plays the new
  // deliveries) against the HISTORY (the even doc_ids — the two splits
  // OVERLAP on doc_id % 6 == 0, so both the no-false-negative branch
  // and the FP branch are exercised and measured) without
  // joining the history: history is folded once into a 32-word
  // relational Bloom sketch (operators/Bloom — order-free bit_or words,
  // md5-derived bits, so the sketch is bit-identical on any layout or
  // engine) and the batch probes it via a words-sized broadcast.
  // Per source: probe count, bloom maybe-count, exact-match truth count
  // (the hash60 history join — HERE ONLY to measure the FP rate; at
  // 100 TB you keep the sketch and skip this join, that's the point),
  // and the measured false positives n_fp = n_maybe - n_true (>= 0:
  // Bloom has no false negatives).
  //
  // 100 TB posture: build is one map-side-combinable bit_or agg whose
  // exchange is <= words rows per task; probe is a map pass + 2
  // broadcast joins of a 32-row table. Nothing corpus-sized shuffles.
  private val BloomWords = 32
  private val q82 = Q(
    (spark, dir) => {
      // raw table, no spread gate: both branches reduce immediately
      // into sketch-sized aggregates (bloom array, distinct h60), so a
      // pre-repartition of the text bodies costs an exchange and buys
      // no parallel CPU worth having
      val d = Tables.documents(spark, dir)
      val hist = d.filter(col("doc_id") % 2 === 0)
      val inc = d.filter(col("doc_id") % 3 === 0)
      val bloom = Bloom.build(hist.select(col("text")), "text", BloomWords)
      val probed = Bloom.probe(
        inc.select(col("doc_id"), col("source"), col("text")),
        bloom, "text", BloomWords, "maybe_dup")
      val histH = hist.select(Kmv.hash60(col("text")).as("h60")).distinct()
        .withColumn("__hit", lit(1L))
      probed
        .withColumn("h60", Kmv.hash60(col("text")))
        .join(histH, Seq("h60"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_in"),
          sum(when(col("maybe_dup"), 1L).otherwise(0L)).as("n_maybe"),
          sum(coalesce(col("__hit"), lit(0L))).as("n_true"))
        .select(col("source"), col("n_in"), col("n_maybe"), col("n_true"),
          (col("n_maybe") - col("n_true")).as("n_fp"))
        .orderBy(col("source"))
    },
    Some {
      val m = BloomWords * Bloom.BitsPerWord
      def h60(prefix: String) =
        s"CAST(('0x' || substr(md5('$prefix' || text), 1, 15)) AS BIGINT)"
      def mask(bp: String) = s"(CAST(1 AS BIGINT) << CAST(($bp) % 60 AS INT))"
      s"""
      WITH hist AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
      inc AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 3 = 0),
      hp AS (
        SELECT ${h60("bloom0|")} % $m AS bp FROM hist
        UNION ALL
        SELECT ${h60("bloom1|")} % $m AS bp FROM hist),
      bloom AS (SELECT bp // 60 AS word, bit_or(${mask("bp")}) AS bits
                FROM hp GROUP BY 1),
      ht AS (SELECT DISTINCT ${h60("")} AS h FROM hist),
      pr AS (
        SELECT doc_id, source,
               ${h60("bloom0|")} % $m AS bp0,
               ${h60("bloom1|")} % $m AS bp1,
               ${h60("")} AS h
        FROM inc),
      fl AS (
        SELECT pr.doc_id, pr.source,
               CASE WHEN b0.bits IS NOT NULL AND b1.bits IS NOT NULL
                     AND (b0.bits & ${mask("pr.bp0")}) = ${mask("pr.bp0")}
                     AND (b1.bits & ${mask("pr.bp1")}) = ${mask("pr.bp1")}
                    THEN 1 ELSE 0 END AS maybe,
               CASE WHEN ht.h IS NOT NULL THEN 1 ELSE 0 END AS hit
        FROM pr LEFT JOIN bloom b0 ON b0.word = pr.bp0 // 60
                LEFT JOIN bloom b1 ON b1.word = pr.bp1 // 60
                LEFT JOIN ht ON ht.h = pr.h)
      SELECT source, count(*) AS n_in,
             CAST(sum(maybe) AS BIGINT) AS n_maybe,
             CAST(sum(hit) AS BIGINT) AS n_true,
             CAST(sum(maybe) - sum(hit) AS BIGINT) AS n_fp
      FROM fl GROUP BY 1
      ORDER BY source ASC NULLS FIRST"""
    })

  // --- E4: cross-document duplicated n-gram coverage ---------------------
  // The corpus-health metric behind substring-level dedup decisions
  // (the published "what fraction of a crawl is boilerplate" measure):
  // per source, the share of per-doc DISTINCT 5-grams that occur in
  // MORE THAN ONE document, plus how many docs are mostly (>50%)
  // duplicated material. Complements q16/q17 (which find and remove
  // duplicates) by quantifying how much duplicated TEXT remains.
  //
  // Scale shape (round-7 rewrite, VERDICT r6 #5): grams are per-doc
  // array_distinct'ed MAP-SIDE and leave the scan as 60-bit md5-derived
  // longs (never gram strings). Most grams are singletons (~90% at
  // sf0.1), so the heavy (g, doc_id, source) exchange is PREFILTERED:
  //  - pass 1 folds bare gram longs through a map-side-combinable
  //    count and builds a words-sized Bloom (operators/Bloom) over the
  //    grams seen in >= 2 docs — kilobytes on the wire;
  //  - pass 2 broadcast-probes the Bloom and only admitted grams reach
  //    the per-gram count window. No false negatives, so every truly
  //    duplicated gram keeps its exact count; Bloom false positives
  //    are singletons the window re-counts to 1 and discards —
  //    correctness is EXACT, the Bloom is purely a traffic shaper.
  //  - per-doc gram totals come map-side from the same scan (size of
  //    the distinct-gram array), never through the shuffle.
  private val DupCovN = 5
  private val DupCovBloomWords = 4096
  private val q90 = Q(
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = docs(spark, dir)
      val gramsArr = array_distinct(
        TextOps.gramHashes(TextOps.tokens(col("text")), DupCovN))
      // the gram stream is a DIAMOND (totals, dup-counts, probe all
      // consume it): the tokenize+md5 scan must run once. Round-7's
      // driver bench showed the exploded (doc_id, source, g) cache
      // degrading 15x under block-manager pressure, so the persisted
      // footprint is now the PER-DOC GRAM ARRAYS — one row per doc,
      // doc_id long + array<long>, no source strings, no per-gram row
      // overhead (~10x smaller cached). Eager count() materializes it
      // deterministically; the finally frees it before the query
      // returns (the 5-row result is checkpointed first), so no gram
      // blocks outlive the build.
      val ga = d.select(col("doc_id"), gramsArr.as("gs")).persist()
      ga.count()
      try {
        val g = ga.select(col("doc_id"), explode(col("gs")).as("g"))
        // per-doc totals come straight off the cached arrays — size(),
        // no explode, no exchange; docs with 0 grams are dropped
        // (the `per` semantics)
        val totals = ga.select(col("doc_id"), size(col("gs")).as("n_grams"))
          .filter(col("n_grams") > 0)
        val dup = g.groupBy(col("g")).agg(count(lit(1)).as("c"))
          .filter(col("c") > 1)
          .select(col("g").cast("string").as("k"))
        // eager localCheckpoint: the K broadcast probes each re-plan the
        // build subtree — cutting lineage at the words-sized sketch makes
        // them reuse one tiny materialization instead
        val bloom = Bloom.build(dup, "k", DupCovBloomWords).localCheckpoint(true)
        val cand = Bloom.probe(g.withColumn("k", col("g").cast("string")),
            bloom, "k", DupCovBloomWords, "maybe")
          .filter(col("maybe"))
        val dupPer = cand
          .withColumn("n_docs_g",
            count(lit(1)).over(Window.partitionBy(col("g"))))
          .filter(col("n_docs_g") > 1)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_dup"))
        // source rejoins at doc grain from a pruned 2-column parquet
        // scan (no text read, no tokenize) — dropping it through the
        // heavy gram exchange is what shrinks the cache
        val src = d.select(col("doc_id"), col("source"))
        totals.join(dupPer, Seq("doc_id"), "left")
          .withColumn("n_dup", coalesce(col("n_dup"), lit(0L)))
          .join(src, Seq("doc_id"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_grams")).as("total_grams"),
            sum(col("n_dup")).as("dup_grams"),
            sum(when(col("n_dup") * 2 > col("n_grams"), 1L).otherwise(0L))
              .as("n_docs_mostly_dup"))
          .select(col("source"), col("n_docs"), col("total_grams"), col("dup_grams"),
            (col("dup_grams").cast("double") / col("total_grams").cast("double"))
              .as("dup_coverage"),
            col("n_docs_mostly_dup"))
          .orderBy(col("source").asc_nulls_first)
          .localCheckpoint(true)
      } finally ga.unpersist()
    },
    Some("""
      WITH g AS (
        SELECT DISTINCT doc_id, source,
               CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS g
        FROM (
          SELECT doc_id, source, unnest(list_transform(range(1, len(t) - 3),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                      || ' ' || t[i+4])) AS s
          FROM (SELECT doc_id, source, string_split(text, ' ') t FROM documents))),
      sh AS (SELECT g, count(*) AS n_docs_g FROM g GROUP BY 1),
      per AS (
        SELECT doc_id, source, count(*) AS n_grams,
               CAST(sum(CASE WHEN n_docs_g > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        FROM g JOIN sh USING (g) GROUP BY 1, 2)
      SELECT source, count(*) AS n_docs,
             CAST(sum(n_grams) AS BIGINT) AS total_grams,
             CAST(sum(n_dup) AS BIGINT) AS dup_grams,
             CAST(sum(n_dup) AS DOUBLE) / CAST(sum(n_grams) AS DOUBLE) AS dup_coverage,
             CAST(sum(CASE WHEN n_dup * 2 > n_grams THEN 1 ELSE 0 END) AS BIGINT)
               AS n_docs_mostly_dup
      FROM per GROUP BY 1 ORDER BY source ASC NULLS FIRST"""))

  // --- E1: exact substring dedup with removed-span accounting -----------
  // The suffix-array discipline of Lee et al. 2022 ("Deduplicating
  // Training Data Makes Language Models Better" §4) re-expressed with
  // sorted k-gram windows (VERDICT r6 wishlist #2, beyond q50's fixed
  // disjoint passages): a duplicated SPAN is the union of k-token
  // windows whose gram occurs earlier in the corpus (first occurrence
  // by (doc_id, pos) is the keeper — all later occurrences, including
  // within-doc repeats, are removal starts), overlapping windows are
  // merged into maximal runs, and the report accounts removed tokens
  // AND characters (token chars + interior separators) per source.
  //
  // Scale shape: the only corpus-global operation is the first-
  // occurrence ranking over gram-hash partitions, and it is Bloom-
  // PREFILTERED (the q90 discipline): most grams are singletons, so a
  // words-sized sketch of grams-seen->=2 is built from a map-side-
  // combinable count and broadcast; only admitted grams reach the
  // row_number window — Bloom false positives rank rn=1 and drop out,
  // so the accounting stays EXACT. WindowExec pays per-partition
  // overhead, so shrinking 265k mostly-singleton partitions to the
  // duplicated ~10% cut this query 9.4 s -> ~2 s at sf0.1. Grams
  // leave the scan as 60-bit longs zipped positionally to their
  // tokens (one posexplode, no token<->gram join); the exploded
  // stream is a diamond (base positions, dup counts, probe) and is
  // persisted once. Span merging is all doc-local rolling windows
  // (bounded by doc length). No corpus-sized window partition
  // anywhere.
  private val SubstrK = 8
  private val SubstrBloomWords = 4096
  private val q108 = Q(
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = docs(spark, dir)
      val T = TextOps.tokens(col("text"))
      val G = TextOps.gramHashes(T, SubstrK)
      // The exploded token stream is a diamond (base positions, dup
      // counts, probe), but persisting it exploded WITH token + source
      // strings is what blew up 5x under the driver's round-7 memory
      // pressure. The persisted footprint is now one row per doc:
      // zip_with pads the gram array with nulls to token length, and
      // only (toklen:int, g:long) survive — token text never enters
      // the cache, source rejoins at doc grain at the end. Eager
      // count() + finally-unpersist bound the cache to the build.
      val za = d.select(col("doc_id"),
          zip_with(transform(T, t => length(t)), G,
            (l, g) => struct(l.as("toklen"), g.as("g"))).as("z"))
        .persist()
      za.count()
      try {
        val toks = za.select(col("doc_id"), posexplode(col("z")))
          .select(col("doc_id"), col("pos"),
            col("col.toklen").as("toklen"), col("col.g").as("g"))
        val grams = toks.filter(col("g").isNotNull)
          .select(col("doc_id"), col("pos"), col("g"))
        val dup = grams.groupBy(col("g")).agg(count(lit(1)).as("c"))
          .filter(col("c") > 1).select(col("g").cast("string").as("k"))
        val bloom = Bloom.build(dup, "k", SubstrBloomWords).localCheckpoint(true)
        val cand = Bloom.probe(grams.withColumn("k", col("g").cast("string")),
            bloom, "k", SubstrBloomWords, "maybe")
          .filter(col("maybe"))
        val wg = Window.partitionBy(col("g"))
          .orderBy(col("doc_id"), col("pos"))
        // all-but-first occurrences of duplicated grams = removal starts
        val starts = cand.withColumn("rn", row_number().over(wg))
          .filter(col("rn") > 1)
          .select(col("doc_id"), col("pos"), lit(1).as("removable"))
        val wc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          .rowsBetween(-(SubstrK - 1), 0)
        val wl = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        // ONE full-stream exchange instead of two (r14, guide §2.4):
        // hash both join sides by doc_id alone — HashPartitioning on a
        // subset of the join keys satisfies the (doc_id, pos) join's
        // clustering, and the join output stays doc_id-partitioned, so
        // the coverage windows below reuse it. The un-repartitioned form
        // shuffled the full token stream by (doc_id, pos) for the join
        // and AGAIN by doc_id for the windows.
        val cov = toks.select(col("doc_id"), col("pos"), col("toklen"))
          .repartition(col("doc_id"))
          .join(starts.repartition(col("doc_id")), Seq("doc_id", "pos"), "left")
          .withColumn("removable", coalesce(col("removable"), lit(0)))
          .withColumn("covered",
            when(max(col("removable")).over(wc) >= 1, 1).otherwise(0))
          .withColumn("new_run",
            when(col("covered") === 1 &&
              coalesce(lag(col("covered"), 1).over(wl), lit(0)) === 0, 1)
              .otherwise(0))
        val perDoc = cov.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_toks"),
            sum(col("covered")).as("cc"),
            sum(col("new_run")).as("runs"),
            sum(when(col("covered") === 1, col("toklen")).otherwise(0))
              .as("chars"))
        // pruned 2-column scan — no text read, no tokenize
        val src = d.select(col("doc_id"), col("source"))
        perDoc.join(src, Seq("doc_id"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("cc") > 0, 1L).otherwise(0L)).as("n_docs_affected"),
            sum(col("n_toks")).as("total_tokens"),
            sum(col("cc")).as("removed_tokens"),
            (sum(col("chars")) + sum(col("cc")) - sum(col("runs")))
              .as("removed_chars"))
          .orderBy(col("source"))
          .localCheckpoint(true)
      } finally za.unpersist()
    },
    Some {
      val k = SubstrK
      val gram = (1 to k).map(o => s"t[i+${o - 1}]").mkString(" || ' ' || ")
      s"""
      WITH tk AS (SELECT source, doc_id, string_split(text, ' ') AS t
                  FROM documents),
      p0 AS (
        SELECT source, doc_id,
               unnest(list_transform(range(1, len(t) + 1), i -> struct_pack(
                 pos := i - 1,
                 tok := t[i],
                 isg := CASE WHEN i + ${k - 1} <= len(t) THEN 1 ELSE 0 END,
                 gk := CASE WHEN i + ${k - 1} <= len(t)
                            THEN CAST(('0x' || substr(md5($gram), 1, 15)) AS BIGINT)
                            ELSE -(doc_id * 1000000 + i) END)),
                 recursive := true)
        FROM tk),
      rn AS (SELECT *, row_number() OVER (
               PARTITION BY gk
               ORDER BY doc_id ASC NULLS FIRST, pos ASC NULLS FIRST) AS rn
             FROM p0),
      rv AS (SELECT source, doc_id, pos, tok,
                    CASE WHEN isg = 1 AND rn > 1 THEN 1 ELSE 0 END AS removable
             FROM rn),
      cov AS (SELECT *, CASE WHEN max(removable) OVER (
                 PARTITION BY doc_id ORDER BY pos ASC NULLS FIRST
                 ROWS BETWEEN ${k - 1} PRECEDING AND CURRENT ROW) >= 1
               THEN 1 ELSE 0 END AS covered
              FROM rv),
      run AS (SELECT *, CASE WHEN covered = 1 AND COALESCE(lag(covered) OVER (
                 PARTITION BY doc_id ORDER BY pos ASC NULLS FIRST), 0) = 0
               THEN 1 ELSE 0 END AS new_run
              FROM cov),
      perdoc AS (SELECT source, doc_id, count(*) AS n_toks,
                        sum(covered) AS cc, sum(new_run) AS runs,
                        sum(CASE WHEN covered = 1 THEN length(tok) ELSE 0 END) AS chars
                 FROM run GROUP BY 1, 2)
      SELECT source, count(*) AS n_docs,
             CAST(sum(CASE WHEN cc > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_docs_affected,
             CAST(sum(n_toks) AS BIGINT) AS total_tokens,
             CAST(sum(cc) AS BIGINT) AS removed_tokens,
             CAST(sum(chars) + sum(cc) - sum(runs) AS BIGINT) AS removed_chars
      FROM perdoc GROUP BY 1 ORDER BY source ASC NULLS FIRST"""
    })

  // --- E2g: asymmetric containment (template/boilerplate detection) -----
  // What Jaccard can't see: a template fully embedded in a larger page
  // has low resemblance but containment ≈ 1. Prefix-filtered SSJoin
  // (operators/TextOps.containmentPairs — candidate generation is an
  // equi-join of each doc's |A|−α+1 RAREST shingles against the
  // inverted index; the filter is lossless set theory). The oracle is
  // the quadratic containment definition itself, so parity proves the
  // prefix filter drops nothing. Threshold 4/5 in integer arithmetic.
  private val ContainNum = 4
  private val ContainDen = 5

  private val q114 = Q(
    (spark, dir) => {
      TextOps.containmentPairs(docs(spark, dir), "doc_id", "text",
          ContainNum, ContainDen)
        .select(col("a_id"), col("b_id"), col("n_a"), col("n_b"),
          col("inter"), col("containment"))
        .orderBy(col("a_id").asc, col("b_id").asc)
    },
    // oracle over the HASHED shingle sets (r14): containmentPairs moved
    // to the 60-bit gram-hash layout (the q210/q214/q219 discipline,
    // VERDICT r12 #4), so the quadratic-definition oracle intersects the
    // same hashes — sizes and intersections are value-identical to the
    // string-set oracle modulo md5-60-bit collisions (none at any test
    // SF: output parity re-proved against the prior string-set values).
    Some(s"""
      WITH $hashedShingleSqlCte,
      p AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(len(a.sh) AS BIGINT) AS n_a,
               CAST(len(b.sh) AS BIGINT) AS n_b,
               CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter
        FROM s a JOIN s b ON a.doc_id <> b.doc_id
        WHERE len(a.sh) > 0)
      SELECT a_id, b_id, n_a, n_b, inter,
             CAST(inter AS DOUBLE) / n_a AS containment
      FROM p
      WHERE inter * $ContainDen >= n_a * $ContainNum
      ORDER BY a_id ASC NULLS FIRST, b_id ASC NULLS FIRST"""))

  // --- q148: HyperLogLog distinct-5-gram estimate per source ------------
  // Register algebra lives in operators/Hll.scala (shared with the
  // HllStream streaming twin, the Kmv.scala single-home discipline).
  // The OTHER canonical distinct sketch next to q58's KMV, over the
  // n-gram-diversity universe (distinct 5-grams ≈ how non-repetitive a
  // source is): m=256 registers (p=8), register = leading-zero rank of
  // the 52 bits left after the 8-bit index is peeled off the shared
  // 60-bit gram hash (TextOps.gramHashes — one hash feeds q45/q90 AND
  // this sketch). Determinism moves that make a float estimator
  // oracle-exact: (1) the harmonic denominator Σ2^(−r) is held as the
  // RATIONAL INTEGER S = Σ 2^(32−min(r,32)) (one BIGINT per source,
  // ≤ 2^40 — exactly double-representable), so the raw path's only
  // float op is a single division by the precomputed α·m²·2³²
  // literal; (2) Flajolet's small-range branch (E ≤ 2.5m, V>0 →
  // linear counting m·ln(m/V)) is implemented on BOTH sides with the
  // identical expression — it is dormant at the oracle's gram
  // cardinality (~1.3k ≫ 640), and its ln() is the one operation
  // without a cross-engine bit guarantee, which is exactly why the
  // raw path avoids ln by construction.
  //
  // Scale shape: grams fold to ≤256 register rows per source map-side
  // (two cascaded hash aggregates — no distinct of the gram stream);
  // registers merge by MAX, so the sketch is mergeable/streamable and
  // the 100 TB path keeps ONLY 256 bytes per source. exact_distinct
  // is the evaluation baseline, priced separately (the one distinct
  // shuffle this query would NOT pay in production).
  private val HllM = graft.operators.Hll.M
  private val HllAlphaC: Double = graft.operators.Hll.AlphaC
  private val q148 = Q(
    (spark, dir) => {
      import graft.operators.Hll
      // ONE tokenize+hash scan and ONE (source, hv) distinct shuffle
      // feed BOTH branches: registers are max-idempotent, so building
      // them from the deduped grams is identical to building from the
      // raw stream, and the exact baseline is a count over the same
      // deduped frame — the two aggregates share the distinct's
      // exchange (ReusedExchange; the first cut scanned + hashed the
      // corpus twice and paid a second full-width shuffle for
      // countDistinct: 9.9x time at 10x data, vs ~linear now)
      // docs(), not Tables.documents: the gram scan must parallelize
      // even when the corpus arrives as one parquet file (measured
      // 56 s single-partition vs ~2 s wide at sf1)
      val g = docs(spark, dir)
        .select(col("source"),
          explode(TextOps.gramHashes(TextOps.tokens(col("text")), 5))
            .as("hv"))
        .distinct()
      val est = Hll.estimate(Hll.registers(g, "source", "hv"), "source")
      val exact = g.groupBy(col("source"))
        .agg(count(lit(1)).as("exact_distinct"))
      est.join(exact, Seq("source"))
        .select(col("source"), col("n_filled"), col("v_zero"),
          col("s_rational"), col("est_hll"), col("exact_distinct"))
        .orderBy(col("source").asc)
    },
    Some(s"""
      WITH g AS (
        SELECT source,
               CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS hv FROM (
          SELECT source, unnest(list_transform(range(1, len(t) - 3),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                      t[i+3] || ' ' || t[i+4])) AS s
          FROM (SELECT source, string_split(text, ' ') AS t
                FROM documents))),
      reg AS (
        SELECT source, hv & 255 AS idx,
               max(CASE WHEN hv >> 8 = 0 THEN 53
                        ELSE 53 - length(bin(hv >> 8)) END) AS r
        FROM g GROUP BY 1, 2),
      roll AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_filled,
               CAST(sum(CAST(1 AS BIGINT) << (32 - least(r, 32)))
                 AS BIGINT) AS s_present
        FROM reg GROUP BY 1),
      est AS (
        SELECT source, n_filled,
               CAST($HllM - n_filled AS BIGINT) AS v_zero,
               CAST(s_present + ($HllM - n_filled) * 4294967296 AS BIGINT)
                 AS s_rational,
               $HllAlphaC / CAST(s_present + ($HllM - n_filled) * 4294967296
                 AS DOUBLE) AS est_raw
        FROM roll),
      ex AS (
        SELECT source, CAST(count(DISTINCT hv) AS BIGINT) AS exact_distinct
        FROM g GROUP BY 1)
      SELECT e.source, n_filled, v_zero, s_rational,
             CASE WHEN v_zero > 0 AND est_raw <= ${2.5 * HllM}
                  THEN ${HllM.toDouble} *
                       ln(${HllM.toDouble} / CAST(v_zero AS DOUBLE))
                  ELSE est_raw END AS est_hll,
             exact_distinct
      FROM est e JOIN ex ON e.source = ex.source
      ORDER BY e.source ASC NULLS FIRST"""))

  // --- q175: BPE fertility by language (tokenizer-efficiency audit) ------
  // The budgeting number q24's counts roll up to: characters consumed
  // per BPE token, by language — the fertility statistic that drives
  // per-language training-cost and context-budget estimates (a language
  // the tokenizer fragments at 2x fertility costs 2x the context). Same
  // single-projection shape as q24 (one scan, the bpe_count_text native
  // expression with its word memo, one aggregate); the ratio is an
  // exact integer centi-quotient. The oracle replays the merge table
  // from the SAME Scala merge list (Bpe.oracleCte) — no drift possible.
  private val q175 = Q(
    (spark, dir) => {
      docs(spark, dir)
        .select(col("lang"), col("n_chars"),
          functions.Bpe.countTextCol(col("text")).as("nb"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"),
          sum(col("nb")).as("bpe_tokens"))
        .withColumn("chars_per_token_centi",
          expr("(100 * chars) div bpe_tokens"))
        .orderBy(col("lang"))
    },
    Some(s"""
      WITH RECURSIVE words AS (
        SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
      ${functions.Bpe.oracleCte("words")},
      wc AS (SELECT lang, w, count(*) AS c FROM words GROUP BY 1, 2),
      b AS (SELECT lang, CAST(sum(c * n_bpe) AS BIGINT) AS bpe_tokens
            FROM wc JOIN bpe USING (w) GROUP BY 1),
      base AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(sum(n_chars) AS BIGINT) AS chars
               FROM documents GROUP BY 1)
      SELECT base.lang, n_docs, chars, bpe_tokens,
             (100 * chars) // bpe_tokens AS chars_per_token_centi
      FROM base JOIN b ON base.lang = b.lang
      ORDER BY base.lang ASC NULLS FIRST"""))

  // --- q183: train/val/test near-dup LEAKAGE audit ------------------------
  // q135 assigns splits; q17 finds near-dups; this query asks the eval-
  // hygiene question both leave open: do near-duplicate documents
  // STRADDLE a split boundary? A test doc whose near-twin sits in train
  // silently inflates every benchmark number (the Lee et al. 2022
  // dedup-test-set finding). Pairs come from the SAME verified LSH
  // pipeline as q17 (band equi-join, exact-Jaccard verify — never
  // all-pairs); splits from the SAME md5 rule as q135 — both reused,
  // not re-derived, so this audit can't drift from the ops it audits.
  // The worst pair per split-pair is pinned by packing (a_id, b_id)
  // into one long (doc_id < 2^31 by the Sampling.PackIdBits corpus
  // contract) and taking the min — an aggregate, not a window.
  private val q183 = Q(
    (spark, dir) => {
      val bucket = pmod(Kmv.hash60(concat(lit("split|"), col("doc_id"))),
        lit(1000L))
      val split = docs(spark, dir).select(col("doc_id"),
        when(bucket < 850, lit("train"))
          .when(bucket < 925, lit("val"))
          .otherwise(lit("test")).as("split"))
      nearDupPairs(spark, dir)
        .join(split.select(col("doc_id").as("a_id"), col("split").as("split_a")),
          Seq("a_id"))
        .join(split.select(col("doc_id").as("b_id"), col("split").as("split_b")),
          Seq("b_id"))
        .filter(col("split_a") =!= col("split_b"))
        .groupBy(col("split_a"), col("split_b"))
        .agg(count(lit(1)).as("n_leaky_pairs"),
          max(col("jaccard")).as("max_jaccard"),
          min(col("a_id") * lit(1L << 32) + col("b_id")).as("pk"))
        .select(col("split_a"), col("split_b"), col("n_leaky_pairs"),
          col("max_jaccard"),
          expr(s"pk div ${1L << 32}").as("example_a"),
          expr(s"pk % ${1L << 32}").as("example_b"))
        .orderBy(col("split_a").asc, col("split_b").asc)
    },
    Some(s"""
      WITH $shingleSqlCte,
      sp AS (
        SELECT doc_id,
               CASE WHEN b < 850 THEN 'train'
                    WHEN b < 925 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id,
                     CAST(('0x' || substr(md5('split|' || doc_id), 1, 15))
                       AS BIGINT) % 1000 AS b
              FROM documents)),
      p AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
                 AS jaccard
        FROM s a JOIN s b ON a.doc_id < b.doc_id),
      lk AS (
        SELECT sa.split AS split_a, sb.split AS split_b, p.jaccard,
               p.a_id * ${1L << 32} + p.b_id AS pk
        FROM p JOIN sp sa ON sa.doc_id = p.a_id
               JOIN sp sb ON sb.doc_id = p.b_id
        WHERE p.jaccard >= $JaccardThreshold AND sa.split <> sb.split)
      SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_leaky_pairs,
             max(jaccard) AS max_jaccard,
             CAST(min(pk) // ${1L << 32} AS BIGINT) AS example_a,
             CAST(min(pk) % ${1L << 32} AS BIGINT) AS example_b
      FROM lk GROUP BY 1, 2
      ORDER BY split_a ASC NULLS FIRST, split_b ASC NULLS FIRST"""))

  // --- q193: Naive-Bayes language-ID audit (trained confusion matrix) ----
  // q22 screens with two hand-picked marker lists; this TRAINS the
  // classifier the screen approximates — multinomial Naive Bayes with
  // Laplace smoothing — and reports the training-set confusion matrix,
  // the "is language ID even learnable from this corpus" audit a
  // curation pipeline runs before trusting any lang column. All
  // arithmetic is the q75/q89 integer-surprisal discipline: a token's
  // cost under language l is length(bin((tot_l + V) div (c_lt + 1)))
  // bits — floor-log2 via BIGINT bit length, never float log — plus an
  // integer prior; argmin with a lexicographic tie-break, so both
  // engines pick identical labels even on exact ties (this synthetic
  // corpus shares one vocabulary across languages, so the matrix
  // honestly shows lang-ID is NOT learnable here — that is the audit
  // working, not failing).
  //
  // Scale shape: the unseen-pair problem (a doc×lang×term grid) is
  // folded analytically — score(d,l) = n_tokens(d)·default_l + prior_l
  // + Σ_{(t,l) trained} cnt_dt·(bits_lt − default_l) — so only
  // OBSERVED (term, lang) stats ever join (one term-keyed shuffle);
  // the per-language totals and priors ride a broadcast digest, and
  // the argmin is a struct-min aggregate, not a window.
  private val q193 = Q(
    (spark, dir) => {
      val toks = docs(spark, dir)
        .select(col("doc_id"), col("lang"),
          explode(TextOps.tokens(col("text"))).as("term"))
      val dt = toks.groupBy(col("doc_id"), col("lang"), col("term"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true) // fans out into train stats AND scoring
      val clt = dt.groupBy(col("lang"), col("term"))
        .agg(sum(col("cnt")).as("c_lt"))
      val totl = clt.groupBy(col("lang")).agg(sum(col("c_lt")).as("tot"))
      val vocab = clt.select(col("term")).distinct()
        .agg(count(lit(1)).as("v"))
      // corpus-total docs ride a broadcast digest (like every other
      // digest in the suite) — not an unpartitioned window, which
      // plans a single-partition WindowExec and spams the scale-killer
      // WARN even on this bounded |langs|-row frame (VERDICT r8 #6)
      val nAll = docs(spark, dir).agg(count(lit(1)).as("n_all"))
      val ndocs = docs(spark, dir).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_l"))
        .crossJoin(broadcast(nAll))
      val langs = totl.crossJoin(broadcast(vocab))
        .join(ndocs, Seq("lang"))
        .select(col("lang").as("l"),
          expr("CAST(length(bin(tot + v)) AS BIGINT)").as("default_bits"),
          expr("CAST(length(bin(n_all div n_l)) AS BIGINT)").as("prior_bits"))
      val stats = clt.crossJoin(broadcast(vocab))
        .join(broadcast(totl), Seq("lang"))
        .select(col("term"), col("lang").as("l"),
          expr("CAST(length(bin((tot + v) div (c_lt + 1))) AS BIGINT)")
            .as("bits"))
      val base = dt.groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("cnt")).as("n_tokens"))
        .crossJoin(broadcast(langs))
        .select(col("doc_id"), col("lang"), col("l"),
          (col("n_tokens") * col("default_bits") + col("prior_bits"))
            .as("base"))
      val adj = dt.join(stats, Seq("term"))
        .join(broadcast(langs.select(col("l"), col("default_bits"))), Seq("l"))
        .groupBy(col("doc_id"), col("l"))
        .agg(sum(col("cnt") * (col("bits") - col("default_bits"))).as("adj"))
      base.join(adj, Seq("doc_id", "l"), "left")
        .select(col("doc_id"), col("lang"), col("l"),
          (col("base") + coalesce(col("adj"), lit(0L))).as("score"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(min(struct(col("score"), col("l"))).as("best"))
        .select(col("lang").as("actual"), col("best.l").as("predicted"))
        .groupBy(col("actual"), col("predicted"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("actual").asc, col("predicted").asc)
    },
    Some("""
      WITH toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
                    FROM documents),
      dt AS (SELECT doc_id, lang, term, CAST(count(*) AS BIGINT) AS cnt
             FROM toks GROUP BY 1, 2, 3),
      clt AS (SELECT lang, term, CAST(sum(cnt) AS BIGINT) AS c_lt
              FROM dt GROUP BY 1, 2),
      totl AS (SELECT lang, CAST(sum(c_lt) AS BIGINT) AS tot FROM clt GROUP BY 1),
      vocab AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM clt),
      ndocs AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_l,
                       CAST(sum(count(*)) OVER () AS BIGINT) AS n_all
                FROM documents GROUP BY 1),
      langs AS (SELECT totl.lang AS l,
                       CAST(length(bin(tot + v)) AS BIGINT) AS default_bits,
                       CAST(length(bin(n_all // n_l)) AS BIGINT) AS prior_bits
                FROM totl CROSS JOIN vocab JOIN ndocs ON ndocs.lang = totl.lang),
      stats AS (SELECT term, clt.lang AS l,
                       CAST(length(bin((tot + v) // (c_lt + 1))) AS BIGINT)
                         AS bits
                FROM clt CROSS JOIN vocab JOIN totl ON totl.lang = clt.lang),
      base AS (SELECT doc_id, dt.lang, langs.l,
                      CAST(sum(cnt) AS BIGINT) * max(default_bits)
                        + max(prior_bits) AS base
               FROM dt CROSS JOIN langs
               GROUP BY 1, 2, 3),
      adj AS (SELECT doc_id, stats.l,
                     CAST(sum(cnt * (bits - default_bits)) AS BIGINT) AS adj
              FROM dt
              JOIN stats USING (term)
              JOIN langs ON langs.l = stats.l
              GROUP BY 1, 2),
      scored AS (SELECT base.doc_id, base.lang, base.l,
                        base.base + COALESCE(adj.adj, 0) AS score
                 FROM base LEFT JOIN adj
                   ON adj.doc_id = base.doc_id AND adj.l = base.l),
      pred AS (SELECT doc_id, lang AS actual,
                      (min({'s': score, 'l': l})).l AS predicted
               FROM scored GROUP BY 1, 2)
      SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n_docs
      FROM pred
      GROUP BY 1, 2
      ORDER BY actual ASC, predicted ASC"""))

  // --- q204: distributed BPE tokenizer TRAINING (merge induction) --------
  // The tokenizer family's missing first step: q24/q56/q175 all COUNT
  // under a fixture merge table; this LEARNS one from the corpus
  // (Sennrich et al. ACL 2016 — operators/BpeTrain). The corpus is
  // read once into a (word, count) vocabulary (Heaps' law: sublinear
  // state — the collapse every industrial BPE trainer performs), then
  // each of the 8 rounds is a vocabulary-sized pair count + a 1-row
  // argmax collect + a map-only codegen'd merge fold (bounded driver
  // rounds, the q201 k-center discipline). The ORACLE unrolls all 8
  // rounds as generated CTEs (the q112/q201 discipline) with the merge
  // application stated RELATIONALLY: match positions island-grouped,
  // alternation keeps even offsets within a run — provably the same
  // rule as the Spark fold (overlap runs only arise when left == right;
  // BpeTrainSpec cross-checks the two formulations property-wise), so
  // every learned (rank, pair, count) row hash-matches bit for bit.
  // No streaming twin by design: each merge changes the statistics the
  // next argmax reads — training is inherently sequential in rounds.
  private val BpeTrainRounds = 8
  private val BpeMaxWordLen = 32

  /** Parameterized BPE training walk — q204 runs it at
    * [[BpeTrainRounds]]; Explain's `bpetrain` subcommand times other
    * round counts to document the rounds-knee of the driver-loop
    * design (the q201 k-knee discipline, docs/SCALING.md). */
  private[graft] def bpeTrain(spark: SparkSession, dir: String,
                              rounds: Int): DataFrame = {
    val words = docs(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "" && length(col("w")) <= BpeMaxWordLen)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val merges = graft.operators.BpeTrain.fit(words, rounds)
    import spark.implicits._
    merges.map(m => (m.rank.toLong, m.left, m.right, m.pairCnt))
      .toDF("rank", "lft", "rgt", "pair_cnt")
      .orderBy(col("rank"))
  }

  /** Oracle CTE chain replaying `rounds` greedy training rounds over a
    * prior `s0(word, cnt, rn, tok)` state — one block per round,
    * yielding the per-round winners `b1..b{rounds}` (q204's unrolled
    * machinery, factored out so q207 can CHAIN training into its
    * encode oracle). Generated from the SAME Scala constants the Spark
    * path uses. */
  private def bpeTrainOracleRounds(rounds: Int): String =
    (1 to rounds).map { r =>
        val prev = s"s${r - 1}"
        s"""p$r AS (
        SELECT a.tok AS lft, b.tok AS rgt, CAST(sum(a.cnt) AS BIGINT) AS c
        FROM $prev a JOIN $prev b ON b.word = a.word AND b.rn = a.rn + 1
        GROUP BY 1, 2),
      b$r AS MATERIALIZED (SELECT lft, rgt, c FROM p$r
              ORDER BY c DESC, lft ASC, rgt ASC LIMIT 1),
      m$r AS (
        SELECT a.word, a.rn FROM $prev a
        JOIN $prev nx ON nx.word = a.word AND nx.rn = a.rn + 1
        JOIN b$r bb ON a.tok = bb.lft AND nx.tok = bb.rgt),
      k$r AS MATERIALIZED (
        SELECT word, rn FROM (
          SELECT word, rn, rn - min(rn) OVER (PARTITION BY word, grp) AS off
          FROM (SELECT word, rn,
                       rn - row_number() OVER (PARTITION BY word ORDER BY rn)
                         AS grp
                FROM m$r))
        WHERE off % 2 = 0),
      s$r AS MATERIALIZED (
        SELECT word, cnt,
               row_number() OVER (PARTITION BY word ORDER BY rn) AS rn, tok
        FROM (
          SELECT s.word, s.cnt, s.rn,
                 CASE WHEN k.rn IS NOT NULL THEN s.tok || nx.tok
                      ELSE s.tok END AS tok
          FROM $prev s
          LEFT JOIN k$r k ON k.word = s.word AND k.rn = s.rn
          LEFT JOIN $prev nx ON nx.word = s.word AND nx.rn = s.rn + 1
          LEFT JOIN k$r ka ON ka.word = s.word AND ka.rn = s.rn - 1
          WHERE ka.rn IS NULL))"""
    }.mkString(",\n      ")

  /** Oracle CTEs for the training input: the capped (word, count)
    * vocabulary `w` and the character-state `s0` — shared by q204 and
    * q207 (identical Scala constants on both engines). */
  private val bpeTrainOracleBase = s"""w AS (
        SELECT wd, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS wd FROM documents)
        WHERE wd <> '' AND len(wd) <= $BpeMaxWordLen
        GROUP BY 1),
      s0 AS MATERIALIZED (
        SELECT word, cnt,
               CAST(generate_subscripts(toks, 1) AS BIGINT) AS rn,
               unnest(toks) AS tok
        FROM (SELECT wd AS word, cnt,
                     list_transform(range(1, len(wd) + 1),
                       i -> substr(wd, CAST(i AS INT), 1)) AS toks
              FROM w))"""

  private val q204 = Q(
    (spark, dir) => bpeTrain(spark, dir, BpeTrainRounds),
    Some {
      // one CTE block per training round, generated from the SAME
      // Scala constants (rounds, word-length cap) the Spark path uses
      val out = (1 to BpeTrainRounds)
        .map(r => s"SELECT ${r}::BIGINT AS rank, lft, rgt, c AS pair_cnt FROM b$r")
        .mkString("\n       UNION ALL ")
      s"""
      WITH $bpeTrainOracleBase,
      ${bpeTrainOracleRounds(BpeTrainRounds)}
      SELECT * FROM ($out)
      ORDER BY rank ASC NULLS FIRST"""
    })

  // --- q205: BATCHED BPE training (top-p compatible merges per round) ----
  // q204's documented successor at production vocabulary sizes: each
  // round computes pair counts ONCE, collects the top-64 candidates
  // (TakeOrdered — bounded), keeps up to 4 COMPATIBLE pairs (token-
  // disjoint, and no member/concatenation collisions — the
  // BpeTrain.selectCompatible contract that makes simultaneous
  // application well-defined), and applies the whole batch in one
  // fold: 4x fewer driver round-trips for the same merge count (the
  // SentencePiece trainer's trick). The candidate window IS part of
  // the algorithm contract, so the ORACLE replays the walk exactly:
  // per round, an unrolled chain of 4 rank-ordered selections each
  // excluding the prior picks' tokens and concats, then the SAME
  // match-island/alternation apply as q204 extended to a multi-pair
  // batch (compatible pairs can never overlap positionally — the
  // invariant BpeTrainSpec pins). With p = 1 the walk degenerates to
  // q204's greedy, merge for merge (spec law).
  private val BpeBatchRounds = 4
  private val BpeBatchP = 4
  private val BpeBatchCap = 64

  /** Parameterized batched BPE training walk — q205 runs it at
    * ([[BpeBatchRounds]], [[BpeBatchP]], [[BpeBatchCap]]); Explain's
    * `bpebatch` subcommand times other (rounds, p) points to document
    * the p-KNEE of the batched driver-loop design (VERDICT r10 #4,
    * the rounds-knee discipline; docs/SCALING.md). */
  private[graft] def bpeTrainBatched(spark: SparkSession, dir: String,
                                     rounds: Int, p: Int,
                                     topCap: Int): DataFrame = {
    val words = docs(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "" && length(col("w")) <= BpeMaxWordLen)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val merges = graft.operators.BpeTrain
      .fitBatched(words, rounds, p, topCap)
    import spark.implicits._
    merges.map(m => (m.rank.toLong, m.left, m.right, m.pairCnt))
      .toDF("rank", "lft", "rgt", "pair_cnt")
      .orderBy(col("rank"))
  }

  private val q205 = Q(
    (spark, dir) =>
      bpeTrainBatched(spark, dir, BpeBatchRounds, BpeBatchP, BpeBatchCap),
    Some {
      def selCte(r: Int, j: Int): String =
        if (j == 1)
          s"b${r}x1 AS MATERIALIZED (SELECT lft, rgt, c, rn FROM t$r ORDER BY rn LIMIT 1)"
        else {
          val prev = (1 until j)
            .map(i => s"SELECT lft, rgt FROM b${r}x$i").mkString(" UNION ALL ")
          s"""b${r}x$j AS MATERIALIZED (
        SELECT lft, rgt, c, rn FROM t$r t
        WHERE NOT EXISTS (
          SELECT 1 FROM ($prev) q
          WHERE t.lft IN (q.lft, q.rgt, q.lft || q.rgt)
             OR t.rgt IN (q.lft, q.rgt, q.lft || q.rgt)
             OR (t.lft || t.rgt) IN (q.lft, q.rgt))
        ORDER BY rn LIMIT 1)"""
        }
      val rounds = (1 to BpeBatchRounds).map { r =>
        val prev = s"s${r - 1}"
        val sels = (1 to BpeBatchP).map(selCte(r, _)).mkString(",\n      ")
        val pk = (1 to BpeBatchP)
          .map(j => s"SELECT lft, rgt, c, $j AS sel FROM b${r}x$j")
          .mkString(" UNION ALL ")
        s"""p$r AS (
        SELECT a.tok AS lft, b.tok AS rgt, CAST(sum(a.cnt) AS BIGINT) AS c
        FROM $prev a JOIN $prev b ON b.word = a.word AND b.rn = a.rn + 1
        GROUP BY 1, 2),
      t$r AS MATERIALIZED (
        SELECT lft, rgt, c,
               row_number() OVER (ORDER BY c DESC, lft ASC, rgt ASC) AS rn
        FROM p$r ORDER BY c DESC, lft ASC, rgt ASC LIMIT $BpeBatchCap),
      $sels,
      pk$r AS MATERIALIZED ($pk),
      m$r AS (
        SELECT a.word, a.rn, q.lft || q.rgt AS ntok
        FROM $prev a
        JOIN $prev nx ON nx.word = a.word AND nx.rn = a.rn + 1
        JOIN pk$r q ON a.tok = q.lft AND nx.tok = q.rgt),
      k$r AS MATERIALIZED (
        SELECT word, rn, ntok FROM (
          SELECT word, rn, ntok, rn - min(rn) OVER (PARTITION BY word, grp) AS off
          FROM (SELECT word, rn, ntok,
                       rn - row_number() OVER (PARTITION BY word ORDER BY rn) AS grp
                FROM m$r))
        WHERE off % 2 = 0),
      s$r AS MATERIALIZED (
        SELECT word, cnt,
               row_number() OVER (PARTITION BY word ORDER BY rn) AS rn, tok
        FROM (
          SELECT s.word, s.cnt, s.rn,
                 CASE WHEN k.rn IS NOT NULL THEN k.ntok ELSE s.tok END AS tok
          FROM $prev s
          LEFT JOIN k$r k ON k.word = s.word AND k.rn = s.rn
          LEFT JOIN k$r ka ON ka.word = s.word AND ka.rn = s.rn - 1
          WHERE ka.rn IS NULL))"""
      }.mkString(",\n      ")
      val out = (1 to BpeBatchRounds)
        .map(r => s"SELECT $r AS rnd, sel, lft, rgt, c FROM pk$r")
        .mkString("\n       UNION ALL ")
      s"""
      WITH w AS (
        SELECT wd, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS wd FROM documents)
        WHERE wd <> '' AND len(wd) <= $BpeMaxWordLen
        GROUP BY 1),
      s0 AS MATERIALIZED (
        SELECT word, cnt,
               CAST(generate_subscripts(toks, 1) AS BIGINT) AS rn,
               unnest(toks) AS tok
        FROM (SELECT wd AS word, cnt,
                     list_transform(range(1, len(wd) + 1),
                       i -> substr(wd, CAST(i AS INT), 1)) AS toks
              FROM w)),
      $rounds,
      allp AS ($out)
      SELECT CAST(row_number() OVER (ORDER BY rnd, sel) AS BIGINT) AS rank,
             lft, rgt, c AS pair_cnt
      FROM allp
      ORDER BY rank ASC NULLS FIRST"""
    })

  // --- q207: persisted BPE table SERVES the encoders (train→serve) ------
  // Closes the tokenizer loop (VERDICT r10 #1): q204/q205 learn a merge
  // table but until now it stayed a driver-side value, and the encode
  // path (q24/q56, functions/Bpe) consumed a compiled-in fixture. Here
  // the table is trained (q204's exact 8-round walk), PERSISTED as a
  // serving artifact (operators/BpeIndex — rank-ordered merges parquet
  // + n_merges sidecar, atomic rebuild through one TierCommit
  // manifest), read back by (name, dir), and the corpus is encoded
  // under the LEARNED table through a codegen'd expression
  // (plans/BpeCountTableLong — the table rides into generated Java as
  // a codegen reference object). Output: per-source token totals and
  // fertility (BPE tokens per word), the budget numbers a training
  // pipeline actually runs its tokenizer for.
  //
  // End-of-word convention: NONE on both trainer and encoder (bare
  // character sequences, no </w> marker) — the one-convention contract
  // BpeTable's scaladoc documents; train and encode cannot drift.
  //
  // The ORACLE replays BOTH halves end to end: q204's unrolled
  // training CTEs (shared helper — same Scala constants) yield the
  // learned table `allm`, aggregated into a one-row rank list `ml`,
  // and q24's recursive-CTE encoder walks the fixpoint under THAT list
  // (functions/BpeTable.oracleCte) — so every learned merge AND every
  // encoded count is hash-matched bit for bit.
  //
  // Scale shape: training state is vocabulary-sized (Heaps' law);
  // the persisted table is broadcast-class; encode runs on the
  // per-(source, word) GROUPED frame (≈ vocabulary-sized — the
  // distinct-vocab memo makes repeat words a hash probe), so the
  // per-row cost at 100 TB is one grouped pass, never a per-token
  // encode. Serving twin reads the index and encodes — no training.
  private def bpeHandle(dir: String): (String, String) =
    ("bpe_" + math.abs(dir.hashCode).toString,
      sys.props("java.io.tmpdir") + "/graft-bpe-index")

  private[graft] def bpeServeOnly(spark: SparkSession, dir: String): DataFrame = {
    val (name, idxDir) = bpeHandle(dir)
    val table = graft.operators.BpeIndex.table(spark, name, idxDir)
    val sw = docs(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("cnt"))
    sw.withColumn("n_bpe",
        graft.functions.BpeTable.countCol(table, col("w")))
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("n_bpe")).as("n_tokens"))
      .select(col("source"), col("n_words"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("n_words").cast("double"))
          .as("fertility"))
      .orderBy(col("source").asc_nulls_first)
  }

  private val q207 = Q(
    (spark, dir) => {
      val words = docs(spark, dir)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "" && length(col("w")) <= BpeMaxWordLen)
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      val merges = graft.operators.BpeTrain.fit(words, BpeTrainRounds)
      val (name, idxDir) = bpeHandle(dir)
      // the harness is single-writer by construction: clear any stale
      // lock a KILLED prior run left (the operator's no-live-writer
      // assertion — TierCommit.withWriteLock's documented recovery)
      graft.pipeline.TierCommit.breakLock(spark, idxDir)
      // atomic replace of the live artifact — the retrain path
      graft.operators.BpeIndex.rebuildInPlace(spark, merges, name, idxDir)
      bpeServeOnly(spark, dir)
    },
    Some {
      val allm = (1 to BpeTrainRounds)
        .map(r => s"SELECT ${r}::BIGINT AS rank, lft, rgt FROM b$r")
        .mkString("\n       UNION ALL ")
      s"""
      WITH RECURSIVE $bpeTrainOracleBase,
      ${bpeTrainOracleRounds(BpeTrainRounds)},
      allm AS ($allm),
      ${graft.functions.BpeTable.sqlMergeListCte("allm")},
      aw AS (
        SELECT source, wd AS w, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT source, unnest(string_split(text, ' ')) AS wd
              FROM documents)
        WHERE wd <> ''
        GROUP BY 1, 2),
      ${graft.functions.BpeTable.oracleCte("aw")}
      SELECT aw.source,
             CAST(sum(aw.cnt) AS BIGINT) AS n_words,
             CAST(sum(aw.cnt * bpe.n_bpe) AS BIGINT) AS n_tokens,
             CAST(sum(aw.cnt * bpe.n_bpe) AS DOUBLE)
               / CAST(sum(aw.cnt) AS DOUBLE) AS fertility
      FROM aw JOIN bpe ON bpe.w = aw.w
      GROUP BY aw.source
      ORDER BY aw.source ASC NULLS FIRST"""
    })

  // --- q209: tokenizer vocabulary-size ablation (fertility curve) --------
  // The question every pipeline answers before freezing a tokenizer:
  // how does fertility (tokens/word) fall as the merge table grows?
  // Greedy BPE training is PREFIX-STABLE (rank r is selected from
  // statistics only merges 1..r-1 produced — BpeIndexSpec pins
  // fit(words, 8).take(4) == fit(words, 4)), so ONE 8-round training
  // yields the entire curve: encoding under `rank <= c` IS what a
  // c-round training would produce. Three prefix tables (2, 4, 8
  // merges) each encode the corpus through their own codegen'd
  // BpeCountTableLong expression over the grouped (word, count) frame
  // (vocabulary-sized — Heaps' law; never a per-token encode), giving
  // corpus token totals + fertility per vocabulary size in one query.
  // The ORACLE replays training once (q204's unrolled CTEs) and runs
  // THREE recursive encoders, one per rank-capped prefix list
  // (BpeTable.oracleCteAt suffixes) — every point on the curve
  // hash-matched bit for bit.
  private val BpeCurveCuts = Seq(2, 4, 8)

  private val q209 = Q(
    (spark, dir) => {
      val words = docs(spark, dir)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "" && length(col("w")) <= BpeMaxWordLen)
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      val merges = graft.operators.BpeTrain.fit(words, BpeTrainRounds)
      val aw = docs(spark, dir)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true) // shared by all three encode passes
      BpeCurveCuts.map { c =>
        val table = new graft.functions.BpeTable(
          merges.take(c).map(m => (m.left, m.right)).toIndexedSeq)
        aw.withColumn("n_bpe",
            graft.functions.BpeTable.countCol(table, col("w")))
          .agg(sum(col("cnt")).as("n_words"),
            sum(col("cnt") * col("n_bpe")).as("n_tokens"))
          .select(lit(c.toLong).as("n_merges"), col("n_words"),
            col("n_tokens"),
            (col("n_tokens").cast("double") / col("n_words").cast("double"))
              .as("fertility"))
      }.reduce(_.union(_)).orderBy(col("n_merges").asc_nulls_first)
    },
    Some {
      val mls = BpeCurveCuts.map(c =>
        graft.functions.BpeTable.sqlMergeListCteAt("allm", c, s"_c$c"))
        .mkString(",\n      ")
      val encs = BpeCurveCuts.map(c =>
        graft.functions.BpeTable.oracleCteAt("aw", s"_c$c"))
        .mkString(",\n      ")
      val points = BpeCurveCuts.map { c =>
        s"""SELECT ${c}::BIGINT AS n_merges,
             CAST(sum(aw.cnt) AS BIGINT) AS n_words,
             CAST(sum(aw.cnt * b.n_bpe) AS BIGINT) AS n_tokens,
             CAST(sum(aw.cnt * b.n_bpe) AS DOUBLE)
               / CAST(sum(aw.cnt) AS DOUBLE) AS fertility
      FROM aw JOIN bpe_c$c b ON b.w = aw.w"""
      }.mkString("\n      UNION ALL ")
      val allm = (1 to BpeTrainRounds)
        .map(r => s"SELECT ${r}::BIGINT AS rank, lft, rgt FROM b$r")
        .mkString("\n       UNION ALL ")
      s"""
      WITH RECURSIVE $bpeTrainOracleBase,
      ${bpeTrainOracleRounds(BpeTrainRounds)},
      allm AS ($allm),
      $mls,
      aw AS (
        SELECT wd AS w, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS wd
              FROM documents)
        WHERE wd <> ''
        GROUP BY 1),
      $encs
      SELECT * FROM ($points)
      ORDER BY n_merges ASC NULLS FIRST"""
    })

  // --- q210: persisted near-dup index probe (serving READ) ---------------
  // The fifth serving family gains its openable artifact (VERDICT r11
  // #1): q17 re-mines the whole corpus inside every query — the
  // harness's honesty — but the question an INGEST pipeline asks is
  // "is this incoming batch a near-dup of corpus history?", answered
  // without re-mining. operators/NearDupIndex persists the corpus's
  // MinHash band postings (hive-partitioned by a band-hash bucket) +
  // the shingle sets verification needs; the probe computes only the
  // BATCH's signatures, reads only the touched band buckets
  // (directory-pruned), and exact-verifies collisions via a pushed
  // In(doc_id) point read. Banding geometry is TextOps' single source
  // of truth, so the probe finds exactly the pairs q17's in-plan LSH
  // finds across the same split — which is why the ORACLE is q17's
  // exact all-pairs Jaccard restated over the split (any recall loss
  // would surface as a missing row).
  //
  // The split models the incremental-ingest flow: doc_id % 10 == 0 is
  // the incoming batch, the rest is indexed history.
  //
  // 100 TB posture: build cost is the one LSH pipeline that already
  // scales (64 map-side-combining min aggregates, no all-pairs);
  // probe cost is the batch's own signatures + a pruned posting read +
  // verification over collisions only — independent of corpus size at
  // a fixed collision rate. Bench time includes the honest one-shot
  // build+write; the probe-only twin carries the serving latency.
  private def ndupHandle(dir: String): (String, String) =
    ("ndup_" + math.abs(dir.hashCode).toString,
      sys.props("java.io.tmpdir") + "/graft-ndup-index")

  private def ndupSplit(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val d = docs(spark, dir).select(col("doc_id"), col("text"))
    (d.filter(pmod(col("doc_id"), lit(10)) =!= 0),  // history: indexed
      d.filter(pmod(col("doc_id"), lit(10)) === 0)) // batch: probes
  }

  private[graft] def ndupProbeOnly(spark: SparkSession, dir: String): DataFrame = {
    val (name, idxDir) = ndupHandle(dir)
    graft.operators.NearDupIndex
      .probe(spark, name, idxDir, ndupSplit(spark, dir)._2)
      .orderBy(col("a_id").asc_nulls_first, col("b_id").asc_nulls_first)
  }

  private val q210 = Q(
    (spark, dir) => {
      val (history, _) = ndupSplit(spark, dir)
      val (name, idxDir) = ndupHandle(dir)
      // the harness is single-writer by construction: clear any stale
      // lock a KILLED prior run left (the q207 pattern)
      graft.pipeline.TierCommit.breakLock(spark, idxDir)
      graft.operators.NearDupIndex
        .rebuildInPlace(spark, history, name, idxDir)
      ndupProbeOnly(spark, dir)
    },
    Some(s"""
      WITH $hashedShingleSqlCte,
      p AS (
        SELECT least(a.doc_id, b.doc_id) AS a_id,
               greatest(a.doc_id, b.doc_id) AS b_id,
               CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
                 AS jaccard
        FROM s a JOIN s b
          ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0)
      SELECT a_id, b_id, jaccard FROM p WHERE jaccard >= $JaccardThreshold
      ORDER BY a_id ASC NULLS FIRST, b_id ASC NULLS FIRST"""))

  // --- q211: token-ID sequences from the persisted tokenizer ------------
  // q207 serves token TOTALS; a training pipeline ships token ID
  // SEQUENCES (VERDICT r11 #4). BpeIndex now persists the vocabulary
  // the merge table induces (base chars sorted, then merge outputs in
  // rank order; id = 1-based first position, 0 = OOV — derivable from
  // the merge table alone, so the artifact cannot drift from the
  // encoder), and BpeTable.encodeIds emits each word's id sequence
  // through the codegen'd BpeIdsTableArray expression.
  //
  // The query emits per-document integer digests of the full id
  // sequence rather than the raw arrays (hash-safe across engines,
  // and order-SENSITIVE at both levels so any id, any intra-word
  // order, or any word order difference flips a value):
  //   n_tokens = Σ |ids(w_p)|
  //   id_sum   = Σ Σ ids(w_p)
  //   pos_hash = Σ_p ( p·Σids(w_p) + Σ_i i·ids(w_p)[i] )
  // with p the 1-based word position and i the 1-based intra-word
  // token position — all integer-exact BIGINT arithmetic.
  //
  // Scale shape: ids are encoded once per DISTINCT word (Heaps' law —
  // the grouped-encode-then-broadcast-join discipline of q207), so
  // the per-occurrence cost at 100 TB is a hash probe + three
  // column-arithmetic aggregates. The ORACLE replays training (q204's
  // unrolled CTEs), vocabulary derivation (sqlVocabCte), and the
  // recursive-CTE encoder's SEGMENTS, then numbers them with
  // list_position against the same vocab list — every digest
  // hash-matched bit for bit.
  private def bpeIdsHandle(dir: String): (String, String) =
    ("bpeids_" + math.abs(dir.hashCode).toString,
      sys.props("java.io.tmpdir") + "/graft-bpeids-index")

  private[graft] def bpeIdsServeOnly(spark: SparkSession, dir: String): DataFrame = {
    val (name, idxDir) = bpeIdsHandle(dir)
    val table = graft.operators.BpeIndex.table(spark, name, idxDir)
    val d = docs(spark, dir)
    val enc = d.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
      .withColumn("ids", graft.functions.BpeTable.idsCol(table, col("w")))
      .select(col("w"),
        size(col("ids")).cast("long").as("ntok"),
        aggregate(col("ids"), lit(0L), (a, x) => a + x).as("idsum"),
        aggregate(
          zip_with(col("ids"),
            sequence(lit(1L), size(col("ids")).cast("long")),
            (x, i) => x * i),
          lit(0L), (a, y) => a + y).as("wsum"))
    val dw = d.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("p0", "w")))
      .filter(col("w") =!= "")
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("p"), col("w"))
    dw.join(broadcast(enc), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("ntok")).as("n_tokens"),
        sum(col("idsum")).as("id_sum"),
        sum(col("p") * col("idsum") + col("wsum")).as("pos_hash"))
      .orderBy(col("doc_id").asc_nulls_first)
  }

  private val q211 = Q(
    (spark, dir) => {
      val words = docs(spark, dir)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "" && length(col("w")) <= BpeMaxWordLen)
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      val merges = graft.operators.BpeTrain.fit(words, BpeTrainRounds)
      val (name, idxDir) = bpeIdsHandle(dir)
      graft.pipeline.TierCommit.breakLock(spark, idxDir)
      graft.operators.BpeIndex.rebuildInPlace(spark, merges, name, idxDir)
      bpeIdsServeOnly(spark, dir)
    },
    Some {
      val allm = (1 to BpeTrainRounds)
        .map(r => s"SELECT ${r}::BIGINT AS rank, lft, rgt FROM b$r")
        .mkString("\n       UNION ALL ")
      s"""
      WITH RECURSIVE $bpeTrainOracleBase,
      ${bpeTrainOracleRounds(BpeTrainRounds)},
      allm AS ($allm),
      ${graft.functions.BpeTable.sqlMergeListCte("allm")},
      ${graft.functions.BpeTable.sqlVocabCte("allm")},
      aw AS (
        SELECT DISTINCT wd AS w
        FROM (SELECT unnest(string_split(text, ' ')) AS wd FROM documents)
        WHERE wd <> ''),
      ${graft.functions.BpeTable.oracleSegCteAt("aw", "")},
      wi AS (
        SELECT w, list_transform(s,
                 sym -> CAST(list_position(v, sym) AS BIGINT)) AS ids
        FROM bpeseg, vv),
      ws AS (
        SELECT w, CAST(len(ids) AS BIGINT) AS ntok,
               CAST(list_sum(ids) AS BIGINT) AS idsum,
               CAST(list_sum(list_transform(range(1, len(ids) + 1),
                      i -> i * ids[i])) AS BIGINT) AS wsum
        FROM wi),
      dw AS (
        SELECT doc_id, CAST(generate_subscripts(ts, 1) AS BIGINT) AS p,
               unnest(ts) AS w
        FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents))
      SELECT dw.doc_id,
             CAST(sum(ws.ntok) AS BIGINT) AS n_tokens,
             CAST(sum(ws.idsum) AS BIGINT) AS id_sum,
             CAST(sum(dw.p * ws.idsum + ws.wsum) AS BIGINT) AS pos_hash
      FROM dw JOIN ws ON ws.w = dw.w
      WHERE dw.w <> ''
      GROUP BY dw.doc_id
      ORDER BY doc_id ASC NULLS FIRST"""
    })

  // --- q214: ingest ADMISSION report from the near-dup index -------------
  // The decision a dedup gate actually ships (q210 finds the pairs;
  // this turns them into verdicts): for EVERY document in the incoming
  // batch, admit ('new') or reject ('dup'), and for rejects name the
  // best-matching history document and its Jaccard — the audit row an
  // ingest pipeline writes beside the admitted corpus. Best match =
  // highest jaccard, smallest history doc_id on ties (deterministic).
  //
  // Composition: one NearDupIndex.probe (the q210 serving path,
  // directory-pruned + collision-verified) re-oriented to (batch doc,
  // history doc) — recoverable from the split rule — then a left join
  // from the full batch so admitted documents appear with verdict
  // 'new'. Scale: the probe's cost dominates; the verdict join is
  // batch-sized.
  private[graft] def ndupAdmissionOnly(spark: SparkSession, dir: String): DataFrame = {
    // the shared admission verb (round 13): orientation by batch
    // MEMBERSHIP inside NearDupIndex.admission — identical to the old
    // split-rule orientation (every pair has exactly one batch side),
    // and the same code path the streaming admission sink serves, so
    // the q214 oracle pins both
    val (_, batch) = ndupSplit(spark, dir)
    val (name, idxDir) = ndupHandle(dir)
    graft.operators.NearDupIndex.admission(spark, name, idxDir, batch)
      .orderBy(col("doc_id").asc_nulls_first)
  }

  private val q214 = Q(
    (spark, dir) => {
      val (history, _) = ndupSplit(spark, dir)
      val (name, idxDir) = ndupHandle(dir)
      graft.pipeline.TierCommit.breakLock(spark, idxDir)
      graft.operators.NearDupIndex
        .rebuildInPlace(spark, history, name, idxDir)
      ndupAdmissionOnly(spark, dir)
    },
    Some(s"""
      WITH $hashedShingleSqlCte,
      p AS (
        SELECT a.doc_id AS doc_id, b.doc_id AS match_id,
               CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
                 AS jaccard
        FROM s a JOIN s b
          ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0),
      v AS (SELECT doc_id, match_id, jaccard FROM p
            WHERE jaccard >= $JaccardThreshold),
      mj AS (SELECT doc_id, max(jaccard) AS match_jaccard
             FROM v GROUP BY 1),
      bm AS (SELECT v.doc_id, min(v.match_id) AS match_id, mj.match_jaccard
             FROM v JOIN mj ON mj.doc_id = v.doc_id
                           AND v.jaccard = mj.match_jaccard
             GROUP BY 1, 3)
      SELECT d.doc_id,
             CASE WHEN bm.match_id IS NOT NULL THEN 'dup' ELSE 'new' END
               AS verdict,
             bm.match_id, bm.match_jaccard
      FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
      LEFT JOIN bm ON bm.doc_id = d.doc_id
      ORDER BY d.doc_id ASC NULLS FIRST"""))

  // --- q219: ERASURE from the near-dup index (tombstones honored) --------
  // The deletion verb the serving lifecycle lacked (VERDICT r12 #1):
  // an LGPD/GDPR request names documents that must stop mattering NOW,
  // without the full rebuild q185 prices. NearDupIndex.deleteDocs
  // writes a tombstone segment (the same LSM discipline as growth);
  // the probe anti-joins the broadcast tombstone set, so a deleted
  // history document can never surface as a near-dup match again; the
  // next compaction drops its rows physically and clears the ledger.
  //
  // The ORACLE is the deletion identity itself: probe-after-delete ==
  // fresh-build-minus-deleted — q210's exact all-pairs SQL with the
  // deleted population (history ids ≡ 1 mod 7) removed from the
  // history side. Any tombstone leak (a deleted doc still matching) or
  // over-delete (a surviving doc hidden) flips a row.
  //
  // 100 TB posture: the tombstone set is erasure-batch-sized and rides
  // a broadcast anti-join on the already-pruned posting read — probe
  // cost is unchanged; the physical drop is deferred to the compaction
  // the lifecycle already schedules.
  private def ndupDelHandle(dir: String): (String, String) =
    ("ndupd_" + math.abs(dir.hashCode).toString,
      sys.props("java.io.tmpdir") + "/graft-ndupd-index")

  private[graft] def ndupDeleteProbeOnly(spark: SparkSession, dir: String): DataFrame = {
    val (name, idxDir) = ndupDelHandle(dir)
    graft.operators.NearDupIndex
      .probe(spark, name, idxDir, ndupSplit(spark, dir)._2)
      .orderBy(col("a_id").asc_nulls_first, col("b_id").asc_nulls_first)
  }

  private val q219 = Q(
    (spark, dir) => {
      val (history, _) = ndupSplit(spark, dir)
      val (name, idxDir) = ndupDelHandle(dir)
      graft.pipeline.TierCommit.breakLock(spark, idxDir)
      graft.operators.NearDupIndex
        .rebuildInPlace(spark, history, name, idxDir)
      // the erasure batch: history documents with doc_id ≡ 1 (mod 7)
      val delIds = history.filter(pmod(col("doc_id"), lit(7)) === 1)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
      graft.operators.NearDupIndex.deleteDocs(spark, delIds, name, idxDir)
      ndupDeleteProbeOnly(spark, dir)
    },
    Some(s"""
      WITH $hashedShingleSqlCte,
      p AS (
        SELECT least(a.doc_id, b.doc_id) AS a_id,
               greatest(a.doc_id, b.doc_id) AS b_id,
               CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
                 AS jaccard
        FROM s a JOIN s b
          ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
             AND b.doc_id % 7 <> 1)
      SELECT a_id, b_id, jaccard FROM p WHERE jaccard >= $JaccardThreshold
      ORDER BY a_id ASC NULLS FIRST, b_id ASC NULLS FIRST"""))

  val all: Seq[(String, Q)] = Seq(
    "q16_exact_dedup" -> q16,
    "q17_near_dup_lsh" -> q17,
    "q18_simhash_pairs" -> q18,
    "q19_text_stats" -> q19,
    "q20_top_terms" -> q20,
    "q21_quality_score" -> q21,
    "q22_lang_id" -> q22,
    "q23_fingerprint" -> q23,
    "q41_winnowing" -> q41,
    "q24_token_count" -> q24,
    "q34_tfidf_keywords" -> q34,
    "q38_doc_chunking" -> q38,
    "q39_neardup_clusters" -> q39,
    "q43_dedup_survivors" -> q43,
    "q44_data_split" -> q44,
    "q45_decontamination" -> q45,
    "q46_repetition_ratio" -> q46,
    "q47_decontaminate_corpus" -> q47,
    "q48_quality_funnel" -> q48,
    "q49_domain_mixture" -> q49,
    "q50_passage_dedup" -> q50,
    "q51_cross_source_overlap" -> q51,
    "q56_sequence_packing" -> q56,
    "q58_kmv_distinct" -> q58,
    "q61_vocab_overlap" -> q61,
    "q71_pii_scrub" -> q71,
    "q72_cms_counts" -> q72,
    "q82_bloom_decontam" -> q82,
    "q90_dup_gram_coverage" -> q90,
    "q108_substring_dedup" -> q108,
    "q114_containment" -> q114,
    "q148_hll_distinct" -> q148,
    "q175_bpe_fertility" -> q175,
    "q183_split_leakage" -> q183,
    "q193_nb_langid" -> q193,
    "q204_bpe_train" -> q204,
    "q205_bpe_train_batched" -> q205,
    "q207_bpe_serve" -> q207,
    "q209_bpe_vocab_curve" -> q209,
    "q210_neardup_probe" -> q210,
    "q211_bpe_token_ids" -> q211,
    "q214_ingest_admission" -> q214,
    "q219_neardup_delete" -> q219)

  /** Serve-ONLY twins (the probe-only contract of
    * [[VectorQueries.probeOnly]]): open the persisted artifact by
    * (name, dir) and serve — no training/mining, no write anywhere. */
  val probeOnly: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q207_bpe_serve" -> (bpeServeOnly(_, _)),
    "q210_neardup_probe" -> (ndupProbeOnly(_, _)),
    "q211_bpe_token_ids" -> (bpeIdsServeOnly(_, _)),
    "q214_ingest_admission" -> (ndupAdmissionOnly(_, _)),
    "q219_neardup_delete" -> (ndupDeleteProbeOnly(_, _)))
}
