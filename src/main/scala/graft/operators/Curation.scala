package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The quality-funnel and domain-mixture decision rules — the single
  * source of truth shared by the batch queries (TextQueries q48/q49)
  * and the streaming curation path ([[graft.streaming.CurationStream]]),
  * so the two paths cannot drift apart (the same seam discipline as
  * TextOps' banding geometry for q17 vs NearDupStream).
  *
  * Every rule is a deterministic pure function of the document row
  * (integer comparisons, salted md5 bucket) — no RNG, no state, no
  * order dependence — so the SAME document gets the SAME verdict on any
  * cluster, any partitioning, any micro-batching, any rerun. That
  * property is what makes the streaming form trivially exactly-once
  * and the batch/stream equivalence provable.
  */
object Curation {

  /** Stopword list for the quality floor (tiny by design — the corpus
    * vocabulary is synthetic; a production list is a broadcast set). */
  val Stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in")

  /** Funnel stage 1: token-count bounds (inclusive). */
  val LenMin = 20
  val LenMax = 90

  /** Per-doc funnel flags. One map-side pass over text for token/stop
    * counts plus the bigram agg (hash-partitioned by doc_id) for the
    * repetition cap; joined on doc_id. Output: (doc_id, source, p_len,
    * p_rep, p_stop).
    *
    * Thresholds are compared in integer space so no float crosses an
    * engine boundary: rep cap rep_ratio <= 0.08 as 25*max_rep <=
    * 2*n_bigrams; stopword floor ratio >= 0.02 as 50*n_stop >=
    * n_tokens. A doc with <2 tokens has no bigram row — repetition
    * passes vacuously and the length stage drops it anyway. */
  def funnelFlags(docs: DataFrame): DataFrame = {
    val t = TextOps.tokens(col("text"))
    val stop = array(Stopwords.map(lit): _*)
    val stats = docs.select(col("doc_id"), col("source"),
      size(t).cast("long").as("nt"),
      size(filter(t, x => array_contains(stop, x))).cast("long").as("nstop"))
    val rep = TextOps.explodedShingles(docs, "doc_id", "text", 2)
      .groupBy(col("doc_id"), col("s")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("nb"), max(col("c")).as("mr"))
    stats.join(rep, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        (col("nt") >= LenMin && col("nt") <= LenMax).as("p_len"),
        (coalesce(col("mr"), lit(0L)) * 25
          <= coalesce(col("nb"), lit(0L)) * 2).as("p_rep"),
        (col("nstop") * 50 >= col("nt")).as("p_stop"))
  }

  /** Mixture target rate in permille for a source (the mixture config;
    * here a pure function of the source index — in production a tiny
    * broadcast table). A source with no digits has a null index, falls
    * through every when() and takes the 750 default — try_cast (not
    * cast) so the rule is ANSI-safe and the DuckDB oracle's TRY_CAST
    * mirrors it instead of erroring. */
  def ratePermille(source: Column): Column = {
    val idx = regexp_replace(source, "[^0-9]", "").try_cast("int")
    when(idx % 4 === 0, 1000L).when(idx % 4 === 1, 500L)
      .when(idx % 4 === 2, 250L).otherwise(750L)
  }

  /** Salted md5 bucket of the doc id in [0, 1000) — the deterministic
    * coin every keep/drop decision flips. */
  def mixtureBucket(docId: Column): Column =
    conv(substring(md5(concat(lit("mix|"), docId.cast("string"))), 1, 7), 16, 10)
      .cast("long") % 1000

  /** Keep rule: bucket below the source's target rate. */
  def mixtureKeep(docId: Column, source: Column): Column =
    mixtureBucket(docId) < ratePermille(source)

  /** The full curation decision — funnel pass AND mixture keep:
    * (doc_id, source) of every surviving document. */
  def keptDocs(docs: DataFrame): DataFrame =
    funnelFlags(docs)
      .filter(col("p_len") && col("p_rep") && col("p_stop"))
      .filter(mixtureKeep(col("doc_id"), col("source")))
      .select(col("doc_id"), col("source"))

  /** Per-TRAIN-doc distinct-5-gram eval-overlap counts — the
    * decontamination measurement core shared by TextQueries q45/q47 and
    * the curated-corpus write path ([[graft.pipeline.CuratedCorpus]]).
    * Eval slice = doc_id % 10 == 0 (in production: the actual benchmark
    * corpus). Output: (doc_id, n_grams, n_hits) for every train doc
    * with at least one 5-gram.
    *
    * Scale shape: the gram TEXT never shuffles — each gram is projected
    * map-side to a 120-bit md5-derived key (two longs, 16 bytes vs the
    * ~30-60-byte gram string; collision odds at even 10^15 grams are
    * ~1e-6, and a collision only over-counts one hit). One distinct on
    * (doc_id, h) then ONE hash-partitioned window over h marks grams
    * that appear anywhere in the eval slice — no join, no diamond, no
    * persist; the corpus text is scanned exactly once. The eval slice
    * here is a 10% doc_id carve-out, so it rides the same hash
    * partitioning as the train side (NOT a broadcast — that only
    * applies when the eval set is a real bounded benchmark corpus). */
  def contaminationCounts(docs: DataFrame): DataFrame = {
    val grams = gramKeys(docs)
    // eval-presence flag per gram: a windowed max over the hash key —
    // the oracle replays the identical window over md5(s) (the 128-bit
    // hex; equivalent grouping absent md5 collisions)
    val hit = max(when(isEval(col("doc_id")), 1L).otherwise(0L))
      .over(org.apache.spark.sql.expressions.Window.partitionBy(col("h1"), col("h2")))
    grams.withColumn("__hit", hit)
      .filter(!isEval(col("doc_id")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("__hit")).as("n_hits"))
  }

  /** The eval-slice rule: doc_id % 10 == 0 (q44/q45's carve-out; in
    * production a membership test against the benchmark corpus).
    * Shared by the batch queries and [[graft.streaming.DecontamStream]]. */
  def isEval(docId: Column): Column = docId % 10 === 0

  /** Distinct md5-derived 120-bit gram keys per doc: (doc_id, h1, h2) —
    * the map-side projection that keeps gram TEXT off the wire (two
    * longs, 16 bytes vs the ~30-60-byte gram string). */
  def gramKeys(docs: DataFrame): DataFrame =
    TextOps.explodedShingles(docs, "doc_id", "text", 5)
      .withColumn("__h", md5(col("s")))
      .select(col("doc_id"),
        conv(substring(col("__h"), 1, 15), 16, 10).cast("long").as("h1"),
        conv(substring(col("__h"), 16, 15), 16, 10).cast("long").as("h2"))
      .distinct()

  /** The contamination drop RULE (q47): eval overlap reaches HALF the
    * doc's distinct 5-grams, compared in integer space so no float
    * crosses an engine boundary. */
  def contaminationDrop(nGrams: Column, nHits: Column): Column =
    nHits * 2 >= nGrams

  /** Decontamination drop set over a static corpus. Train docs too
    * short to produce a 5-gram have no counts row and are kept. */
  def contaminationDropIds(docs: DataFrame): DataFrame =
    contaminationCounts(docs)
      .filter(contaminationDrop(col("n_grams"), col("n_hits")))
      .select(col("doc_id"))

  /** Near-dup LOSERS under q43's survivor rule: members of any near-dup
    * cluster EXCEPT its best-quality member (type-token ratio, smallest
    * doc_id as tiebreak — exact-integer-division ranking, bit-identical
    * across engines). Computed over whatever corpus slice is passed in;
    * docs in no cluster never appear. Scale: pairs come from the banded
    * LSH join ([[TextOps.nearDupPairs]]), clusters from the
    * pointer-jumped min-label propagation ([[GraphOps]]) — both
    * all-pairs-free; the survivor pick is one hash agg over cluster
    * members (a vanishing fraction of the corpus). */
  def nearDupLoserIds(docs: DataFrame): DataFrame = {
    val clusters = GraphOps
      .connectedComponents(TextOps.nearDupPairs(docs, "doc_id", "text"), "a_id", "b_id")
      .select(col("node").as("doc_id"), col("cluster_id"))
    val t = TextOps.tokens(col("text"))
    val quality = docs.select(col("doc_id"),
      (size(array_distinct(t)).cast("double") / size(t)).as("ttr"))
    val survivors = clusters.join(quality, Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(max_by(col("doc_id"), struct(col("ttr"), -col("doc_id"))).as("doc_id"))
    clusters.select(col("doc_id"))
      .join(survivors.select(col("doc_id")), Seq("doc_id"), "left_anti")
  }
}
