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
}
