package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted (BM25) index — the [[IvfIndex]]/[[IvfPqIndex]]
  * serving discipline applied to lexical retrieval: q91 recomputes
  * per-document term frequencies with a full corpus scan inside every
  * query, which is the evaluation harness's honesty, but a serving
  * system tokenizes ONCE, writes the postings, and answers queries by
  * reading only the queried terms' lists.
  *
  * The index is SEGMENTED (the LSM discipline): `build` writes
  * segment 0, [[appendDelta]] adds new documents as further segments
  * without touching existing ones (tokenize cost = the delta only),
  * and [[compactTo]] rewrites all segments into one. A probe reads
  * the union of segments and is BIT-IDENTICAL before and after either
  * operation, and to a fresh rebuild on the full corpus — BM25's
  * global statistics distribute over segments (n_docs/total_tokens
  * are sums of per-segment one-row stats; df(t) counts the unioned
  * pruned lists), so segment structure is unobservable in answers.
  * Layout under `<dir>/<name>/` — `seg` is itself a hive partition
  * level, so one read of each root sees every segment with uniform
  * partition discovery:
  *
  *  - `postings/seg=<k>/tb=<b>/` — (term, doc_id, source, dl, tf)
  *    HIVE-PARTITIONED by segment and by
  *    tb = pmod(hash(term), buckets): a probe filters
  *    `tb IN (<query-term buckets>)`, which prunes at the DIRECTORY
  *    level in FileSourceStrategy — the read cost is the queried
  *    terms' buckets, never the corpus. Document length and source
  *    are DENORMALIZED into the posting row (classic impact-file
  *    layout) so scoring needs no doc-table join at all.
  *
  *    Why hive partitioning and not bucketBy: Spark's
  *    DisableUnnecessaryBucketedScan rule (autoBucketedScan, on by
  *    default) DROPS a bucketed scan — and with it bucket pruning —
  *    whenever no downstream operator consumes the bucket
  *    partitioning, which is exactly a probe's shape (its aggregates
  *    key on doc_id, not term; measured on this plan). Partition-
  *    directory pruning has no such planner coupling, and any reader
  *    gets it.
  *
  *  - `stats/seg=<k>/` — ONE row (n_docs, total_tokens) per segment:
  *    the corpus constants BM25's length normalization needs,
  *    broadcast by construction; a probe sums them.
  *
  * Per-term document frequency is NOT persisted: a posting exists iff
  * tf > 0, so df(t) = the pruned lists' per-term row count — one tiny
  * aggregate over data the probe reads anyway (and it can never drift
  * from the postings the way a stored df could after a partial
  * rewrite).
  *
  * Scoring is bit-compatible with q91's in-plan scorer: same integer
  * idf (length(bin(1 + n_docs // (df+1)))), same pinned-association
  * double arithmetic (IEEE doubles are deterministic given operand
  * order), same Robertson/Okapi constants folded to 2.2 / 0.3 / 0.9.
  *
  * Atomic REPLACEMENT of a live index (swap compacted for segmented)
  * is deliberately not this operator's job — that is the pipeline
  * tier-commit's (manifest-pinned rename); compactTo is a pure
  * rewrite to a new name the committer can then publish.
  *
  * Reference capability analog: serving queries are index READS, not
  * rebuilds (scripts/query_duckdb.py:12-25 reads loaded tables).
  */
object TextIndex {

  final case class Meta(buckets: Int)

  /** Existing segment ids, ascending (driver-side metadata listing —
    * segment counts are compaction-bounded). `seg` is itself a hive
    * partition level (`postings/seg=<k>/tb=<b>/`), so ONE read of the
    * postings root sees every segment with uniform discovery, and the
    * tb directory pruning applies across all of them. */
  def segmentIds(spark: SparkSession, name: String, dir: String)
      : Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(s"$dir/$name/postings")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("seg="))
      .map(_.getPath.getName.stripPrefix("seg=").toLong)
      .sorted
  }

  private def tokenize(documents: DataFrame, buckets: Int)
      : (DataFrame, DataFrame) = {
    val toks = documents.select(col("doc_id"), col("source"),
      TextOps.tokens(col("text")).as("ts"))
      .select(col("doc_id"), col("source"),
        size(col("ts")).cast("long").as("dl"), col("ts"))
    val postings = toks
      .select(col("doc_id"), col("source"), col("dl"),
        explode(col("ts")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("source"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("tb", pmod(hash(col("term")), lit(buckets)).cast("int"))
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_tokens"))
    (postings, stats)
  }

  private def writeSegment(postings: DataFrame, stats: DataFrame,
                           root: String, seg: Long): Unit = {
    stats.write.mode("overwrite").parquet(s"$root/stats/seg=$seg")
    postings.write.mode("overwrite").partitionBy("tb")
      .parquet(s"$root/postings/seg=$seg")
  }

  /** Tokenize `documents` = (doc_id, source, text) once and persist
    * the index under `<dir>/<name>` as segment 0. */
  def build(spark: SparkSession, documents: DataFrame, name: String,
            dir: String, buckets: Int = 16): Meta = {
    val (p, s) = tokenize(documents, buckets)
    writeSegment(p, s, s"$dir/$name", seg = 0L)
    Meta(buckets)
  }

  /** Append `newDocuments` as the next segment. Tokenize/write cost is
    * the DELTA only; existing segments are never read or touched.
    * Contract: doc_ids must be disjoint from already-indexed ones
    * (append-only corpus — the same contract a doc store gives its
    * index). */
  def appendDelta(spark: SparkSession, newDocuments: DataFrame,
                  name: String, dir: String, meta: Meta): Unit = {
    val segs = segmentIds(spark, name, dir)
    require(segs.nonEmpty, s"index $name has no base segment")
    writeDelta(spark, newDocuments, name, dir, meta, segId = segs.max + 1L)
  }

  /** [[appendDelta]] with a CALLER-CHOSEN segment id — the streaming
    * ingestion path: a foreachBatch sink passes its batchId, and
    * because each segment directory is written with mode=overwrite, a
    * redelivered batch rewrites seg=<batchId> with identical content —
    * replays are absorbed BY IDEMPOTENCE, no ledger needed (the
    * BloomStream discipline). TextIndexSpec proves stream-built ==
    * batch-built and replay no-op. */
  def writeDelta(spark: SparkSession, newDocuments: DataFrame,
                 name: String, dir: String, meta: Meta,
                 segId: Long): Unit = {
    val (p, s) = tokenize(newDocuments, meta.buckets)
    writeSegment(p, s, s"$dir/$name", segId)
  }

  /** Rewrite ALL of `name`'s segments into `newName`'s single seg=0 —
    * a postings-level merge (documents are segment-disjoint, so the
    * merge is a re-partitioned union; nothing re-tokenizes) plus a
    * one-row stats sum. Probe answers are identical by construction;
    * TextIndexSpec proves it bit-for-bit. */
  def compactTo(spark: SparkSession, name: String, dir: String,
                newName: String, meta: Meta): Meta = {
    require(segmentIds(spark, name, dir).nonEmpty,
      s"index $name has no segments")
    val postings = spark.read.parquet(s"$dir/$name/postings")
      .select(col("term"), col("doc_id"), col("source"), col("dl"),
        col("tf"), col("tb"))
    val stats = spark.read.parquet(s"$dir/$name/stats")
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("total_tokens")).as("total_tokens"))
    writeSegment(postings, stats, s"$dir/$newName", seg = 0L)
    meta
  }

  /** One BM25 term contribution — q91's EXACT arithmetic (operand
    * order pinned; the oracle replays it character for character). */
  def bm25Term(t: String): Column = {
    val idf = length(bin(lit(1L) +
      Sampling.ldiv(col("n_docs"), col(s"df_$t") + lit(1L)))).cast("long")
    val dlr = (col("dl") * col("n_docs")).cast("double") /
      col("total_tokens").cast("double")
    ((col(s"tf_$t").cast("double") * lit(2.2)) * idf.cast("double")) /
      (col(s"tf_$t").cast("double") + (lit(0.3) + lit(0.9) * dlr))
  }

  /** Probe the persisted index with a literal term list: read ONLY the
    * queried terms' partitions of every segment (directory-pruned; the
    * bucket ids are computed with the SAME hash the writer used — the
    * serving-side routing decision, |terms| rows), fold them to one
    * row per matched document, score with the q91-exact BM25 against
    * the segment-summed global stats, and return the top-`topk`
    * (doc_id, source, dl, score). Matched-docs semantics: a document
    * with no query term never surfaces (real retrieval returns fewer
    * than k when fewer match — it does not pad with zero-score rows).
    * The probe plan touches no corpus table: TextIndexSpec asserts
    * partition pruning and the absence of any documents scan. */
  def probe(spark: SparkSession, name: String, dir: String,
            terms: Seq[String], meta: Meta, topk: Int): DataFrame = {
    require(terms.nonEmpty, "empty query")
    require(segmentIds(spark, name, dir).nonEmpty,
      s"index $name has no segments")
    val stats = spark.read.parquet(s"$dir/$name/stats")
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("total_tokens")).as("total_tokens"))
    // route: term -> partition id via the writer's own hash (|terms|
    // rows collected — the per-request routing an IR frontend does)
    val ids = spark.createDataFrame(terms.map(Tuple1(_))).toDF("term")
      .select(pmod(hash(col("term")), lit(meta.buckets)).cast("int"))
      .collect().map(_.getInt(0)).distinct.toSeq
    val p = spark.read.parquet(s"$dir/$name/postings")
      .filter(col("tb").isin(ids: _*)     // static directory pruning
        && col("term").isin(terms: _*))   // row filter within buckets
    // fold the ≤|terms| postings per doc into one row of tf_t columns
    val tfs = terms.map(t =>
      sum(when(col("term") === t, col("tf")).otherwise(0L)).as(s"tf_$t"))
    val cand = p.groupBy(col("doc_id"), col("source"), col("dl"))
      .agg(tfs.head, tfs.tail: _*)
    // df(t) = pruned list length; absent terms contribute df = 0,
    // exactly q91's sum(CASE WHEN tf_t > 0 THEN 1 ELSE 0 END)
    val dfs = terms.map(t =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"df_$t"))
    val dfRow = p.agg(dfs.head, dfs.tail: _*)
    val st = stats.crossJoin(broadcast(dfRow)) // 1 row × 1 row
    val score = terms.map(bm25Term).reduce(_ + _).as("score")
    cand.crossJoin(broadcast(st))
      .select(col("doc_id"), col("source"), col("dl"), score)
      .orderBy(col("score").desc_nulls_last, col("doc_id"))
      .limit(topk)
  }
}
