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
  *  - `doclens/seg=<k>/` — (doc_id, source, dl), one tiny row per
  *    document (format 2): the doc-grain sidecar [[deleteDocs]] reads
  *    to subtract exact lengths from the stats, and [[probeWhere]]
  *    aggregates for within-population statistics. Extracting either
  *    doc-grain fact from the postings table instead would cost a full
  *    scan + distinct of a TERM-grain, term-bucketed layout — doclens
  *    answers both with a pushed point read / one narrow aggregate.
  *
  *  - `tombstones/seg=<k>/` — (doc_id, dl): the [[Tombstones]]
  *    deletion ledger; probes anti-join it and subtract its (count,
  *    Σdl) from the summed stats — df(t) self-corrects because it is
  *    computed, never stored. Compaction drops tombstoned rows
  *    physically and clears the ledger.
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
  * Atomic REPLACEMENT of a live index rides the pipeline tier-commit
  * (manifest-pinned rename): [[compactInPlace]]/[[rebuildInPlace]]
  * stage the rewrite at the swap path and publish it through
  * [[graft.pipeline.TierCommit]], so probes see all-old or all-new,
  * never a mixed segment set; [[compactTo]] remains the pure rewrite
  * to a new name for callers managing publication themselves.
  *
  * Reference capability analog: serving queries are index READS, not
  * rebuilds (scripts/query_duckdb.py:12-25 reads loaded tables).
  */
object TextIndex extends SegmentedLifecycle {

  /** Index geometry, fixed at build time and needed again at probe
    * time. PERSISTED as `<dir>/<name>/meta.json` (VERDICT r8 #2) by
    * [[build]] AND [[writeDelta]] (so a stream-built index is just as
    * self-describing; the rewrite is byte-identical, hence
    * replay-idempotent); probe/append/compact read it, so opening an
    * index needs only (name, dir). */
  final case class Meta(buckets: Int)
  type M = Meta

  /** On-disk layout version: format 2 adds the `doclens/seg=<k>/`
    * table — (doc_id, source, dl), one tiny row per document — which
    * [[deleteDocs]] needs to subtract exact per-document lengths from
    * the global stats and [[probeWhere]] needs for within-population
    * statistics. A format-1 index (no key in the sidecar) still PROBES
    * normally — only the two new verbs refuse it with a rebuild
    * message, never a silent wrong answer. */
  val FormatVersion = 2L

  protected def tables: Seq[String] = Seq("postings", "stats", "doclens")

  protected def metaFields(meta: Meta): Map[String, Long] =
    Map("buckets" -> meta.buckets.toLong, "format" -> FormatVersion)

  def readMeta(spark: SparkSession, name: String, dir: String): Meta =
    Meta(IndexMeta.read(spark, s"$dir/$name/meta.json")("buckets").toInt)

  private def requireFormat2(spark: SparkSession, name: String,
                             dir: String, verb: String): Unit = {
    val fmt = IndexMeta.read(spark, s"$dir/$name/meta.json")
      .getOrElse("format", 1L)
    require(fmt == FormatVersion,
      s"bm25 index $name at $dir has layout format $fmt (no doclens " +
        s"table); $verb needs format $FormatVersion — rebuildInPlace " +
        "the index")
  }

  private def tokenize(documents: DataFrame, buckets: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    // ONE tokenize pass feeds all three tables: postings, stats and
    // doclens each derive from `toks`, and the three segment writes are
    // separate jobs — without the checkpoint each write re-tokenized
    // the corpus (3 passes per segment). Lazy: the first write (stats)
    // is the job that materializes it.
    val toks = documents.select(col("doc_id"), col("source"),
      TextOps.tokens(col("text")).as("ts"))
      .select(col("doc_id"), col("source"),
        size(col("ts")).cast("long").as("dl"), col("ts"))
      .localCheckpoint(false)
    val postings = toks
      .select(col("doc_id"), col("source"), col("dl"),
        explode(col("ts")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("source"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("tb", pmod(hash(col("term")), lit(buckets)).cast("int"))
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_tokens"))
    // the doc-grain sidecar table (format 2): one (doc_id, source, dl)
    // row per document — the exact lengths deletion subtracts from the
    // stats and the population probeWhere aggregates; extracting either
    // from the TERM-grain bucketed postings would cost a full
    // scan + distinct
    val doclens = toks.select(col("doc_id"), col("source"), col("dl"))
    (postings, stats, doclens)
  }

  private def writeSegment(postings: DataFrame, stats: DataFrame,
                           doclens: DataFrame, root: String,
                           seg: Long): Unit = {
    stats.write.mode("overwrite").parquet(s"$root/stats/seg=$seg")
    doclens.write.mode("overwrite").parquet(s"$root/doclens/seg=$seg")
    postings.write.mode("overwrite").partitionBy("tb")
      .parquet(s"$root/postings/seg=$seg")
  }

  /** ONE segment's payload — tokenize once, write postings + stats +
    * doclens. The lifecycle around it (build/appendDelta/writeDelta/
    * compact/rebuild, locks, failed-append cleanup of ALL THREE tables
    * — a stats/seg=N committed without its postings twin would corrupt
    * every probe's global n_docs sum — and first-delta sidecar
    * publication) is [[SegmentedLifecycle]]'s single shared skeleton
    * (VERDICT r12 #7). */
  protected def writeSegmentData(spark: SparkSession, data: DataFrame,
                                 root: String, meta: Meta,
                                 seg: Long): Unit = {
    val (p, s, d) = tokenize(data, meta.buckets)
    writeSegment(p, s, d, root, seg)
  }

  /** Tokenize `documents` = (doc_id, source, text) once and persist
    * the index under `<dir>/<name>` as segment 0. */
  def build(spark: SparkSession, documents: DataFrame, name: String,
            dir: String, buckets: Int = 16): Meta =
    build(spark, documents, name, dir, Meta(buckets))

  /** Compaction is a postings-level merge (documents are
    * segment-disjoint, so the merge is a re-partitioned union; nothing
    * re-tokenizes) with the stats RECOMPUTED from the surviving
    * doclens rows — exact, because doclens is the doc-grain source of
    * truth the per-segment sums derive from. Tombstoned documents'
    * rows are physically dropped and the ledger cleared (not copied).
    * Probe answers are identical by construction; TextIndexSpec proves
    * it bit-for-bit. */
  protected def compactToRoot(spark: SparkSession, name: String,
                              dir: String, newRoot: String,
                              meta: Meta): Unit = {
    requireFormat2(spark, name, dir, "compaction")
    // compaction drains the deletion ledger: tombstoned documents'
    // postings and doclens rows are physically dropped, the compacted
    // stats are RECOMPUTED from the surviving doclens rows (exact —
    // doclens is the doc-grain source of truth the per-segment sums
    // derive from), and the tombstone segments are NOT copied
    val tombs = s"$dir/$name/tombstones"
    val postings = Tombstones.antiJoin(spark, tombs,
        spark.read.parquet(s"$dir/$name/postings"), "doc_id")
      .select(col("term"), col("doc_id"), col("source"), col("dl"),
        col("tf"), col("tb"))
    val doclens = Tombstones.antiJoin(spark, tombs,
        spark.read.parquet(s"$dir/$name/doclens"), "doc_id")
      .select(col("doc_id"), col("source"), col("dl"))
    val stats = doclens.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(col("dl")), lit(0L)).as("total_tokens"))
    writeSegment(postings, stats, doclens, newRoot, seg = 0L)
    IndexMeta.write(spark, s"$newRoot/meta.json", metaFields(meta))
  }

  /** Tombstone `ids` (VERDICT r12 #1): every subsequent [[probe]]/
    * [[probeWhere]] behaves as if the documents were never indexed —
    * the q218 oracle identity is probe-after-delete ==
    * fresh-build-minus-deleted — and the next compaction drops their
    * rows physically and clears the ledger.
    *
    * BM25 is the HARD deletion case: unlike the row-suppression
    * families (signatures, cells, band postings), the score depends on
    * CROSS-SEGMENT statistics — n_docs and total_tokens feed every
    * document's length normalization, and df(t) feeds every idf. So a
    * tombstone here records (doc_id, dl) — the deleted document's
    * length, fetched from the doclens table at delete time — and the
    * probe subtracts (count, Σdl) from the segment-summed stats, while
    * df(t) self-corrects because it is COMPUTED from the pruned
    * posting lists after the tombstone anti-join (never stored — the
    * round-8 design choice that makes deletion exact for free).
    *
    * Rides the dir's writer lock; re-deleting or deleting unknown ids
    * is absorbed by [[Tombstones.append]]'s dedupe (an id absent from
    * doclens contributes no tombstone row — nothing to subtract).
    * Erasure batches are small by contract (the ids route as a pushed
    * In point read of doclens). */
  def deleteDocs(spark: SparkSession, ids: Seq[Long], name: String,
                 dir: String): Unit =
    graft.pipeline.TierCommit.withWriteLock(spark, dir) {
      require(segmentIds(spark, name, dir).nonEmpty,
        s"index $name has no segments")
      requireFormat2(spark, name, dir, "deletion")
      val dl = spark.read.parquet(s"$dir/$name/doclens")
        .filter(col("doc_id").isin(ids: _*)) // pushed point read
        .select(col("doc_id"), col("dl"))
      Tombstones.append(spark, s"$dir/$name/tombstones", dl)
    }

  /** Atomically REPLACE live index `name` with a FULL REBUILD from
    * `documents` — the retrain path [[appendDelta]] deliberately does
    * not cover (new corpus snapshot, changed bucket count):
    * [[SegmentedLifecycle.rebuildInPlaceWith]]'s stage-then-manifest-
    * commit discipline. */
  def rebuildInPlace(spark: SparkSession, documents: DataFrame,
                     name: String, dir: String, buckets: Int = 16): Unit =
    rebuildInPlaceWith(spark, documents, name, dir, Meta(buckets))

  private[graft] def stageRebuildInPlace(spark: SparkSession,
                                         documents: DataFrame, name: String,
                                         dir: String, buckets: Int): Unit =
    stageRebuildWith(spark, documents, name, dir, Meta(buckets))

  /** One BM25 term contribution — q91's EXACT arithmetic (operand
    * order pinned; the oracle replays it character for character).
    * The score formula is shared between the name-keyed form (q91's
    * in-plan scorer, whose terms are identifier-safe SQL constants)
    * and the index-keyed form the probe uses, so the two can't drift. */
  private def bm25Core(tf: Column, df: Column): Column = {
    val idf = length(bin(lit(1L) +
      Sampling.ldiv(col("n_docs"), df + lit(1L)))).cast("long")
    val dlr = (col("dl") * col("n_docs")).cast("double") /
      col("total_tokens").cast("double")
    ((tf.cast("double") * lit(2.2)) * idf.cast("double")) /
      (tf.cast("double") + (lit(0.3) + lit(0.9) * dlr))
  }

  /** Name-keyed contribution over `tf_<term>`/`df_<term>` columns. */
  def bm25Term(t: String): Column = bm25Core(col(s"tf_$t"), col(s"df_$t"))

  /** Index-keyed contribution over `tf_<i>`/`df_<i>` columns — the
    * probe folds postings POSITIONALLY by query-term index, so a term
    * containing '.' or '`' (legal postings content, but a nested-field
    * reference to the column resolver) probes fine (ADVICE r8). */
  def bm25TermAt(i: Int): Column = bm25Core(col(s"tf_$i"), col(s"df_$i"))

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
            terms: Seq[String], topk: Int): DataFrame = {
    require(terms.nonEmpty, "empty query")
    require(segmentIds(spark, name, dir).nonEmpty,
      s"index $name has no segments")
    val meta = readMeta(spark, name, dir)
    val tombs = s"$dir/$name/tombstones"
    // global stats = segment sums MINUS the tombstoned documents'
    // (count, Σdl) — the payload deleteDocs recorded; df(t) needs no
    // correction because it is computed from the pruned lists AFTER
    // the tombstone anti-join (deletion is exact by construction)
    val base = spark.read.parquet(s"$dir/$name/stats")
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("total_tokens")).as("total_tokens"))
    val stats = Tombstones.read(spark, tombs) match {
      case Some(t) =>
        val sub = t.agg(count(lit(1)).as("__dn"),
          coalesce(sum(col("dl")), lit(0L)).as("__dt"))
        base.crossJoin(broadcast(sub)) // 1 row x 1 row
          .select((col("n_docs") - col("__dn")).as("n_docs"),
            (col("total_tokens") - col("__dt")).as("total_tokens"))
      case None => base
    }
    val p = Tombstones.antiJoin(spark, tombs,
      prunedPostings(spark, name, dir, terms, meta), "doc_id")
    scoreTopK(p, stats, terms, topk)
  }

  /** WITHIN-POPULATION filtered probe (VERDICT r12 #8) — the q216
    * passenger discipline applied to BM25: `where` is a predicate over
    * the passenger columns denormalized into every posting row (source
    * — the dl/source impact-file layout), pushed into the pruned
    * posting read, so only matching documents are scored AND the
    * statistics are those of the filtered population: n_docs and
    * total_tokens come from the doclens rows matching `where` (one
    * narrow doc-grain aggregate — document-count-sized, never a corpus
    * scan), and df(t) is the filtered pruned lists' length. The result
    * is EXACTLY a fresh BM25 index built over the subpopulation —
    * the oracle identity q221 checks.
    *
    * Semantics choice, stated explicitly: within-population IDF, not
    * global-IDF. A term rare overall but common inside the filtered
    * population scores LOW here (the population is the retrieval
    * universe — the "search only my wiki" reading). Global-IDF
    * filtering — rank by corpus-wide statistics, then restrict — is
    * the other defensible reading and is exactly [[probe]] followed by
    * a predicate on the returned rows when k is oversampled (the q215
    * post-filter trade). Tombstoned documents are excluded from
    * population, candidates, and statistics alike. */
  def probeWhere(spark: SparkSession, name: String, dir: String,
                 terms: Seq[String], topk: Int,
                 where: Column): DataFrame = {
    require(terms.nonEmpty, "empty query")
    require(segmentIds(spark, name, dir).nonEmpty,
      s"index $name has no segments")
    requireFormat2(spark, name, dir, "probeWhere")
    val meta = readMeta(spark, name, dir)
    val tombs = s"$dir/$name/tombstones"
    val pop = Tombstones.antiJoin(spark, tombs,
      spark.read.parquet(s"$dir/$name/doclens"), "doc_id").filter(where)
    val stats = pop.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(col("dl")), lit(0L)).as("total_tokens"))
    val p = Tombstones.antiJoin(spark, tombs,
      prunedPostings(spark, name, dir, terms, meta), "doc_id").filter(where)
    scoreTopK(p, stats, terms, topk)
  }

  /** The directory-pruned posting read: route each term to its bucket
    * via the writer's own hash (|terms| rows collected — the
    * per-request routing an IR frontend does), filter `tb IN` (static
    * directory pruning) then the term row filter within buckets. */
  private def prunedPostings(spark: SparkSession, name: String,
                             dir: String, terms: Seq[String],
                             meta: Meta): DataFrame = {
    val ids = spark.createDataFrame(terms.map(Tuple1(_))).toDF("term")
      .select(pmod(hash(col("term")), lit(meta.buckets)).cast("int"))
      .collect().map(_.getInt(0)).distinct.toSeq
    spark.read.parquet(s"$dir/$name/postings")
      .filter(col("tb").isin(ids: _*)     // static directory pruning
        && col("term").isin(terms: _*))   // row filter within buckets
  }

  /** The scoring fold shared by [[probe]] and [[probeWhere]]: fold the
    * ≤|terms| postings per doc into one row of tf columns, keyed
    * POSITIONALLY by query-term index — the term string itself never
    * becomes a column name, so any legal postings key probes; df(t) =
    * pruned list length (absent terms contribute df = 0, exactly q91's
    * sum(CASE WHEN tf_t > 0 THEN 1 ELSE 0 END)); score with the
    * q91-exact BM25 against the supplied one-row stats. */
  private def scoreTopK(p: DataFrame, stats: DataFrame,
                        terms: Seq[String], topk: Int): DataFrame = {
    val idx = terms.zipWithIndex
    // NOTE: p (the pruned posting read) is deliberately NOT checkpointed
    // here although both the tf fold and the df aggregate read it: the
    // probe plan must carry the pruned FileScan itself (TextIndexSpec
    // asserts directory pruning + pushed filters ON THE PLAN — an
    // ExistingRDD would hide the evidence), and the double read is
    // bounded by the queried terms' buckets, never the corpus.
    val tfs = idx.map { case (t, i) =>
      sum(when(col("term") === t, col("tf")).otherwise(0L)).as(s"tf_$i") }
    val cand = p.groupBy(col("doc_id"), col("source"), col("dl"))
      .agg(tfs.head, tfs.tail: _*)
    val dfs = idx.map { case (t, i) =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"df_$i") }
    val dfRow = p.agg(dfs.head, dfs.tail: _*)
    val st = stats.crossJoin(broadcast(dfRow)) // 1 row × 1 row
    val score = idx.map { case (_, i) => bm25TermAt(i) }
      .reduce(_ + _).as("score")
    cand.crossJoin(broadcast(st))
      .select(col("doc_id"), col("source"), col("dl"), score)
      .orderBy(col("score").desc_nulls_last, col("doc_id"))
      .limit(topk)
  }
}
