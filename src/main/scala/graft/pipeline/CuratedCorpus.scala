package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Curation

/** The curated-corpus WRITE PATH — the step a real user runs after the
  * accounting queries say the cascade is right: materialize the corpus
  * that survives the full curation cascade, plus the per-source release
  * manifest that documents exactly what each stage removed.
  *
  * Cascade (training-pipeline order; every rule is the single-source-of-
  * truth seam the corresponding query checks against the DuckDB oracle):
  *   1. eval carve-out  — keep train docs only (doc_id % 10 != 0, the
  *      q44/q45 slice);
  *   2. decontamination — drop docs overlapping the eval set on >= half
  *      their distinct 5-grams ([[Curation.contaminationDropIds]], q47);
  *   3. near-dup dedup  — within what remains, drop every cluster member
  *      except its best-quality survivor
  *      ([[Curation.nearDupLoserIds]], q43's rule);
  *   4. quality funnel  — C4/Gopher-style length / repetition / stopword
  *      gates ([[Curation.funnelFlags]], q48);
  *   5. domain mixture  — deterministic salted-bucket resampling at each
  *      source's target rate ([[Curation.mixtureKeep]], q49).
  *
  * Output layout under `outDir`:
  *   docs/      the surviving documents, hive-partitioned by source
  *   manifest/  one row per source: n_docs, n_train, after_decontam,
  *              after_neardup, after_quality, n_kept (monotone funnel)
  *
  * Both writes go through [[Pipeline.swapWrite]] — the corpus is never
  * visible in a partial state, a crash between the two renames self-heals
  * on the next [[Pipeline.pathExists]], and a rerun is a full replace
  * (idempotent, the reference's own load semantics; load.py:18-28).
  * Every stage decision is a deterministic pure function of the document
  * row, so a rerun reproduces the corpus bit-for-bit.
  *
  * Scale posture (100 TB): the drop sets (contaminated ids, cluster
  * losers) are tiny relative to the corpus and enter as anti-joins (AQE
  * broadcasts them when small); the expensive subtrees — the 5-gram
  * window and the MinHash/LSH pipeline — run exactly once each (the id
  * sets are persisted while the ledger materializes, then released). The
  * per-doc verdict ledger is ~30 bytes/row, persisted for the two
  * consumers (manifest agg + kept-id semi-join) and released before
  * return. The final write shuffles nothing beyond the partitionBy
  * layout.
  */
object CuratedCorpus {

  /** Run the cascade over `docs` (schema: doc_id, text, lang, source,
    * n_chars) and write corpus + manifest under `outDir`. Returns the
    * manifest as re-read from disk (what a release consumer sees). */
  def write(spark: SparkSession, docs: DataFrame, outDir: String): DataFrame = {
    // Stage 2 drop set: tiny by construction (contaminated train docs).
    // Persisted + materialized so the 5-gram window runs once even
    // though the set feeds both the ledger join and (via the stage-3
    // input) the near-dup pair generation.
    val contam = Curation.contaminationDropIds(docs).persist()
    contam.count()
    try {
      val decon = docs.filter(col("doc_id") % 10 =!= 0)
        .join(contam, Seq("doc_id"), "left_anti")
      val losers = Curation.nearDupLoserIds(decon)

      // Per-doc verdict ledger: one boolean per cascade stage,
      // cumulative, so the manifest is ONE conditional-sum aggregate
      // (q48's shape) and the kept set is a filter — no per-stage
      // recomputation. Funnel flags are pure per-doc functions, so
      // computing them corpus-wide gives identical values to computing
      // them on survivors only.
      val ledger = Curation.funnelFlags(docs)
        .withColumn("s_train", col("doc_id") % 10 =!= 0)
        .join(contam.withColumn("__c", lit(true)), Seq("doc_id"), "left")
        .join(losers.withColumn("__l", lit(true)), Seq("doc_id"), "left")
        .withColumn("s_decon", col("s_train") && col("__c").isNull)
        .withColumn("s_dedup", col("s_decon") && col("__l").isNull)
        .withColumn("s_quality",
          col("s_dedup") && col("p_len") && col("p_rep") && col("p_stop"))
        .withColumn("s_kept",
          col("s_quality") && Curation.mixtureKeep(col("doc_id"), col("source")))
        .select("doc_id", "source", "s_train", "s_decon", "s_dedup",
          "s_quality", "s_kept")
        .persist()
      try {
        val manifest = ledger.groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("s_train"), 1L).otherwise(0L)).as("n_train"),
          sum(when(col("s_decon"), 1L).otherwise(0L)).as("after_decontam"),
          sum(when(col("s_dedup"), 1L).otherwise(0L)).as("after_neardup"),
          sum(when(col("s_quality"), 1L).otherwise(0L)).as("after_quality"),
          sum(when(col("s_kept"), 1L).otherwise(0L)).as("n_kept"))
          .orderBy(col("source"))
        val kept = docs.join(
          ledger.filter(col("s_kept")).select("doc_id"), Seq("doc_id"), "left_semi")

        // corpus BEFORE manifest: a crash in between leaves a corpus
        // with no manifest (detectably incomplete release) rather than
        // a manifest describing a corpus that is not there
        Pipeline.swapWrite(spark, kept, s"$outDir/docs", partitionBy = Seq("source"))
        Pipeline.swapWrite(spark, manifest, s"$outDir/manifest")
      } finally ledger.unpersist()
    } finally contam.unpersist()
    spark.read.parquet(s"$outDir/manifest")
  }
}
