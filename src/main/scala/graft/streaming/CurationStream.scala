package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Streaming curation — the quality funnel + domain-mixture sampler
  * (TextQueries q48/q49's decision rules) applied to documents as they
  * ARRIVE, maintaining a persisted table of surviving documents. The
  * E4 counterpart of [[NearDupStream]] (E2) and
  * [[EventStreams.dedupStream]] (E1): batch and stream share one rule
  * implementation ([[Curation]]), so micro-batching cannot change WHAT
  * survives — only when it lands.
  *
  * Why this is trivially exactly-once: every rule is a deterministic
  * pure function of the document row alone (no cross-document state,
  * unlike near-dup), so a replayed micro-batch (foreachBatch's
  * at-least-once contract after a crash) re-derives the same verdicts
  * and [[EventStreams.mergeBatch]]'s keyed upsert absorbs them as a
  * no-op. There is no index to keep consistent and no crash window to
  * order merges around.
  *
  * Scale posture: per batch the work is O(batch) — one map-side pass
  * for token/stop counts plus the batch-local bigram agg; the merge
  * rewrites only the kept-table (on Delta/Iceberg it becomes a keyed
  * MERGE INTO through the same seam as [[EventStreams.mergeSink]]).
  */
object CurationStream {

  /** One-shot batch reference: the kept set the stream must converge to
    * on the same corpus, regardless of micro-batching. */
  def batchKept(docs: DataFrame): DataFrame = Curation.keptDocs(docs)

  /** Process one micro-batch of (doc_id, text, source) rows, upserting
    * survivors into `keptPath`. Exposed for direct testing (replay =
    * no-op); [[start]] wires it to foreachBatch. */
  def processBatch(spark: SparkSession, batch: DataFrame,
                   keptPath: String): Unit = {
    val docsB = batch.select(col("doc_id"), col("text"), col("source"))
      .dropDuplicates("doc_id")
    EventStreams.mergeBatch(spark, batchKept(docsB), keptPath,
      keys = Seq("doc_id"))
  }

  /** Wire a (doc_id, text, source) stream into the kept-table. */
  def start(docsStream: DataFrame, keptPath: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
        processBatch(b.sparkSession, b.toDF(), keptPath)
      }
      .start()
}
