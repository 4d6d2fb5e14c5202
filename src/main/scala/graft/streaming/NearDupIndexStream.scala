package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.operators.NearDupIndex

/** Streaming ingestion into the persisted [[NearDupIndex]] — new
  * documents mined to their band postings + shingle sets as they
  * ARRIVE and appended as segments, so the serving index stays current
  * without re-mining the corpus (VERDICT r11 #1's streaming leg; the
  * vector analog is [[SigStream]], the lexical analog is
  * [[graft.operators.TextIndex.writeDelta]]'s foreachBatch use).
  *
  * Why stream == batch, exactly: band postings and shingle sets are
  * PER-DOCUMENT pure functions (no trained state, no cross-document
  * statistics), so ANY split of the corpus into micro-batches yields
  * the identical row set, and a probe of the stream-built index
  * answers bit-identically to one built in a single batch
  * (NearDupIndexSpec proves it across an arbitrary split).
  *
  * Replay discipline: each micro-batch becomes segment <batchId> via
  * [[NearDupIndex.writeDelta]] — per-segment overwrite makes a
  * redelivered batch rewrite its own segment with identical content,
  * so at-least-once delivery is absorbed BY IDEMPOTENCE, no ledger.
  * Contract: doc_ids disjoint across batches (append-only corpus; the
  * UPDATE-capable sibling is [[NearDupStream]]'s merge store).
  * Compaction of a stream-fed index runs only at a COMMITTED stream
  * boundary — see [[graft.operators.SigIndex.compactInPlace]]'s
  * streaming order contract, which applies verbatim.
  *
  * The serving flow this enables: probe the index with each incoming
  * batch BEFORE appending it ("is this batch a near-dup of history?"),
  * then append — incremental corpus dedup at ingest, answered from an
  * openable artifact.
  */
object NearDupIndexStream {

  /** Fold one micro-batch of (doc_id, text) rows into persisted index
    * `name` under `dir` as segment `batchId`. Exposed for direct
    * testing (replay = no-op); [[start]] wires it to foreachBatch. */
  def processBatch(batch: DataFrame, name: String, dir: String,
                   meta: NearDupIndex.Meta, batchId: Long): Unit =
    NearDupIndex.writeDelta(batch.sparkSession,
      batch.select("doc_id", "text"), name, dir, meta, segId = batchId)

  /** Wire a (doc_id, text) stream into the persisted index. */
  def start(docsStream: DataFrame, name: String, dir: String,
            meta: NearDupIndex.Meta, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        processBatch(b.toDF(), name, dir, meta, id)
      }
      .start()
}
