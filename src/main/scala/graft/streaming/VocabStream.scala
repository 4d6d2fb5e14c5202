package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.plans.KmvSketchLong

/** Streaming vocabulary tracking — the KMV distinct sketch (q58,
  * plans/KmvSketchLong) maintained incrementally as documents ARRIVE.
  * The E4 sketch counterpart of [[NearDupStream]]'s band index: a
  * per-source state table holds the bottom-k token hashes seen so far;
  * each micro-batch folds its own batch-local sketch into it.
  *
  * Why stream == batch, exactly: a KMV sketch is "the k smallest
  * distinct values of the input SET" — a set-union homomorphism.
  * merge(sketch(A), sketch(B)) = sketch(A ∪ B), bit for bit, for ANY
  * split of the corpus into micro-batches, so the streamed state equals
  * the one-shot q58 aggregate over the same documents (proved in
  * VocabStreamSpec). The same property makes replays absorbing:
  * re-delivering a batch unions values already in the sketch — a no-op
  * — so foreachBatch's at-least-once contract needs no dedup ledger.
  *
  * Monotone contract (stated, not hidden): a KMV sketch tracks the
  * distinct-token set of everything EVER seen. Re-delivering a CHANGED
  * document adds its new tokens but cannot retract the old version's —
  * no bottom-k sketch supports deletion. Downstream readers get "vocab
  * of the union of all delivered versions", which is the standard
  * sketch semantics (and the honest one for an append-only feed).
  *
  * Scale posture: state is ≤ k longs per source (2 KB at k=256) — the
  * whole table for a 10k-source catalog is ~20 MB, broadcastable into
  * the merge. Per batch the work is one map pass + one k-bounded agg;
  * nothing corpus-global is ever touched.
  */
object VocabStream {

  val DefaultK = 256

  /** Batch-local per-source sketch: (source, kmv ARRAY<BIGINT> sorted
    * ASC). The md5-derived 60-bit token hash is the exact q58 keying
    * (so streamed sketches are comparable against the batch query) and
    * is pre-projected in a codegen'd select — the aggregate's
    * interpreted update path then reads a bare long. */
  def batchSketch(docs: DataFrame, k: Int = DefaultK): DataFrame = {
    val sketch = ColumnBridge.column(
      KmvSketchLong(ColumnBridge.expression(col("hv")), k).toAggregateExpression())
    docs.select(col("source"), explode(graft.operators.TextOps.tokens(col("text"))).as("term"))
      .select(col("source"),
        conv(substring(md5(col("term")), 1, 15), 16, 10).cast("long").as("hv"))
      .groupBy(col("source"))
      .agg(sketch.as("kmv"))
  }

  /** Fold a batch-local sketch into the persisted state: per source,
    * union of the two bottom-k sets re-trimmed to bottom-k. Pure
    * built-ins (array_distinct/array_sort/slice) — codegen-friendly,
    * and exactly the KmvSketchLong merge semantics. */
  def mergeSketches(state: DataFrame, batch: DataFrame, k: Int): DataFrame = {
    val empty = array().cast("array<bigint>")
    state.select(col("source"), col("kmv").as("a"))
      .join(batch.select(col("source"), col("kmv").as("b")), Seq("source"), "full_outer")
      .select(col("source"),
        slice(array_sort(array_distinct(concat(
          coalesce(col("a"), empty), coalesce(col("b"), empty)))), 1, k).as("kmv"))
  }

  /** Derive the distinct estimate from a sketch column — the q58
    * formula: exact size below k, (k-1)/normalized(kth) at k. */
  def withEstimate(state: DataFrame, k: Int = DefaultK): DataFrame =
    state.select(col("source"),
      size(col("kmv")).cast("long").as("kmv_n"),
      element_at(col("kmv"), -1).as("kmv_kth"),
      when(size(col("kmv")) < k, size(col("kmv")).cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(1152921504606846976.0) /
          element_at(col("kmv"), -1).cast("double"))
        .as("est_distinct"))

  /** Process one micro-batch of (doc_id, text, source) rows, folding its
    * sketch into `statePath`. Exposed for direct testing; [[start]]
    * wires it to foreachBatch. */
  def processBatch(spark: SparkSession, batch: DataFrame, statePath: String,
                   k: Int = DefaultK): Unit = {
    val b = batchSketch(batch, k)
    val merged =
      if (graft.pipeline.Pipeline.pathExists(spark, statePath))
        mergeSketches(spark.read.parquet(statePath), b, k)
      else b
    graft.pipeline.Pipeline.swapWrite(spark, merged, statePath)
  }

  /** Wire a (doc_id, text, source) stream into the sketch state table. */
  def start(docsStream: DataFrame, statePath: String, checkpointDir: String,
            k: Int = DefaultK): org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
        processBatch(b.sparkSession, b.toDF(), statePath, k)
      }
      .start()
}
