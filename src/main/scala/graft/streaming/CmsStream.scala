package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Cms

/** Streaming count-min maintenance — the frequency sketch (q72,
  * operators/Cms) folded incrementally as documents arrive, completing
  * the sketch tier's streaming twins (KMV → [[VocabStream]],
  * profile+quantiles → [[ProfileStream]], frequency → this).
  *
  * Why stream == batch, exactly: a CMS is a LINEAR sketch — counters
  * are sums over the input multiset, so merge(build(A), build(B)) =
  * build(A ⊎ B) elementwise for ANY split into micro-batches
  * (CmsSpec's additivity law). Unlike the set-union sketches, addition
  * is NOT absorbing under replay — re-delivering a batch would
  * double-count — so the fold is guarded by the same batchId
  * high-water contract as ProfileStream's additive counts: batches at
  * or below the recorded high-water are skipped.
  *
  * Scale posture: state is d×w counter rows regardless of corpus
  * (kilobytes); each batch contributes one map pass + one bounded agg
  * + a counter-table merge. The d/w geometry is stamped into the
  * state and a mismatched caller fails loudly — merging counters
  * hashed under different geometries corrupts silently otherwise.
  */
object CmsStream {

  /** Fold one micro-batch of (doc_id, text, ...) rows into the counter
    * state at `statePath`. Replays (batchId <= recorded high-water)
    * are no-ops. Exposed for direct testing; [[start]] wires it to
    * foreachBatch. */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                   statePath: String, d: Int = Cms.DefaultDepth,
                   w: Int = Cms.DefaultWidth): Unit = {
    import spark.implicits._
    val toks = batch.select(
      explode(graft.operators.TextOps.tokens(col("text"))).as("term"))
    val b = Cms.build(toks, "term", d, w)
    val merged =
      if (graft.pipeline.Pipeline.pathExists(spark, statePath)) {
        val st = spark.read.parquet(statePath)
        val (sd, sw, hi) = {
          val r = st.select(col("d"), col("w"), col("hi")).first()
          (r.getInt(0), r.getInt(1), r.getLong(2))
        }
        require(sd == d && sw == w,
          s"CmsStream state at $statePath was built with d=$sd,w=$sw, not d=$d,w=$w")
        if (batchId <= hi) return // replay: counters are additive, skip
        Cms.merge(counters(st), b)
      } else b
    // the sentinel (j = -1) row carries the d/w/hi metadata even when a
    // batch contributed zero tokens — a 0-row state would otherwise
    // crash the next batch's metadata read AND lose the replay
    // high-water, silently re-enabling double counting
    graft.pipeline.Pipeline.swapWrite(spark,
      merged.unionByName(Seq((-1, -1L, 0L)).toDF("j", "bucket", "n"))
        .withColumn("d", lit(d)).withColumn("w", lit(w))
        .withColumn("hi", lit(batchId)),
      statePath)
  }

  /** Real counter rows of a persisted state (the metadata sentinel
    * filtered out). */
  private def counters(st: DataFrame): DataFrame =
    st.filter(col("j") >= 0).select(col("j"), col("bucket"), col("n"))

  /** Estimate counts for `queries`' `tokenCol` from the persisted
    * state, using the geometry RECORDED in the state. */
  def currentEstimates(spark: SparkSession, statePath: String,
                       queries: DataFrame, tokenCol: String): DataFrame = {
    val st = spark.read.parquet(statePath)
    val r = st.select(col("d"), col("w")).first()
    Cms.estimate(counters(st), queries, tokenCol, r.getInt(0), r.getInt(1))
  }

  /** Wire a (doc_id, text, ...) stream into the counter state. */
  def start(docsStream: DataFrame, statePath: String, checkpointDir: String,
            d: Int = Cms.DefaultDepth, w: Int = Cms.DefaultWidth)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        processBatch(b.sparkSession, b.toDF(), id, statePath, d, w)
      }
      .start()
}
