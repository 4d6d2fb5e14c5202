package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.functions.Exact

/** Structured Streaming forms of the event-time operators (SURVEY §2.10,
  * §2.11 E6). The aggregation expressions are IDENTICAL to the batch
  * queries (EventQueries q29/q30) — `window` / `session_window` — so
  * batch and streaming stay semantically aligned; streaming adds the
  * watermark, which bounds state and admits late data up to the bound.
  *
  * At scale: both aggs shuffle by (window/session, key) with map-side
  * partials; state store size is O(open windows x keys), bounded by the
  * watermark horizon — the properties that survive a 1000-executor run.
  */
object EventStreams {

  val eventSchema: StructType = StructType.fromDDL(
    "event_id BIGINT, tus TIMESTAMP, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING")

  /** File-based streaming source over an arriving-parquet directory —
    * the production entry (`spark.readStream`). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling event-time windows with a lateness watermark. */
  def tumblingAgg(events: DataFrame, windowLength: String = "1 hour",
                  watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("tus", watermark)
      .groupBy(window(col("tus"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"), Exact.exactSum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup (E1's streaming form): drop repeat deliveries
    * of the same key within the watermark horizon — Spark keeps one
    * state entry per key and expires it past the watermark, so state
    * stays bounded (the at-least-once → exactly-once repair step of an
    * ingestion pipeline). */
  def dedupStream(events: DataFrame, keys: Seq[String],
                  watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("tus", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Custom arbitrary-state streaming op (SURVEY §2.10 extension;
    * `KeyValueGroupedDataset.flatMapGroupsWithState`): running per-user
    * cumulative spend — state the built-in windows cannot express
    * (unbounded accumulation across batches, one state row per user,
    * emitted on every update). Input rows: (user_id, value). */
  def runningUserTotals(events: Dataset[(Long, Double)]): Dataset[(Long, Double, Long)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Double, Long), (Long, Double, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[(Double, Long)]) =>
          val (prevSum, prevN) = state.getOption.getOrElse((0.0, 0L))
          val batch = rows.toSeq
          val next = (prevSum + batch.map(_._2).sum, prevN + batch.size)
          state.update(next)
          Iterator((user, next._1, next._2))
      }
  }

  /** Gap-based session windows with a lateness watermark. */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("tus", watermark)
      .groupBy(session_window(col("tus"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), Exact.exactSum(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"), col("sum_value"))
}
