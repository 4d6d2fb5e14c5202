package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q79's rolling z-score anomaly detection
  * (EventQueries): each event is scored against its user's trailing
  * window of the previous [[Frame]] quantized values. The flag kernel
  * is the SAME integer test as the batch query — (n·v − s)² >
  * Thresh²·(n·ssq − s²) with BigInt squares mirroring the batch
  * DECIMAL(38,0)/HUGEINT arithmetic — so stream == batch exactly
  * (AnomalyStreamSpec proves flag-set equality across a mid-stream
  * batch split).
  *
  * In-order replay contract (as NearDupStream): a user's events must
  * arrive in (tus, event_id) order ACROSS batches; within a batch any
  * order is fine (the group re-sorts). State per user is a bounded
  * ring of [[Frame]] longs — O(users) state total, no growth with
  * stream length.
  */
object AnomalyStream {

  /** Trailing-window length (q79's ZFrame). */
  val Frame = 10

  /** Minimum trailing count before an event can be flagged (ZMinN). */
  val MinN = 5

  /** z threshold (ZThresh): anomaly iff z² > Thresh². */
  val Thresh = 3

  /** Pure shared kernel: is `vq` anomalous against the trailing window
    * `prev` (oldest first)? Exact integer arithmetic — BigInt plays the
    * batch side's DECIMAL(38,0). */
  def isAnomaly(prev: Seq[Long], vq: Long): Boolean = {
    val n = prev.size
    if (n < MinN) return false
    val s = prev.foldLeft(BigInt(0))(_ + _)
    val ssq = prev.foldLeft(BigInt(0))((a, v) => a + BigInt(v) * v)
    val d = BigInt(n) * vq - s
    val c = BigInt(n) * ssq - s * s
    c > 0 && d * d > BigInt(Thresh * Thresh) * c
  }

  /** rows: (user_id, tus_micros, event_id, vq). Emits one
    * (user_id, event_id, anom) per input event. */
  def anomalies(rows: Dataset[(Long, Long, Long, Long)]): Dataset[(Long, Long, Boolean)] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[Seq[Long], (Long, Long, Boolean)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[(Long, Long, Long, Long)],
         state: GroupState[Seq[Long]]) =>
          var ring = state.getOption.getOrElse(Seq.empty[Long])
          val out = it.toSeq.sortBy(r => (r._2, r._3)).map {
            case (_, _, eventId, vq) =>
              val flag = isAnomaly(ring, vq)
              ring = (ring :+ vq).takeRight(Frame)
              (user, eventId, flag)
          }
          state.update(ring)
          out.iterator
      }
  }
}
