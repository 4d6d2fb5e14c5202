package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming multi-touch attribution — the incremental twin of q124's
  * batch kernel (operators/Attribution.linearTotals): per user, touch
  * events buffer as PENDING; a purchase attributes its cents across
  * the pending touches (integer floor shares, remainder to the
  * earliest touch — the q124 rule verbatim), or to 'direct' when none
  * are pending, then clears the buffer.
  *
  * State per user: the pending channel list (bounded by
  * touches-per-conversion — the user's activity between purchases,
  * NOT history) plus six accumulated totals. The batch form needs the
  * reverse-cumulative window (a purchase claims PRECEDING touches, so
  * batch looks backward); the stream gets the same answer looking
  * forward because attribution happens exactly when the purchase
  * arrives — trailing pending touches attribute nothing, matching
  * q124's conv_seq >= 1 filter.
  *
  * In-order replay contract (the [[SeriesFillStream]] discipline): a
  * user's events arrive in (time, event_id) order across batches;
  * within a batch any order is fine (the fold re-sorts). Exact
  * redelivery of the last-folded event is an idempotent skip; an
  * older or contradictory event fails loudly. [[AttributionStreamSpec]]
  * proves stream == batch per-channel totals across splits — including
  * a split BETWEEN a touch and its purchase, where the pending buffer
  * must survive the state boundary.
  */
object AttributionStream {

  /** Per-user state: pending touch channels (arrival order = earliest
    * first), accumulated per-channel totals, and the last folded
    * (micros, event_id) for the in-order contract. */
  final case class AttrState(pending: Seq[String],
                             viewN: Long, viewCents: Long,
                             clickN: Long, clickCents: Long,
                             directN: Long, directCents: Long,
                             lastUs: Long, lastId: Long)

  val Empty: AttrState =
    AttrState(Seq.empty, 0L, 0L, 0L, 0L, 0L, 0L, Long.MinValue, Long.MinValue)

  /** Output per touched user: (user, view_n, view_cents, click_n,
    * click_cents, direct_n, direct_cents). */
  type Out = (Long, Long, Long, Long, Long, Long, Long)

  /** Pure shared kernel: fold one in-order slice of
    * (micros, event_id, event_type, cents). */
  def foldSlice(obs: Seq[(Long, Long, String, Long)],
                state: Option[AttrState]): AttrState = {
    var st = state.getOrElse(Empty)
    obs.sortBy(o => (o._1, o._2)).foreach { case (us, id, tpe, cents) =>
      if (us == st.lastUs && id == st.lastId) {
        // exact redelivery of the already-folded event: skip
      } else {
        require(us > st.lastUs || (us == st.lastUs && id > st.lastId),
          s"out-of-order event ($us, $id) after (${st.lastUs}, ${st.lastId})")
        st = (tpe, cents) match {
          case (_, c) if c < 0L => st.copy(lastUs = us, lastId = id) // q124 drops
          case ("purchase", c) =>
            val m = st.pending.size.toLong
            if (m == 0L)
              st.copy(directN = st.directN + 1L,
                directCents = st.directCents + c, lastUs = us, lastId = id)
            else {
              val share = c / m
              val rem = c - share * m // pinned to the EARLIEST touch
              var (vn, vc, cn, cc) = (st.viewN, st.viewCents, st.clickN, st.clickCents)
              st.pending.zipWithIndex.foreach { case (ch, i) =>
                val amt = share + (if (i == 0) rem else 0L)
                if (ch == "view") { vn += 1L; vc += amt }
                else { cn += 1L; cc += amt }
              }
              AttrState(Seq.empty, vn, vc, cn, cc,
                st.directN, st.directCents, us, id)
            }
          case (t, _) if t == "view" || t == "click" =>
            st.copy(pending = st.pending :+ t, lastUs = us, lastId = id)
          case _ => st.copy(lastUs = us, lastId = id) // non-attribution types
        }
      }
    }
    st
  }

  /** rows: (user, micros, event_id, event_type, cents). */
  def attribute(rows: Dataset[(Long, Long, Long, String, Long)])
      : Dataset[Out] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .mapGroupsWithState[AttrState, Out](GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[(Long, Long, Long, String, Long)],
         state: GroupState[AttrState]) =>
          val st = foldSlice(it.map(r => (r._2, r._3, r._4, r._5)).toSeq,
            state.getOption)
          state.update(st)
          (user, st.viewN, st.viewCents, st.clickN, st.clickCents,
            st.directN, st.directCents)
      }
  }
}
