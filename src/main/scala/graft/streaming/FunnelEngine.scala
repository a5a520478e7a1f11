package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel tracking (the incremental form of
  * [[graft.operators.Pipeline.funnel]]): one tiny state record per user
  * advances monotonically through view → click → purchase as events
  * arrive. The batch operator re-derives stage entry times from the
  * whole log; here each user's progress is O(1) state — three
  * timestamps — updated per microbatch, the realtime-product-analytics
  * shape (keyed state store, no reprocessing, emits on change).
  *
  * Ordering contract: stage entries are first-qualifying-event times
  * under in-order per-user delivery (the sync engine's `(t, seq)` total
  * order, SURVEY §7.3.1); within a microbatch arrivals are sorted
  * before folding, so any batch split of an ordered log yields the
  * batch result (asserted by StreamingSpec S10).
  */
object FunnelEngine {

  case class FunnelEvent(userId: Long, tsUs: Long, eventType: String)

  /** Stage entry times; -1 = not reached. Monotone: t1 <= t2 <= t3 and
    * a later stage is only ever set strictly after the previous one.
    */
  case class FunnelState(t1: Long, t2: Long, t3: Long) {
    def stage: Int = if (t3 >= 0) 3 else if (t2 >= 0) 2 else if (t1 >= 0) 1 else 0
  }

  case class FunnelUpdate(userId: Long, stage: Int, t1: Long, t2: Long, t3: Long)

  private[graft] def fold(s0: FunnelState, events: Seq[FunnelEvent]): FunnelState =
    events.sortBy(e => (e.tsUs)).foldLeft(s0) { (s, e) =>
      e.eventType match {
        case "view" if s.t1 < 0 => s.copy(t1 = e.tsUs)
        case "click" if s.t1 >= 0 && e.tsUs > s.t1 && s.t2 < 0 => s.copy(t2 = e.tsUs)
        case "purchase" if s.t2 >= 0 && e.tsUs > s.t2 && s.t3 < 0 => s.copy(t3 = e.tsUs)
        case _ => s
      }
    }

  private def handle(
      userId: Long,
      rows: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): FunnelUpdate = {
    val next = fold(state.getOption.getOrElse(FunnelState(-1, -1, -1)), rows.toSeq)
    state.update(next)
    FunnelUpdate(userId, next.stage, next.t1, next.t2, next.t3)
  }

  /** Wire the funnel onto a stream of [[FunnelEvent]]; emits each
    * user's current progress per microbatch (update mode).
    */
  def attach(events: Dataset[FunnelEvent]): Dataset[FunnelUpdate] = {
    implicit val se = Encoders.product[FunnelState]
    implicit val ue = Encoders.product[FunnelUpdate]
    events
      .groupByKey(_.userId)(Encoders.scalaLong)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(handle)
  }
}
