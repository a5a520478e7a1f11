package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.CepMatch

/** Keyed CEP automaton state: the current phase (0 seek-view, 1
  * seek-click, 2 seek-purchase), the partial match's anchors, the
  * match counter, and the last consumed (ts, id) for the ordering
  * contract — O(1) per user, forever. */
case class CepState(state: Int, vId: Long, vTs: Long, cId: Long, cTs: Long,
                    matchNo: Long, lastTs: Long, lastId: Long, started: Boolean)

/** S31 — streaming CEP: the q138 pattern automaton ONLINE, which is
  * the capability gap Structured Streaming is best known for (Flink
  * CEP / MATCH_RECOGNIZE have no Spark equivalent). The automaton
  * state is O(1) per user — phase + two anchors + a counter — so
  * [[org.apache.spark.sql.KeyValueGroupedDataset.flatMapGroupsWithState]]
  * carries it indefinitely, and because the batch operator
  * ([[graft.operators.Behavior.cepMatches]]) is the SAME fold, stream
  * and batch emit bit-identical match rows under any microbatch split
  * (StreamingSpec S31).
  *
  * Ordering contract (the S26 rule): per user, events arrive in
  * (ts_us, event_id) order across batches — the event log's own
  * append order. Intra-batch arrivals are sorted before folding;
  * a cross-batch regression is rejected loudly, never silently
  * matched out of order.
  */
object StreamingCep {

  def matches(events: DataFrame, withinUs: Long): Dataset[CepMatch] = {
    import events.sparkSession.implicits._
    events
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CepState, CepMatch](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user, rows, gs: GroupState[CepState]) =>
          var st = gs.getOption.getOrElse(
            CepState(0, 0L, 0L, 0L, 0L, 0L, 0L, 0L, started = false))
          val out = Vector.newBuilder[CepMatch]
          rows.toVector.sortBy(e => (e._3, e._2)).foreach { case (_, id, ts, tpe) =>
            require(!st.started || ts > st.lastTs ||
              (ts == st.lastTs && id > st.lastId),
              s"out-of-order event for user $user: ($ts, $id) after " +
                s"(${st.lastTs}, ${st.lastId}) — the event log delivers in " +
                "(ts, id) order; a regression is a pipeline bug")
            var state = st.state
            if (state == 1 && ts > st.vTs + withinUs) state = 0
            else if (state == 2 && ts > st.cTs + withinUs) state = 0
            state match {
              case 0 =>
                if (tpe == "view")
                  st = st.copy(state = 1, vId = id, vTs = ts)
                else st = st.copy(state = 0)
              case 1 =>
                if (tpe == "click")
                  st = st.copy(state = 2, cId = id, cTs = ts)
                else st = st.copy(state = 1)
              case 2 =>
                if (tpe == "purchase") {
                  val n = st.matchNo + 1
                  out += CepMatch(user, n, st.vId, st.cId, id, ts - st.vTs)
                  st = st.copy(state = 0, matchNo = n)
                } else st = st.copy(state = 2)
            }
            st = st.copy(lastTs = ts, lastId = id, started = true)
          }
          gs.update(st)
          out.result().iterator
      }
  }
}
