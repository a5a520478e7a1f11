package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.{Cep, CepCursor, CepGenMatch, CepMatch, CepStep}

/** Keyed CEP automaton state: the generic cursor (sought-step index,
  * repetitions consumed, matched anchors, match counter — O(pattern)
  * per user, forever) plus the last consumed (ts, id) for the ordering
  * contract. */
case class CepState(state: Int, rep: Int, anchorIds: Seq[Long], anchorTs: Seq[Long],
                    matchNo: Long, lastTs: Long, lastId: Long, started: Boolean)

/** S31 — streaming CEP: the generalized pattern automaton
  * ([[graft.operators.Cep]]) ONLINE, which is the capability gap
  * Structured Streaming is best known for (Flink CEP /
  * MATCH_RECOGNIZE have no Spark equivalent). The automaton state is
  * O(pattern) per user — sought-step index + anchors + a counter — so
  * [[org.apache.spark.sql.KeyValueGroupedDataset.flatMapGroupsWithState]]
  * carries it indefinitely, and because the batch operator
  * ([[Cep.matchesGeneric]]) drives the SAME [[Cep.step]] kernel,
  * stream and batch emit bit-identical match rows under any microbatch
  * split (StreamingSpec S31) for ANY pattern spec, not just the
  * view→click→purchase funnel.
  *
  * Ordering contract (the S26 rule): per user, events arrive in
  * (ts_us, event_id) order across batches — the event log's own
  * append order. Intra-batch arrivals are sorted before folding;
  * a cross-batch regression is rejected loudly, never silently
  * matched out of order.
  */
object StreamingCep {

  /** Generalized streaming pattern matching: caller-supplied steps,
    * per-step predicates and timeouts (the q139 surface, online). */
  def matchesPattern(events: DataFrame, pattern: Seq[CepStep]): Dataset[CepGenMatch] = {
    import events.sparkSession.implicits._
    val pat = pattern.toIndexedSeq
    require(pat.nonEmpty, "CEP pattern needs at least one step")
    val types = pat.flatMap(_.allTypes).distinct
    events
      .where(col("event_type").isin(types: _*))
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("event_type"), Cep.valueExpr(events))
      .as[(Long, Long, Long, String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CepState, CepGenMatch](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user, rows, gs: GroupState[CepState]) =>
          var st = gs.getOption.getOrElse(
            CepState(0, 0, Nil, Nil, 0L, 0L, 0L, started = false))
          var cur = CepCursor(st.state, st.rep, st.anchorIds, st.anchorTs, st.matchNo)
          val out = Vector.newBuilder[CepGenMatch]
          // Intra-batch sort only — the cursor, not the history, crosses
          // batches, so state stays O(pattern) however long the user lives.
          rows.toVector.sortBy(e => (e._3, e._2)).foreach { case (_, id, ts, tpe, v) =>
            require(!st.started || ts > st.lastTs ||
              (ts == st.lastTs && id > st.lastId),
              s"out-of-order event for user $user: ($ts, $id) after " +
                s"(${st.lastTs}, ${st.lastId}) — the event log delivers in " +
                "(ts, id) order; a regression is a pipeline bug")
            val (c2, m) = Cep.step(pat, cur, user, id, ts, tpe, v)
            cur = c2
            m.foreach(out += _)
            st = st.copy(lastTs = ts, lastId = id, started = true)
          }
          gs.update(CepState(cur.state, cur.rep, cur.anchorIds, cur.anchorTs,
            cur.matchNo, st.lastTs, st.lastId, st.started))
          out.result().iterator
      }
  }

  /** The original S31 surface: the 3-step funnel projected back to the
    * named q138 row shape. */
  def matches(events: DataFrame, withinUs: Long): Dataset[CepMatch] = {
    import events.sparkSession.implicits._
    matchesPattern(events, Cep.funnel3(withinUs))
      .map(m => CepMatch(m.user_id, m.match_no, m.step_event_ids(0),
        m.step_event_ids(1), m.step_event_ids(2),
        m.end_ts_us - m.start_ts_us))
  }
}
