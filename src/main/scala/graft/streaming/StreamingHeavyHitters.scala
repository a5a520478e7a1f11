package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.FreqSketchAggregator

/** A token routed to its sketch pane. */
case class PanedToken(pane: Int, word: String)

/** Pane state: that pane's Misra–Gries summary + exact tokens-seen. */
case class PaneSketch(counts: Map[String, Long], total: Long)

/** One candidate in a pane's current summary: `lb` is the MG stored
  * count (a lower bound on the true count); `pane_total` the exact
  * number of tokens the pane has absorbed so far (monotone per pane, so
  * a consumer identifies each pane's LATEST snapshot as its max).
  */
case class HhCandidate(pane: Int, word: String, lb: Long, pane_total: Long)

/** Online heavy hitters — the streaming form of
  * [[graft.operators.TextAnalysis.heavyHitters]]'s pass 1: each token
  * hashes to one of `nPanes` panes; keyed state per pane is ONE
  * Misra–Gries summary, so total state is O(nPanes · capacity) forever,
  * independent of the stream's distinct-token count.
  *
  * Contract (the reason hash-paning is sound): a word lands in exactly
  * one pane, so its pane count IS its global count, and the pane's MG
  * bound — error ≤ pane_total/(capacity+1) ≤ n/(capacity+1) — is no
  * weaker than the global sketch's. Every word with global share >
  * 1/(capacity+1) is therefore present in its pane's snapshot, and
  * stored counts only ever undercount. The emitted snapshot is a
  * candidate SUPERSET (order-dependent at the margin, like any MG
  * summary); exactness, when needed, comes from a verification pass
  * against the corpus — identical to batch pass 2.
  *
  * Arrivals are sorted within each (batch, pane) so Spark's undefined
  * intra-batch iteration order cannot change the summary (the same
  * determinism move as [[StreamingDedup]]).
  */
object StreamingHeavyHitters {

  /** Wire onto a (streaming or batch) docs frame with (doc_id, text).
    * Emits each touched pane's full current summary per microbatch
    * (update mode).
    */
  def candidates(docs: DataFrame, capacity: Int, nPanes: Int): Dataset[HhCandidate] = {
    import docs.sparkSession.implicits._
    val agg = new FreqSketchAggregator(capacity)
    docs
      .select(explode(split(col("text"), " ")).as("word"))
      .select(pmod(hash(col("word")), lit(nPanes)).cast("int").as("pane"), col("word"))
      .as[PanedToken]
      .groupByKey(_.pane)
      .flatMapGroupsWithState[PaneSketch, HhCandidate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (pane, rows, state: GroupState[PaneSketch]) =>
          val st = state.getOption.getOrElse(PaneSketch(Map.empty, 0L))
          val arrived = rows.map(_.word).toList.sorted
          val counts = arrived.foldLeft(st.counts)(agg.reduce)
          val next = PaneSketch(counts, st.total + arrived.size)
          state.update(next)
          counts.iterator
            .map { case (w, c) => HhCandidate(pane, w, c, next.total) }
            .toSeq.iterator
      }
  }
}
