package graft.streaming

import org.apache.spark.sql.DataFrame

/** S30 — streaming OLS trend maintenance (the S27 drift-monitor
  * contract, for regression): the per-type sufficient statistics
  * (n, Σx, Σy, Σxy, Σx², Σy²) are THE canonical mergeable state —
  * Spark's streaming hash aggregation maintains them exactly
  * (partial-merged, replay-safe under complete-mode semantics) with
  * state bounded by the type space, never the event count, and the
  * slope/intercept/R² closed forms project off that six-column table
  * on demand. The report projection is shared VERBATIM with the batch
  * operator ([[graft.operators.Temporal.trendFromStats]]), which makes
  * the stream ≡ batch contract checkable row-for-row at every
  * microbatch: the maintained regression equals a from-scratch fit of
  * every event ingested so far.
  */
object StreamingTrend {

  /** The maintained statistics over an event stream — write with
    * complete output mode (bounded key space) so the sink always
    * holds the current table.
    */
  def stats(events: DataFrame): DataFrame =
    graft.operators.Temporal.trendStats(events)

  /** The regression report over a maintained stats table: equals the
    * batch [[graft.operators.Temporal.trendOls]] of every event
    * ingested so far.
    */
  def report(stats: DataFrame): DataFrame =
    graft.operators.Temporal.trendFromStats(stats)
}
