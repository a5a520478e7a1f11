package graft.streaming

import org.apache.spark.sql.DataFrame

/** S27 — streaming distribution-drift (PSI) monitoring (north-star
  * addition; the reference's only aggregate is the per-stream event
  * list, main.go:109-115 — corpus statistics are new surface).
  *
  * The production drift monitor does not recompute PSI over the corpus
  * per trigger; it MAINTAINS the sufficient statistics — per-(feature,
  * value) cohort counts — as a streaming aggregation, and projects the
  * (p − q)·ln(p/q) report off that bounded table on demand. Spark's
  * streaming hash aggregation IS the maintenance loop (exact, partial-
  * merged, replay-safe under complete-mode semantics); state size is
  * the categorical value space, never the document count. The report
  * projection is shared VERBATIM with the batch operator
  * ([[graft.operators.Profile.driftFromCounts]]), which is what makes
  * the stream ≡ batch contract checkable row-for-row.
  */
object StreamingDrift {

  /** The maintained statistics: running (feature, value, n_a, n_b)
    * counts over a document stream — write with complete output mode
    * (bounded key space) so the sink always holds the current table.
    */
  def counts(docs: DataFrame): DataFrame =
    graft.operators.Profile.featureCounts(docs)

  /** The PSI report over a maintained counts table: equals the batch
    * [[graft.operators.Profile.distributionDrift]] of every document
    * ingested so far — the S25 view-maintenance contract, for drift.
    *
    * The projection self-joins the counts table (per-feature totals
    * back onto the cells); a streaming memory sink's plan is a leaf
    * that can't be re-instanced for self-join dedup, so re-root the
    * bounded table on a fresh leaf first.
    */
  def report(counts: DataFrame): DataFrame = {
    val fresh = counts.sparkSession.createDataFrame(counts.rdd, counts.schema)
    graft.operators.Profile.driftFromCounts(fresh)
  }
}
