package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.max
import graft.sources.VersionedTextIndex

/** S25 — streaming materialized-view maintenance: the q117 roll-forward
  * consumed as a STREAM of commit notifications, closing the loop
  * CDC architectures run in production (commit log → incremental view
  * refresh), here over the versioned lexical index's own change feed.
  *
  * The maintained view is the df (document-frequency) table — BM25's
  * expensive half. Each microbatch delivers "version N committed"
  * notifications; the maintainer rolls its view from its last version
  * to the newest committed one via [[VersionedTextIndex.dfRollForward]]
  * — work proportional to the commits' CHANGED documents, never a
  * corpus recompute, and a physical-only commit (compaction) rolls
  * through an empty feed to the identical table.
  *
  * Delivery-fault tolerance comes from the version arithmetic, not
  * from streaming state: a replayed or reordered notification (target
  * ≤ current version) is a no-op, and a SKIPPED notification heals at
  * the next one because the roll targets the store's latest committed
  * version, not the notification payload — `changes(from, to)` is a
  * content diff between ANY two committed versions, so multi-commit
  * hops are one roll. Zero streaming state operators; the only state
  * is the maintained view itself (vocabulary-bounded rows), local-
  * checkpointed per roll for constant plan depth (the training-loop
  * contract). In production the view lands in a store per roll; the
  * equivalence contract is identical.
  */
final class DfViewMaintainer(spark: SparkSession, dir: String) {
  private var v: Long = VersionedTextIndex.currentVersion(spark, dir)
  private var view: DataFrame =
    VersionedTextIndex.dfTable(spark, dir, v).localCheckpoint(true)

  def version: Long = synchronized { v }
  def current: DataFrame = synchronized { view }

  /** Advance the view to `min(toVersion, latest committed)`; at-or-
    * behind targets are no-ops (replay/reorder safety).
    */
  def onCommit(toVersion: Long): Unit = synchronized {
    val target = math.min(toVersion, VersionedTextIndex.currentVersion(spark, dir))
    if (target > v) {
      view = VersionedTextIndex.dfRollForward(spark, dir, view, v, target)
        .localCheckpoint(true)
      v = target
    }
  }
}

object StreamingMvMaintain {

  /** The foreachBatch sink over a commit-notification stream (one
    * `version` column): roll once per microbatch, to the batch's
    * highest notified version.
    */
  def sink(m: DfViewMaintainer)(batch: DataFrame, batchId: Long): Unit = {
    val mx = batch.agg(max("version")).first()
    if (!mx.isNullAt(0)) m.onCommit(mx.getLong(0))
  }
}
