package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, HintInfo, Join, LogicalPlan, Project, SubqueryAlias, BROADCAST}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.GraftTable

/** Join sizing for graft catalog tables.
  *
  * The fact lake's scans execute through Spark's `V1Scan` hatch, and
  * the planner's `V1ScanWrapper` implements only `Scan` — the
  * `SupportsReportStatistics` the GraftScan carries is invisible to
  * join selection, so a 2 MB fact table reads as "unknown = huge" and
  * a join against it sort-merges both sides. (AQE eventually converts
  * to a broadcast at runtime, but only after paying the small side's
  * shuffle map stage.)
  *
  * This rule restores the decision Catalyst itself would make had the
  * statistics survived the wrapper: when a join side is a graft
  * relation (possibly under projections/filters — both only shrink
  * it) whose MANIFEST-backed size — the recorded segment file lengths,
  * driver-side metadata, no data I/O — clears the session's
  * `autoBroadcastJoinThreshold`, the Join node gets the corresponding
  * broadcast hint. Idempotent (existing hints are never overridden),
  * so the fixed-point optimizer batch converges; disabled entirely
  * when the user disables auto-broadcast (threshold ≤ 0).
  */
class GraftJoinSizing extends Rule[LogicalPlan] {

  /** The manifest-estimated byte size of a graft relation under
    * size-preserving-or-shrinking operators; None for anything else.
    * Only PURE column selections recurse — a Project that COMPUTES
    * columns (`repeat(s, 10000) AS blob`) can expand the frame
    * arbitrarily, and a mandatory broadcast hint on an expanded side
    * would bypass AQE's runtime size check. */
  private def graftBytes(p: LogicalPlan): Option[Long] = p match {
    case Project(exprs, c) if exprs.forall {
      case _: Attribute => true
      case a: Alias => a.child.isInstanceOf[Attribute]
      case _ => false
    } => graftBytes(c)
    case Filter(_, c) => graftBytes(c)
    case SubqueryAlias(_, c) => graftBytes(c)
    case r: DataSourceV2Relation => r.table match {
      case t: GraftTable => t.estimatedBytes
      case _ => None
    }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val threshold = conf.autoBroadcastJoinThreshold
    if (threshold <= 0) return plan
    // The manifest records COMPRESSED on-disk parquet lengths; the
    // broadcast decision is about in-MEMORY rows. Scale by the file-
    // source convention (`spark.sql.sources.fileCompressionFactor`)
    // before comparing — a highly compressed table just under the raw
    // threshold could expand several-fold when materialized, and a
    // mandatory hint bypasses AQE's runtime size check.
    val factor = conf.fileCompressionFactor
    plan.transformUp {
      case j: Join =>
        def fits(side: LogicalPlan): Option[HintInfo] =
          graftBytes(side).map(b => (BigDecimal(b) * factor).toLong)
            .filter(b => b > 0 && b <= threshold)
            .map(_ => HintInfo(strategy = Some(BROADCAST)))
        val lh = j.hint.leftHint.orElse(fits(j.left))
        val rh = j.hint.rightHint.orElse(fits(j.right))
        if (lh == j.hint.leftHint && rh == j.hint.rightHint) j
        else j.copy(hint = j.hint.copy(leftHint = lh, rightHint = rh))
    }
  }
}
