package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, Expression, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.{FactStore, GraftTable, ManifestLog}

/** Zero-Exchange fact⋈fact joins — the round-11 verdict's missing #4.
  *
  * The fact lake's scans execute through the V1Scan hatch, which
  * reports no output partitioning, so a join of two key-clustered
  * graft tables ON THE KEY always exchanges both sides — at 100 TB the
  * difference between a metadata join and shuffling the table twice.
  * DSv2's storage-partitioned-join tier would require a native Batch
  * scan with executor-side readers (re-implementing the read path);
  * instead this rule routes the join through Spark's OWN bucketing:
  *
  *   - [[FactStore.writeBucketedMirror]] lays the live rows out ONCE
  *     as a catalog parquet table `bucketBy(n, key)` + sorted, stamped
  *     with the manifest version it reflects;
  *   - when BOTH sides of an inner key-equi-join are graft relations
  *     whose mirrors are FRESH (mirror version == the store's current
  *     manifest version — one driver-side read each), the rule swaps
  *     each scan for its mirror, aliased back to the original output
  *     attribute ids so everything above (filters, projections, the
  *     join condition) binds unchanged;
  *   - FileSourceStrategy then plans two co-bucketed scans:
  *     hash-partitioned on the key, NO Exchange on either side
  *     (GraftStorageJoinSpec pins the plan). Filters above the
  *     substitution still reach the parquet scan — V1 file-source
  *     pushdown happens at physical planning, below the swap point.
  *
  * Soundness: a STALE mirror is never PLANNED — any DML bumps the
  * manifest version (and its commit timestamp; both are checked, so a
  * drop-and-recreate at the same path can never coincide back into
  * freshness) and the rule stands down to the ordinary plan (correct,
  * just shuffled) until the mirror is refreshed. Freshness is verified
  * at optimization time: a commit landing in the window between
  * planning and execution executes the already-substituted plan — the
  * same read-your-own-snapshot window every snapshot-isolated reader
  * has (an ordinary scan planned pre-commit also serves pre-commit
  * rows), not a new staleness class. Broadcast
  * still wins where it applies: the rule skips joins already hinted
  * (GraftJoinSizing runs earlier), and self-joins of one store (same
  * directory on both sides) are left alone — the cached mirror
  * relation would alias both sides to one attribute set.
  */
class GraftStorageJoin(session: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, Some(cond), hint)
        if hint.leftHint.isEmpty && hint.rightHint.isEmpty =>
      (graftSide(l), graftSide(r)) match {
        // The registry guard comes FIRST: with no mirror registered the
        // rule costs zero I/O per planning pass (joinsOnKeys reads the
        // stores' manifests for their key columns; the optimizer batch
        // is a fixed point, so this runs more than once per query).
        case (Some((lRel, lDir)), Some((rRel, rDir)))
            if lDir != rDir &&
              GraftStorageJoin.registered(lDir) && GraftStorageJoin.registered(rDir) &&
              joinsOnKeys(cond, lRel, lDir, rRel, rDir) =>
          (GraftStorageJoin.freshMirror(session, lDir),
            GraftStorageJoin.freshMirror(session, rDir)) match {
            case (Some(lt), Some(rt)) =>
              logInfo(s"routing fact join through bucketed mirrors $lt ⋈ $rt")
              j.copy(left = substitute(l, lRel, lt), right = substitute(r, rRel, rt))
            case _ => j
          }
        case _ => j
      }
  }

  /** The graft DSv2 relation under pure selections; None otherwise. */
  private def graftSide(p: LogicalPlan): Option[(DataSourceV2Relation, String)] =
    p match {
      case Project(exprs, c) if exprs.forall {
        case _: AttributeReference => true
        case a: Alias => a.child.isInstanceOf[AttributeReference]
        case _ => false
      } => graftSide(c)
      case Filter(_, c) => graftSide(c)
      case SubqueryAlias(_, c) => graftSide(c)
      case r: DataSourceV2Relation => r.table match {
        case t: GraftTable if t.pinnedVersion == ManifestLog.Latest =>
          Some((r, t.storeDir))
        case _ => None
      }
      case _ => None
    }

  /** Some equi-conjunct pairs the two stores' KEY columns — the axis
    * both mirrors are bucketed on. */
  private def joinsOnKeys(cond: Expression, lRel: DataSourceV2Relation,
                          lDir: String, rRel: DataSourceV2Relation,
                          rDir: String): Boolean = {
    val lKey = FactStore.pruningSurface(session, lDir)._1
    val rKey = FactStore.pruningSurface(session, rDir)._1
    splitConjunctivePredicates(cond).exists {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        (lRel.outputSet.contains(a) && a.name == lKey &&
          rRel.outputSet.contains(b) && b.name == rKey) ||
        (lRel.outputSet.contains(b) && b.name == lKey &&
          rRel.outputSet.contains(a) && a.name == rKey)
      case _ => false
    }
  }

  /** Swap the relation leaf for its mirror, aliased back to the
    * ORIGINAL attribute ids so the plan above binds unchanged. */
  private def substitute(side: LogicalPlan, rel: DataSourceV2Relation,
                         mirrorTable: String): LogicalPlan = {
    // The fresh analysis carries SubqueryAliases the optimizer already
    // eliminated at this stage — strip them or planning has no
    // strategy for them.
    val mirror = session.table(mirrorTable).queryExecution.analyzed
      .transformUp { case SubqueryAlias(_, c) => c }
    val byName = mirror.output.map(a => a.name -> a).toMap
    val projected: Seq[NamedExpression] = rel.output.map { a =>
      Alias(byName(a.name), a.name)(exprId = a.exprId, qualifier = a.qualifier)
    }
    side.transformUp {
      case r: DataSourceV2Relation if r.eq(rel) => Project(projected, mirror)
    }
  }
}

object GraftStorageJoin {
  /** canonical dir → (mirror table, reflected store version, that
    * version's commit timestamp). Registered by
    * [[FactStore.writeBucketedMirror]]; re-attachable in a fresh
    * session via [[register]]. Keys canonicalize through the Hadoop
    * Path URI (scheme-insensitive for the local/default FS), so a
    * table resolved via a catalog LOCATION (`file:/x`) and a mirror
    * registered with the raw path (`/x`) meet.
    *
    * The commit TIMESTAMP rides next to the version for the same
    * reason the schema cache keys on it
    * ([[GraftTableProvider.schemaAt]]): dropping a store and
    * recreating one at the SAME path resets the version counter, so
    * "registered version == current version" alone would eventually
    * align by coincidence and serve the OLD table's rows through a
    * key join. Timestamps are assigned at commit time and never
    * repeat across a wipe, so the pair is collision-proof. */
  private val mirrors =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long, Long)]()

  private def canon(dir: String): String = {
    val u = new org.apache.hadoop.fs.Path(dir).toUri
    Option(u.getScheme).filterNot(_ == "file")
      .map(s => s"$s://${Option(u.getAuthority).getOrElse("")}${u.getPath}")
      .getOrElse(u.getPath)
  }

  def register(dir: String, table: String, version: Long, commitTimeMs: Long): Unit =
    mirrors.put(canon(dir), (table, version, commitTimeMs))

  /** Evict a directory's mirror entry — called when the catalog
    * deletes or renames the store out from under the path, so a later
    * store at the same dir can never meet a leftover registration. */
  def invalidate(dir: String): Unit = mirrors.remove(canon(dir))

  /** Registry-only presence probe — no filesystem I/O. */
  private[graft] def registered(dir: String): Boolean =
    mirrors.containsKey(canon(dir))

  /** The mirror table iff it reflects the store's CURRENT version —
    * BOTH the version number and that version's commit timestamp must
    * match (two driver-side manifest reads, no data I/O) — and still
    * exists in the session catalog. */
  private[plans] def freshMirror(spark: SparkSession, dir: String): Option[String] =
    Option(mirrors.get(canon(dir))).collect {
      case (table, v, ts) if ManifestLog.currentVersion(spark, dir) == v &&
        ManifestLog.commitTimeMs(spark, dir, v) == ts &&
        spark.catalog.tableExists(table) => table
    }
}
