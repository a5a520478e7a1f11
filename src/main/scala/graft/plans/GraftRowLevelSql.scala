package graft.plans

import org.apache.spark.sql.{GraftInternalBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, EqualTo, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.{FactStore, GraftTable, GraftTableProvider, ManifestLog}

/** Standard SQL row-level DML on graft tables — `UPDATE t SET … WHERE
  * …`, `MERGE INTO t USING s ON … WHEN …`, and `DELETE FROM t WHERE
  * <any predicate>` — with NO graft dialect required.
  *
  * Mechanism (a deliberate alternative to DSv2's
  * `SupportsRowLevelOperations`, decision recorded here): Spark's
  * delta-based row-level protocol feeds per-row operations to
  * EXECUTOR-SIDE `DeltaWriter`s — a second write implementation that
  * would have to reassemble our one-atomic-manifest-commit semantics
  * from distributed pieces. Instead, a post-hoc resolution rule
  * converts the RESOLVED `UpdateTable` / `MergeIntoTable` /
  * `DeleteFromTable` plans into thin runnable commands over the ONE
  * existing commit layer:
  *
  *   - UPDATE → the post-image plan (Project of the resolved
  *     assignments over Filter(condition, relation)) materializes as a
  *     change-bounded frame → [[FactStore.update]] (tombstone + data in
  *     one commit; cost = one pushed-down target scan + write ∝ matched
  *     rows — no copy-on-write of untouched rows in touched files).
  *   - MERGE → the resolved ON/WHEN expressions re-qualify onto the
  *     `t`/`s` aliases and route into [[FactStore.merge]] — the same
  *     one-scan clause engine `GRAFT MERGE` uses, so the two SQL
  *     spellings cannot drift (MergePropertiesSpec re-runs through
  *     this path).
  *   - DELETE with a predicate the `sources.Filter` algebra cannot
  *     carry (e.g. `user_id % 3 = 0`) — the shapes `SupportsDelete`
  *     must reject — lowers to key-projection + [[FactStore.delete]]:
  *     same single scan `deleteMatching` would pay, arbitrary
  *     predicates allowed. Translatable predicates keep riding the
  *     capability path untouched.
  *
  * Unsupported shapes fail LOUDLY with the supported alternative named
  * (never a silent fallback to Spark's "table does not support
  * row-level operations"): non-key merge conditions, `WHEN NOT MATCHED
  * BY SOURCE`, non-identity insert column lists, schema-evolving
  * merges, and writes to version-pinned tables are all rejected with
  * guidance.
  */
class GraftRowLevelSql(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u @ UpdateTable(table, assignments, condition) if u.resolved =>
      graftRel(table).map(convertUpdate(_, assignments, condition)).getOrElse(plan)
    case m: MergeIntoTable if m.resolved =>
      graftRel(m.targetTable).map(convertMerge(_, m)).getOrElse(plan)
    case d @ DeleteFromTable(table, condition) if d.resolved &&
        !GraftInternalBridge.translatable(condition) =>
      graftRel(table).map(convertDelete(_, condition)).getOrElse(plan)
    case _ => plan
  }

  /** The graft DSv2 relation under aliases, with its store directory;
    * None for any other table (the rule stands down). */
  private def graftRel(plan: LogicalPlan): Option[(DataSourceV2Relation, String)] =
    plan match {
      case SubqueryAlias(_, child) => graftRel(child)
      case r: DataSourceV2Relation => r.table match {
        case t: GraftTable =>
          require(t.pinnedVersion == ManifestLog.Latest,
            s"cannot run DML against a version-pinned graft table (${t.name})")
          Some((r, t.storeDir))
        case _ => None
      }
      case _ => None
    }

  private def unsupported(what: String, useInstead: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft row-level SQL: $what is not supported — $useInstead")

  // ------------------------------------------------------------ UPDATE

  private def convertUpdate(rel: (DataSourceV2Relation, String),
                            assignments: Seq[Assignment],
                            condition: Option[Expression]): LogicalPlan = {
    val (relation, dir) = rel
    val keyName = FactStore.pruningSurface(session, dir)._1
    val byName: Map[String, Expression] = assignments.map { a =>
      a.key match {
        case attr: AttributeReference if relation.outputSet.contains(attr) =>
          if (attr.name == keyName)
            unsupported(s"assigning the key column '$keyName'",
              "DELETE the old row and INSERT the new one (a key change is a new identity)")
          attr.name -> a.value
        case other =>
          unsupported(s"assigning to '${other.sql}' (nested or computed target)",
            "assign whole top-level columns")
      }
    }.toMap
    // Post-image = every target column, assigned ones replaced (cast
    // to the column's existing type — an UPDATE can never drift the
    // schema), over the filtered relation. The relation scans through
    // the ordinary DSv2 path, so pushdown/pruning still apply.
    val post: Seq[NamedExpression] = relation.output.map { a =>
      byName.get(a.name)
        .map(v => Alias(Cast(v, a.dataType, Some(conf.sessionLocalTimeZone)), a.name)())
        .getOrElse(a)
    }
    GraftSqlUpdateCommand(dir,
      Project(post, Filter(condition.getOrElse(Literal.TrueLiteral), relation)))
  }

  // ------------------------------------------------------------- MERGE

  private def convertMerge(rel: (DataSourceV2Relation, String),
                           m: MergeIntoTable): LogicalPlan = {
    import FactStore.MergeClause
    val (relation, dir) = rel
    val keyName = FactStore.pruningSurface(session, dir)._1
    if (m.notMatchedBySourceActions.nonEmpty)
      unsupported("WHEN NOT MATCHED BY SOURCE",
        "express source-absence actions as a GRAFT DELETE over an anti-join")
    if (m.withSchemaEvolution)
      unsupported("MERGE … WITH SCHEMA EVOLUTION",
        "new source columns already evolve the table additively; drop the clause")

    val sourceOut = m.sourceTable.output
    // ON must be key equality under the SAME column name: the commit
    // layer matches generations on the store key, and the insert leg
    // lands the source row as-is (a differently-named key column would
    // ride in as a new field).
    def stripCast(e: Expression): Expression = e match {
      case c: Cast => stripCast(c.child); case other => other
    }
    (stripCast(m.mergeCondition) match {
      case EqualTo(l, r) => Seq(stripCast(l), stripCast(r))
      case _ => Seq.empty
    }) match {
      case Seq(a: AttributeReference, b: AttributeReference)
        if (relation.outputSet.contains(a) && sourceOut.exists(_.exprId == b.exprId)) ||
           (relation.outputSet.contains(b) && sourceOut.exists(_.exprId == a.exprId)) =>
        val (t, s) = if (relation.outputSet.contains(a)) (a, b) else (b, a)
        if (t.name != keyName || s.name != keyName)
          unsupported(s"merge condition ON ${t.name} = ${s.name}",
            s"match on the store key under its own name (ON t.$keyName = s.$keyName)")
      case _ =>
        unsupported(s"merge condition '${m.mergeCondition.sql}'",
          s"the commit layer matches on key equality only (ON t.$keyName = s.$keyName)")
    }
    if (sourceOut.map(_.name).distinct.length != sourceOut.length)
      unsupported("a merge source with duplicate column names",
        "project the source to unique names first")

    // Re-qualify resolved references onto the t/s aliases and emit SQL
    // — the exact dialect FactStore.MergeClause speaks, so standard
    // MERGE INTO and GRAFT MERGE run the SAME one-scan clause engine.
    val sourceIds = sourceOut.map(_.exprId).toSet
    def toSql(e: Expression): String = e.transform {
      case attr: AttributeReference if relation.outputSet.contains(attr) =>
        UnresolvedAttribute(Seq("t", attr.name))
      case attr: AttributeReference if sourceIds.contains(attr.exprId) =>
        UnresolvedAttribute(Seq("s", attr.name))
    }.sql

    def updateSet(assigns: Seq[Assignment]): Map[String, String] =
      assigns.map { a =>
        a.key match {
          case attr: AttributeReference if relation.outputSet.contains(attr) =>
            if (attr.name == keyName)
              unsupported(s"UPDATE SET of the key column '$keyName'",
                "a key change is a delete + insert")
            attr.name -> toSql(a.value)
          case other => unsupported(s"UPDATE SET target '${other.sql}'",
            "assign whole top-level columns")
        }
      }.toMap

    // INSERT must be the identity mapping (INSERT * — the analyzer
    // expands it to name-aligned assignments, possibly cast-wrapped):
    // the commit layer inserts the source row as-is.
    def requireIdentityInsert(assigns: Seq[Assignment]): Unit = assigns.foreach { a =>
      (a.key, stripCast(a.value)) match {
        case (k: AttributeReference, v: AttributeReference)
          if k.name == v.name && sourceIds.contains(v.exprId) => ()
        case _ => unsupported(
          s"INSERT with an explicit column list ('${a.key.sql} = ${a.value.sql}')",
          "use INSERT * (or pre-project the source)")
      }
    }

    val clauses: Seq[MergeClause] =
      (m.matchedActions ++ m.notMatchedActions).map {
        case UpdateAction(c, assigns, fromStar) =>
          // A star expansion aligns EVERY column including the key —
          // whose assigned value is the source key, equal by the ON
          // condition: drop that identity pair instead of rejecting.
          val effective = if (fromStar)
            assigns.filterNot(_.key match {
              case attr: AttributeReference => attr.name == keyName
              case _ => false
            })
          else assigns
          MergeClause.Update(c.map(toSql), updateSet(effective))
        case UpdateStarAction(c) => MergeClause.Update(c.map(toSql),
          relation.output.collect {
            case attr if attr.name != keyName && sourceOut.exists(_.name == attr.name) =>
              attr.name -> s"s.`${attr.name}`"
          }.toMap)
        case DeleteAction(c) => MergeClause.Delete(c.map(toSql))
        case InsertAction(c, assigns) =>
          requireIdentityInsert(assigns); MergeClause.Insert(c.map(toSql))
        case InsertStarAction(c) => MergeClause.Insert(c.map(toSql))
        case other => unsupported(s"merge action $other", "UPDATE/DELETE/INSERT clauses")
      }
    GraftSqlMergeCommand(dir, m.sourceTable, clauses)
  }

  // ------------------------------------------------------------ DELETE

  private def convertDelete(rel: (DataSourceV2Relation, String),
                            condition: Expression): LogicalPlan = {
    val (relation, dir) = rel
    val keyName = FactStore.pruningSurface(session, dir)._1
    val keyAttr = relation.output.find(_.name == keyName).getOrElse(
      throw new IllegalStateException(s"graft relation lost its key column $keyName"))
    GraftSqlDeleteCommand(dir, Project(Seq(keyAttr), Filter(condition, relation)))
  }
}

/** UPDATE: materialize the post-image plan, commit via the one-scan
  * tombstone+data path. Returns nothing (standard DML shape). */
final case class GraftSqlUpdateCommand(dir: String, postImage: LogicalPlan)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def innerChildren: Seq[LogicalPlan] = Seq(postImage)
  override def run(spark: SparkSession): Seq[Row] = {
    val post = GraftInternalBridge.ofRows(spark, postImage)
    FactStore.update(spark, dir, post, GraftTableProvider.sizedFileCount(post))
    Seq.empty
  }
}

/** MERGE INTO: the resolved source plan + re-qualified clauses feed
  * the same FactStore.merge engine the GRAFT dialect uses. */
final case class GraftSqlMergeCommand(dir: String, source: LogicalPlan,
                                      clauses: Seq[FactStore.MergeClause])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val src = GraftInternalBridge.ofRows(spark, source)
    FactStore.merge(spark, dir, src, GraftTableProvider.sizedFileCount(src), clauses)
    Seq.empty
  }
}

/** DELETE with an untranslatable predicate: one pushed-down scan
  * projects the matching keys; one tombstone commit kills them. */
final case class GraftSqlDeleteCommand(dir: String, keys: LogicalPlan)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def innerChildren: Seq[LogicalPlan] = Seq(keys)
  override def run(spark: SparkSession): Seq[Row] = {
    FactStore.delete(spark, dir, GraftInternalBridge.ofRows(spark, keys))
    Seq.empty
  }
}
