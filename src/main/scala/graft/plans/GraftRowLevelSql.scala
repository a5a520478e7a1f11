package graft.plans

import org.apache.spark.sql.{GraftInternalBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, EqualTo, Expression, Literal, NamedExpression, PredicateHelper}
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
  *     this path). Compound ON conditions lower their extra conjuncts
  *     into every MATCHED clause's condition (exact for matched-only
  *     merges; rejected loudly when insert/by-source clauses would
  *     change meaning), and `WHEN NOT MATCHED BY SOURCE`
  *     UPDATE/DELETE lower to the engine's anti-join BySource legs in
  *     the SAME one-commit merge.
  *   - DELETE with a predicate the `sources.Filter` algebra cannot
  *     carry (e.g. `user_id % 3 = 0`) — the shapes `SupportsDelete`
  *     must reject — lowers to key-projection + [[FactStore.delete]]:
  *     same single scan `deleteMatching` would pay, arbitrary
  *     predicates allowed. Translatable predicates keep riding the
  *     capability path untouched.
  *
  * Unsupported shapes fail LOUDLY with the supported alternative named
  * (never a silent fallback to Spark's "table does not support
  * row-level operations"): merge conditions with no key-equality
  * conjunct, extra ON conjuncts next to insert/by-source clauses,
  * non-identity insert column lists, schema-evolving merges, and
  * writes to version-pinned tables are all rejected with guidance.
  */
class GraftRowLevelSql(session: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

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
    if (m.withSchemaEvolution)
      unsupported("MERGE … WITH SCHEMA EVOLUTION",
        "new source columns already evolve the table additively; drop the clause")

    val sourceOut = m.sourceTable.output
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

    // ON must CONTAIN key equality under the SAME column name: the
    // commit layer matches generations on the store key, and the
    // insert leg lands the source row as-is (a differently-named key
    // column would ride in as a new field). Extra ON conjuncts are
    // legal with matched-only clauses, where demoting them into every
    // matched clause's condition is EXACT; with NOT MATCHED (insert)
    // or BY SOURCE clauses it is not — a key-matched pair failing the
    // extras would have to insert a SECOND row under an existing key
    // (and count as source-absent), which a key-unique store cannot
    // represent — rejected loudly rather than silently reinterpreted.
    def stripCast(e: Expression): Expression = e match {
      case c: Cast => stripCast(c.child); case other => other
    }
    def isKeyEquality(e: Expression): Boolean = stripCast(e) match {
      case EqualTo(l, r) => (stripCast(l), stripCast(r)) match {
        case (a: AttributeReference, b: AttributeReference)
          if (relation.outputSet.contains(a) && sourceIds.contains(b.exprId)) ||
             (relation.outputSet.contains(b) && sourceIds.contains(a.exprId)) =>
          val (tc, sc) = if (relation.outputSet.contains(a)) (a, b) else (b, a)
          tc.name == keyName && sc.name == keyName
        case _ => false
      }
      case _ => false
    }
    val (keyConjuncts, extraConjuncts) =
      splitConjunctivePredicates(m.mergeCondition).partition(isKeyEquality)
    if (keyConjuncts.isEmpty)
      unsupported(s"merge condition '${m.mergeCondition.sql}'",
        s"the commit layer matches on key equality — include the conjunct " +
          s"ON t.$keyName = s.$keyName (extra AND-conjuncts are supported " +
          "with matched clauses)")
    if (extraConjuncts.nonEmpty &&
        (m.notMatchedActions.nonEmpty || m.notMatchedBySourceActions.nonEmpty))
      unsupported("extra ON conjuncts combined with WHEN NOT MATCHED " +
        "[BY SOURCE] clauses",
        "a key-unique store cannot insert a second row under a " +
          "partially-matched key; move the extra predicate into the WHEN " +
          "clause conditions instead")
    val extraSql: Option[String] =
      extraConjuncts.map(e => s"(${toSql(e)})").reduceOption(_ + " AND " + _)
    def withExtra(c: Option[String]): Option[String] = (extraSql, c) match {
      case (None, x) => x
      case (some, None) => some
      case (Some(e), Some(x)) => Some(s"$e AND ($x)")
    }

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
          MergeClause.Update(withExtra(c.map(toSql)), updateSet(effective))
        case UpdateStarAction(c) =>
          // Likely unreachable post-analysis (stars resolve to
          // UpdateAction(fromStar = true)) — but if the analyzer ever
          // hands one through with a NARROWER source, silently leaving
          // the missing columns unchanged would violate UPDATE SET *'s
          // contract: reject loudly like every other unsupported shape.
          val missing = relation.output.map(_.name)
            .filterNot(n => n == keyName || sourceOut.exists(_.name == n))
          if (missing.nonEmpty)
            unsupported(s"UPDATE SET * with a source missing target " +
              s"column(s) ${missing.mkString(", ")}",
              "project the source to the full target schema or assign " +
                "columns explicitly")
          MergeClause.Update(withExtra(c.map(toSql)),
            relation.output.collect {
              case attr if attr.name != keyName =>
                attr.name -> s"s.`${attr.name}`"
            }.toMap)
        case DeleteAction(c) => MergeClause.Delete(withExtra(c.map(toSql)))
        case InsertAction(c, assigns) =>
          requireIdentityInsert(assigns); MergeClause.Insert(c.map(toSql))
        case InsertStarAction(c) => MergeClause.Insert(c.map(toSql))
        case other => unsupported(s"merge action $other", "UPDATE/DELETE/INSERT clauses")
      }
    // WHEN NOT MATCHED BY SOURCE → the engine's BySource legs: target
    // rows whose key is absent from the source, conditions/SET over
    // `t.*` only (the analyzer already rejects source references in
    // these clauses). Same one-commit atomicity — the anti-join leg
    // rides the SAME FactStore.merge call.
    val bySource: Seq[MergeClause] = m.notMatchedBySourceActions.map {
      case UpdateAction(c, assigns, _) =>
        MergeClause.BySourceUpdate(c.map(toSql), updateSet(assigns))
      case DeleteAction(c) => MergeClause.BySourceDelete(c.map(toSql))
      case other => unsupported(s"NOT MATCHED BY SOURCE action $other",
        "UPDATE and DELETE are the defined source-absence actions")
    }
    GraftSqlMergeCommand(dir, m.sourceTable, clauses ++ bySource)
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
