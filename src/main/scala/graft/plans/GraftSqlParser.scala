package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}

import graft.sources.{FactStore, ManifestLog}

/** SQL surface for the lakehouse DML — the statement half the TVFs
  * cannot carry (a table-valued function reads; `MERGE`/`DELETE`/
  * `VACUUM` mutate). Injected via `SparkSessionExtensions.injectParser`
  * as a DELEGATING parser: statements starting with the `GRAFT` keyword
  * parse here into thin runnable commands over the [[FactStore]] API —
  * ONE implementation, no drift — and every other statement passes to
  * the session's own parser untouched.
  *
  * Grammar (case-insensitive keywords; `'<dir>'` is a single-quoted
  * store path OR — everywhere except BUILD and CLONE's target, which
  * create directories — a catalog table identifier whose `USING graft`
  * table resolves to its LOCATION, so DML and catalog reads name the
  * same table; `<source>` is a view name or a parenthesized query;
  * conditions and SET expressions are ordinary Spark SQL over the
  * aliases `t`/`s`, exactly the [[FactStore.MergeClause]] contract):
  *
  * {{{
  * GRAFT BUILD '<dir>' KEY <col> ORDER BY (<cols>) [STATS (<cols>)] [FILES <n>] USING <source>
  * GRAFT APPEND INTO '<dir>' [FILES <n>] USING <source>
  * GRAFT UPSERT INTO '<dir>' [FILES <n>] USING <source>
  * GRAFT OVERWRITE INTO '<dir>' [FILES <n>] USING <source>
  * GRAFT DELETE FROM '<dir>' WHERE <predicate>
  * GRAFT MERGE INTO '<dir>' [FILES <n>] USING <source>
  *   WHEN MATCHED [AND <cond>] THEN UPDATE SET <col> = <expr> [, …]
  *   WHEN MATCHED [AND <cond>] THEN DELETE
  *   WHEN NOT MATCHED [AND <cond>] THEN INSERT
  * GRAFT COMPACT '<dir>' [FILES <n>] [INCREMENTAL [TOMBFRAC <f>] [MAXFILES <n>]]
  * GRAFT VACUUM '<dir>' RETAIN <n> [VERSIONS|HOURS]
  * GRAFT RESTORE '<dir>' TO VERSION <n>
  * GRAFT CLONE '<src>' TO '<dst>'
  * GRAFT DESCRIBE '<dir>'
  * GRAFT RECLUSTER '<dir>' BY (<cols>)
  * GRAFT RENAME COLUMN <a> TO <b> IN '<dir>'
  * GRAFT DROP COLUMN <a> IN '<dir>'
  * GRAFT WIDEN COLUMN <a> TO <type> IN '<dir>'
  * GRAFT ADD CONSTRAINT <name> CHECK (<expr>) IN '<dir>'
  * GRAFT DROP CONSTRAINT <name> IN '<dir>'
  * GRAFT HISTORY '<dir>'
  * }}}
  *
  * Every DML statement returns one row `(version BIGINT)` — the
  * committed (or unchanged, for no-op DML) version, so scripts can
  * pin follow-up time-travel reads. `HISTORY` returns the audit trail
  * `(version, op, committed_at_ms)`. Malformed `GRAFT` statements fail
  * loudly at parse time — they never fall through to the delegate to
  * die as mysterious syntax errors.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    if (GraftSqlParser.Lead.pattern.matcher(sqlText).find())
      GraftSqlParser.parseGraft(sqlText)
    else delegate.parsePlan(sqlText)

  override def parsePlanWithParameters(sqlText: String, ctx: ParameterContext): LogicalPlan =
    if (GraftSqlParser.Lead.pattern.matcher(sqlText).find())
      GraftSqlParser.parseGraft(sqlText)
    else delegate.parsePlanWithParameters(sqlText, ctx)

  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier = delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier = delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] = delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  private[plans] val Lead = "(?is)^\\s*GRAFT\\b".r

  private def fail(msg: String, sql: String): Nothing =
    throw new IllegalArgumentException(s"GRAFT statement error: $msg\n  in: ${sql.trim}")

  /** Split `text` on top-level occurrences of keyword `kw` — depth-0
    * w.r.t. parentheses, outside single-quoted strings, AND outside
    * `CASE … END` expressions (tracked as their own depth axis, so an
    * unparenthesized CASE's WHEN/THEN never masquerades as MERGE
    * clause structure). Keyword matching is per-character
    * case-insensitive (`regionMatches(ignoreCase)`), never a whole-
    * string `toUpperCase` — characters whose uppercase EXPANDS (e.g.
    * 'ß' → "SS" inside a string literal) would desynchronize the
    * offsets. Returns the segments BETWEEN occurrences (first element
    * = text before the first occurrence).
    *
    * A bare identifier `case` (a column legally named so) is NOT
    * treated as opening a CASE expression when its CONTEXT says it is
    * a value reference: qualified (`t.case`), followed by a BINARY
    * operator/comma/closing-paren (`case = 5`, `f(case)`), or followed
    * by a predicate keyword (`case IS NULL`, `case AND …`,
    * `case NOT IN (…)`). An operator-LEADING next token (`CASE -x
    * WHEN …`, `CASE NOT x WHEN …`) still OPENS a CASE — those are
    * legal simple-CASE operands (round-13 advice). The residual
    * ambiguity — a column named `case` in unqualified arithmetic
    * (`case - 5`) — resolves toward CASE; backtick-quote such a
    * column. */
  private[plans] def splitTop(text: String, kw: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var caseDepth = 0; var inStr = false; var i = 0; var start = 0
    def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'
    def wordAt(i: Int, w: String): Boolean =
      text.regionMatches(true, i, w, 0, w.length) &&
        (i == 0 || !isWordChar(text.charAt(i - 1))) &&
        (i + w.length >= text.length || !isWordChar(text.charAt(i + w.length)))
    // The word at `i` spells CASE *and* reads as a CASE-expression
    // opener, not a column named `case` used as a value.
    def caseOpensAt(i: Int): Boolean = {
      if (!wordAt(i, "CASE")) return false
      var p = i - 1
      while (p >= 0 && text.charAt(p).isWhitespace) p -= 1
      if (p >= 0 && text.charAt(p) == '.') return false // t.case — qualified column
      var n = i + 4
      while (n < text.length && text.charAt(n).isWhitespace) n += 1
      if (n >= text.length) return false                 // trailing token
      val c = text.charAt(n)
      // Only BINARY operators demote: '-'/'+' can LEAD a simple-CASE
      // operand (`CASE -x WHEN …`), so they stay openers.
      if ("=<>!*/%,);".indexOf(c) >= 0) return false     // case = 5, f(case), …
      if (wordAt(n, "NOT")) {
        // `case NOT IN (…)` / `case NOT LIKE …` are value usages; a
        // bare NOT starts a simple-CASE operand (`CASE NOT x WHEN …`).
        var m = n + 3
        while (m < text.length && text.charAt(m).isWhitespace) m += 1
        return !Seq("IN", "LIKE", "BETWEEN", "RLIKE").exists(w => wordAt(m, w))
      }
      // `case IS NULL` / `case AND …` / `… THEN case END`-style usage:
      // a value position, not an expression opener.
      Seq("IS", "IN", "AND", "OR", "BETWEEN", "LIKE", "THEN", "END")
        .forall(w => !wordAt(n, w))
    }
    while (i < text.length) {
      val c = text.charAt(i)
      if (inStr) { if (c == '\'') inStr = false; i += 1 }
      else c match {
        case '\'' => inStr = true; i += 1
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case _ =>
          if (depth == 0 && caseOpensAt(i)) { caseDepth += 1; i += 4 }
          else if (depth == 0 && caseDepth > 0 && wordAt(i, "END")) { caseDepth -= 1; i += 3 }
          else if (depth == 0 && caseDepth == 0 && wordAt(i, kw)) {
            out += text.substring(start, i)
            start = i + kw.length
            i = start
          } else i += 1
      }
    }
    out += text.substring(start)
    out.toSeq
  }

  /** Split on top-level commas (for SET assignment lists). */
  private[plans] def splitCommas(text: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inStr = false; var i = 0; var start = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += text.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += text.substring(start)
    out.toSeq
  }

  private val VersionOut: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  // ---------------------------------------------------------- commands

  /** Resolve a `<source>` operand at run time: `(SELECT …)` runs as a
    * subquery, anything else is a table/view name. */
  private def sourceDf(spark: SparkSession, src: String) = {
    val trimmed = src.trim
    if (trimmed.startsWith("(") && trimmed.endsWith(")"))
      spark.sql(trimmed.substring(1, trimmed.length - 1))
    else spark.table(trimmed)
  }

  /** Resolve a store target at run time: a quoted token is a directory
    * path verbatim; a bare identifier resolves through the session
    * catalog to a `USING graft` table's LOCATION; a multi-part
    * identifier whose head names a V2 catalog (`graft.db.t`) resolves
    * through the TableCatalog — so `GRAFT VACUUM graft.db.t RETAIN 5`
    * and `SELECT * FROM graft.db.t` name one store. */
  private[plans] def resolveTarget(spark: SparkSession, tok: String): String =
    if (tok.startsWith("'")) tok.substring(1, tok.length - 1)
    else {
      val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(tok)
      org.apache.spark.sql.GraftInternalBridge.v2Table(spark, parts) match {
        case Some(g: graft.sources.GraftTable) => g.storeDir
        case Some(other) => throw new IllegalArgumentException(
          s"table $tok is not a graft table (got ${other.getClass.getSimpleName})")
        case None =>
          val meta = spark.sessionState.catalog.getTableMetadata(
            spark.sessionState.sqlParser.parseTableIdentifier(tok))
          require(meta.provider.exists(_.equalsIgnoreCase("graft")),
            s"table $tok is not a graft table (provider=${meta.provider.getOrElse("none")})")
          new org.apache.hadoop.fs.Path(meta.location).toString
      }
    }

  final case class GraftBuildCommand(dir: String, key: String, orderCols: Seq[String],
                                     statsCols: Seq[String], nFiles: Int, source: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = VersionOut
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(FactStore.build(sourceDf(spark, source),
        resolveTarget(spark, dir), key, orderCols, nFiles, statsCols)))
  }

  final case class GraftAppendCommand(dir: String, nFiles: Int, source: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = VersionOut
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(FactStore.append(spark, resolveTarget(spark, dir),
        sourceDf(spark, source), nFiles)))
  }

  final case class GraftUpsertCommand(dir: String, nFiles: Int, source: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = VersionOut
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(FactStore.upsert(spark, resolveTarget(spark, dir),
        sourceDf(spark, source), nFiles)))
  }

  final case class GraftOverwriteCommand(dir: String, nFiles: Int, source: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = VersionOut
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(FactStore.overwrite(spark, resolveTarget(spark, dir),
        sourceDf(spark, source), nFiles)))
  }

  final case class GraftDeleteCommand(dir: String, predicate: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = VersionOut
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(FactStore.deleteMatching(spark, resolveTarget(spark, dir), expr(predicate))))
  }

  final case class GraftMergeCommand(dir: String, nFiles: Int, source: String,
                                     clauses: Seq[FactStore.MergeClause])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = VersionOut
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(FactStore.merge(spark, resolveTarget(spark, dir),
        sourceDf(spark, source), nFiles, clauses)))
  }

  final case class GraftCompactCommand(dir: String, nFiles: Int, incremental: Boolean,
                                       tombFrac: Double, maxFiles: Int)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = VersionOut
    override def run(spark: SparkSession): Seq[Row] = {
      val d = resolveTarget(spark, dir)
      Seq(Row(
        if (incremental)
          FactStore.compactIncremental(spark, d, nFiles, tombFrac, maxFiles)._1
        else FactStore.compact(spark, d, nFiles)))
    }
  }

  final case class GraftVacuumCommand(dir: String, retain: Long, hours: Boolean)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = VersionOut
    override def run(spark: SparkSession): Seq[Row] = {
      val d = resolveTarget(spark, dir)
      if (hours) FactStore.vacuumOlderThan(spark, d, retain * 3600L * 1000L)
      else FactStore.vacuum(spark, d, retain.toInt)
      Seq(Row(FactStore.currentVersion(spark, d)))
    }
  }

  /** DESCRIBE DETAIL: the store's structural metadata as (property,
    * value) rows — version, key, clustering/stats columns, active
    * logical schema, constraints, segment/file/row counts. */
  final case class GraftDescribeCommand(dir: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("property", StringType, nullable = false)(),
      AttributeReference("value", StringType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      val d = resolveTarget(spark, dir)
      val snap = ManifestLog.snapshot(spark, d)
      val data = snap.segments.filter(_.kind == "data")
      val tombs = snap.segments.filter(_.kind == "tomb")
      val colmap = snap.meta.get("colmap").map(_.split(' ').toSeq
        .filter(_.nonEmpty).map(_.split('=')).map(p => (p(0), p(1))))
      Seq(
        Row("version", snap.version.toString),
        Row("last_op", snap.op),
        Row("committed_at_ms",
          ManifestLog.commitTimeMs(spark, d, snap.version).toString),
        Row("key_column", snap.meta.getOrElse("keyCol", "")),
        Row("order_columns", snap.meta.getOrElse("orderCols", "")),
        Row("stats_columns", snap.meta.getOrElse("statsCols", "")),
        Row("logical_schema",
          colmap.map(_.map(_._2).mkString(", ")).getOrElse("")),
        Row("constraints", FactStore.constraints(spark, d).toSeq.sorted
          .map { case (n, r) => s"$n: $r" }.mkString("; ")),
        Row("widened_columns", snap.meta.getOrElse("colwiden", "")),
        Row("data_segments", data.length.toString),
        Row("data_files", data.map(_.files.length).sum.toString),
        Row("data_rows", data.map(_.rows).sum.toString),
        Row("tombstone_segments", tombs.length.toString),
        Row("tombstone_rows", tombs.map(_.rows).sum.toString))
    }
  }

  final case class GraftCloneCommand(srcDir: String, dstDir: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = VersionOut
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(FactStore.clone(spark, resolveTarget(spark, srcDir),
        resolveTarget(spark, dstDir))))
  }

  final case class GraftRestoreCommand(dir: String, toVersion: Long)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = VersionOut
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(FactStore.restore(spark, resolveTarget(spark, dir), toVersion)))
  }

  final case class GraftReclusterCommand(dir: String, orderCols: Seq[String])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = VersionOut
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(FactStore.recluster(spark, resolveTarget(spark, dir), orderCols)))
  }

  final case class GraftRenameColumnCommand(dir: String, from: String, to: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = VersionOut
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(FactStore.renameColumn(spark, resolveTarget(spark, dir), from, to)))
  }

  final case class GraftDropColumnCommand(dir: String, name: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = VersionOut
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(FactStore.dropColumn(spark, resolveTarget(spark, dir), name)))
  }

  final case class GraftWidenColumnCommand(dir: String, name: String, toType: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = VersionOut
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(FactStore.widenColumn(spark, resolveTarget(spark, dir), name, toType)))
  }

  final case class GraftAddConstraintCommand(dir: String, name: String, rule: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = VersionOut
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(FactStore.addConstraint(spark, resolveTarget(spark, dir), name, rule)))
  }

  final case class GraftDropConstraintCommand(dir: String, name: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = VersionOut
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(FactStore.dropConstraint(spark, resolveTarget(spark, dir), name)))
  }

  final case class GraftHistoryCommand(dir: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)(),
      AttributeReference("op", StringType, nullable = false)(),
      AttributeReference("committed_at_ms", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      val d = resolveTarget(spark, dir)
      ManifestLog.snapshots(spark, d).map(s =>
        Row(s.version, s.op, ManifestLog.commitTimeMs(spark, d, s.version)))
    }
  }

  // ------------------------------------------------------------ parser

  private val Ident = "[A-Za-z_][A-Za-z0-9_]*"
  /** A store target token: a single-quoted path (captured WITH its
    * quotes) or a catalog table identifier — [[resolveTarget]]
    * disambiguates at run time. */
  private val Target = "('[^']+'|[A-Za-z_][A-Za-z0-9_.]*)"

  private def identList(body: String, sql: String): Seq[String] = {
    val cols = body.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    cols.foreach(c => if (!c.matches(Ident)) fail(s"'$c' is not a column identifier", sql))
    cols
  }

  private val BuildRe =
    ("(?is)^\\s*GRAFT\\s+BUILD\\s+('[^']+')\\s+KEY\\s+(" + Ident + ")\\s+ORDER\\s+BY\\s*\\(([^)]*)\\)" +
      "(?:\\s+STATS\\s*\\(([^)]*)\\))?(?:\\s+FILES\\s+(\\d+))?\\s+USING\\s+(.+?)\\s*;?\\s*$").r
  private val AppendRe =
    ("(?is)^\\s*GRAFT\\s+APPEND\\s+INTO\\s+" + Target + "(?:\\s+FILES\\s+(\\d+))?\\s+USING\\s+(.+?)\\s*;?\\s*$").r
  private val UpsertRe =
    ("(?is)^\\s*GRAFT\\s+UPSERT\\s+INTO\\s+" + Target + "(?:\\s+FILES\\s+(\\d+))?\\s+USING\\s+(.+?)\\s*;?\\s*$").r
  private val OverwriteRe =
    ("(?is)^\\s*GRAFT\\s+OVERWRITE\\s+INTO\\s+" + Target + "(?:\\s+FILES\\s+(\\d+))?\\s+USING\\s+(.+?)\\s*;?\\s*$").r
  private val DeleteRe =
    ("(?is)^\\s*GRAFT\\s+DELETE\\s+FROM\\s+" + Target + "\\s+WHERE\\s+(.+?)\\s*;?\\s*$").r
  private val MergeHeadRe =
    ("(?is)^\\s*GRAFT\\s+MERGE\\s+INTO\\s+" + Target + "(?:\\s+FILES\\s+(\\d+))?\\s+USING\\s+(.+?)\\s*$").r
  private val CompactRe =
    ("(?is)^\\s*GRAFT\\s+COMPACT\\s+" + Target + "(?:\\s+FILES\\s+(\\d+))?" +
      "(?:\\s+(INCREMENTAL)(?:\\s+TOMBFRAC\\s+([0-9.]+))?(?:\\s+MAXFILES\\s+(\\d+))?)?\\s*;?\\s*$").r
  private val VacuumRe =
    ("(?is)^\\s*GRAFT\\s+VACUUM\\s+" + Target + "\\s+RETAIN\\s+(\\d+)(?:\\s+(VERSIONS|HOURS))?\\s*;?\\s*$").r
  private val DescribeRe =
    ("(?is)^\\s*GRAFT\\s+DESCRIBE\\s+" + Target + "\\s*;?\\s*$").r
  private val CloneRe =
    ("(?is)^\\s*GRAFT\\s+CLONE\\s+" + Target + "\\s+TO\\s+('[^']+')\\s*;?\\s*$").r
  private val RestoreRe =
    ("(?is)^\\s*GRAFT\\s+RESTORE\\s+" + Target + "\\s+TO\\s+VERSION\\s+(\\d+)\\s*;?\\s*$").r
  private val ReclusterRe =
    ("(?is)^\\s*GRAFT\\s+RECLUSTER\\s+" + Target + "\\s+BY\\s*\\(([^)]*)\\)\\s*;?\\s*$").r
  private val RenameRe =
    ("(?is)^\\s*GRAFT\\s+RENAME\\s+COLUMN\\s+(" + Ident + ")\\s+TO\\s+(" + Ident +
      ")\\s+IN\\s+" + Target + "\\s*;?\\s*$").r
  private val DropRe =
    ("(?is)^\\s*GRAFT\\s+DROP\\s+COLUMN\\s+(" + Ident + ")\\s+IN\\s+" + Target + "\\s*;?\\s*$").r
  private val WidenRe =
    ("(?is)^\\s*GRAFT\\s+WIDEN\\s+COLUMN\\s+(" + Ident + ")\\s+TO\\s+([A-Za-z]+)" +
      "\\s+IN\\s+" + Target + "\\s*;?\\s*$").r
  private val HistoryRe =
    ("(?is)^\\s*GRAFT\\s+HISTORY\\s+" + Target + "\\s*;?\\s*$").r
  private val AddConstraintRe =
    ("(?is)^\\s*GRAFT\\s+ADD\\s+CONSTRAINT\\s+(" + Ident +
      ")\\s+CHECK\\s*\\((.+)\\)\\s+IN\\s+" + Target + "\\s*;?\\s*$").r
  private val DropConstraintRe =
    ("(?is)^\\s*GRAFT\\s+DROP\\s+CONSTRAINT\\s+(" + Ident +
      ")\\s+IN\\s+" + Target + "\\s*;?\\s*$").r

  private val MatchedHeadRe =
    "(?is)^\\s*MATCHED\\s*(?:AND\\s+(.+?))?\\s*$".r
  private val NotMatchedHeadRe =
    "(?is)^\\s*NOT\\s+MATCHED\\s*(?:AND\\s+(.+?))?\\s*$".r
  private val UpdateActionRe = "(?is)^\\s*UPDATE\\s+SET\\s+(.+?)\\s*;?\\s*$".r
  private val DeleteActionRe = "(?is)^\\s*DELETE\\s*;?\\s*$".r
  private val InsertActionRe = "(?is)^\\s*INSERT\\s*;?\\s*$".r

  /** Clause bodies split on the TOP-LEVEL `THEN` (paren- AND
    * CASE…END-aware, like the WHEN split), so a `CASE WHEN … THEN …
    * END` — parenthesized or naked — can appear inside a clause
    * condition or a SET expression: the splitter tracks CASE depth,
    * so a CASE's own WHEN/THEN keywords never read as clause
    * structure. */
  private def parseMergeClauses(parts: Seq[String], sql: String): Seq[FactStore.MergeClause] = {
    import FactStore.MergeClause._
    if (parts.isEmpty) fail("MERGE needs at least one WHEN clause", sql)
    parts.map { part =>
      val pieces = splitTop(part, "THEN")
      if (pieces.length < 2) fail(s"WHEN clause has no THEN: WHEN $part", sql)
      val head = pieces.head
      // SET expressions may themselves contain (parenthesized… but the
      // CASE's THEN sits at depth ≥ 1 then; rejoin defensively anyway).
      val action = pieces.tail.mkString("THEN")
      def parseAction(cond: Option[String], matchedSide: Boolean): FactStore.MergeClause =
        action match {
          case UpdateActionRe(setBody) if matchedSide =>
            val set = splitCommas(setBody).map { a =>
              val eq = a.indexOf('=')
              if (eq < 0) fail(s"SET assignment '$a' has no '='", sql)
              val c = a.substring(0, eq).trim
              if (!c.matches(Ident)) fail(s"SET target '$c' is not a column identifier", sql)
              c -> a.substring(eq + 1).trim
            }.toMap
            Update(cond, set)
          case DeleteActionRe() if matchedSide => Delete(cond)
          case InsertActionRe() if !matchedSide => Insert(cond)
          case _ => fail(s"unrecognized action for this WHEN side: $action", sql)
        }
      head match {
        case NotMatchedHeadRe(cond) => parseAction(Option(cond).map(_.trim), matchedSide = false)
        case MatchedHeadRe(cond) => parseAction(Option(cond).map(_.trim), matchedSide = true)
        case other => fail(s"unrecognized WHEN clause: WHEN $other", sql)
      }
    }
  }

  private[plans] def parseGraft(sql: String): LogicalPlan = sql match {
    case BuildRe(dir, key, orderBody, statsBody, files, source) =>
      val order = identList(orderBody, sql)
      val stats = Option(statsBody).map(identList(_, sql)).getOrElse(Seq.empty)
      GraftBuildCommand(dir, key, order, stats,
        Option(files).map(_.toInt).getOrElse(DefaultFiles), source.trim)
    case AppendRe(dir, files, source) =>
      GraftAppendCommand(dir, Option(files).map(_.toInt).getOrElse(DefaultFiles), source.trim)
    case UpsertRe(dir, files, source) =>
      GraftUpsertCommand(dir, Option(files).map(_.toInt).getOrElse(DefaultFiles), source.trim)
    case OverwriteRe(dir, files, source) =>
      GraftOverwriteCommand(dir, Option(files).map(_.toInt).getOrElse(DefaultFiles), source.trim)
    case DeleteRe(dir, pred) => GraftDeleteCommand(dir, pred)
    case CompactRe(dir, files, incr, frac, maxf) =>
      GraftCompactCommand(dir, Option(files).map(_.toInt).getOrElse(DefaultFiles),
        incr != null,
        Option(frac).map(_.toDouble).getOrElse(0.1),
        Option(maxf).map(_.toInt).getOrElse(Int.MaxValue))
    case VacuumRe(dir, retain, unit) =>
      GraftVacuumCommand(dir, retain.toLong,
        unit != null && unit.equalsIgnoreCase("HOURS"))
    case DescribeRe(dir) => GraftDescribeCommand(dir)
    case CloneRe(src, dst) => GraftCloneCommand(src, dst)
    case RestoreRe(dir, v) => GraftRestoreCommand(dir, v.toLong)
    case ReclusterRe(dir, body) => GraftReclusterCommand(dir, identList(body, sql))
    case RenameRe(from, to, dir) => GraftRenameColumnCommand(dir, from, to)
    case AddConstraintRe(name, rule, dir) => GraftAddConstraintCommand(dir, name, rule.trim)
    case DropConstraintRe(name, dir) => GraftDropConstraintCommand(dir, name)
    case DropRe(name, dir) => GraftDropColumnCommand(dir, name)
    case WidenRe(name, toType, dir) => GraftWidenColumnCommand(dir, name, toType)
    case HistoryRe(dir) => GraftHistoryCommand(dir)
    case _ =>
      // MERGE: split the WHEN clauses at top level first (conditions
      // may hold arbitrary expressions), then regex the head.
      val parts = splitTop(sql, "WHEN")
      if (parts.length >= 2) parts.head match {
        case MergeHeadRe(dir, files, source) =>
          GraftMergeCommand(dir, Option(files).map(_.toInt).getOrElse(DefaultFiles),
            source.trim, parseMergeClauses(parts.tail, sql))
        case _ => fail("unrecognized GRAFT statement", sql)
      }
      else fail("unrecognized GRAFT statement", sql)
  }

  /** Default data-segment file count when a statement omits `FILES n`
    * — sized for commit-granularity batches; large backfills should
    * say `FILES` explicitly. */
  val DefaultFiles = 8
}
