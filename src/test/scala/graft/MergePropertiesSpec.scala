package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{FactStore => F}

/** Top-level so Spark can derive its encoder (an inner case class has
  * no static scope to instantiate from). */
private[graft] case class MergePropEv(event_id: Long, user_id: Long, ts_us: Long,
                                      event_type: String, value: Double)

/** Randomized verification of [[FactStore.merge]]'s clause semantics
  * against an INDEPENDENT row-by-row reference: clause conditions and
  * SET expressions are drawn from a closed family with exact Scala
  * twins, the reference walks each (target, source) pair applying the
  * FIRST matching clause by hand, and the engine's post-merge read
  * must equal the reference's expected table exactly — across random
  * clause counts, orders, conditions, and source compositions. The
  * CepPropertiesSpec pattern applied to the lakehouse MERGE.
  */
class MergePropertiesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  // ---------------------------------------------------------- fixtures

  /** Deterministic pseudo-random doubles on a coarse grid (exact in
    * both the engine and the reference — no float drift). */
  private def val48(seed: Long, i: Long): Double =
    (java.lang.Long.remainderUnsigned(
      (seed * 6364136223846793005L + i * 1442695040888963407L) ^ 0x9E3779B97F4A7C15L,
      4000L) - 1000L) / 4.0

  private def mkRows(seed: Long, n: Int, keyBase: Long): Seq[MergePropEv] =
    (0 until n).map { i =>
      MergePropEv(keyBase + i, (seed + i) % 7, 1700000000000000L + i * 1000000L,
        s"t${(seed + i) % 3}", val48(seed, i))
    }

  // --------------------------------- the closed clause family + twins

  private sealed trait Cond {
    def sql: String
    def eval(s: MergePropEv, t: Option[MergePropEv]): Boolean
  }
  private case object CondAlways extends Cond {
    val sql = ""; def eval(s: MergePropEv, t: Option[MergePropEv]) = true
  }
  private final case class CondSrcGe(c: Double) extends Cond {
    def sql = s"s.value >= $c"
    def eval(s: MergePropEv, t: Option[MergePropEv]) = s.value >= c
  }
  private final case class CondTgtGe(c: Double) extends Cond {
    def sql = s"t.value >= $c"
    def eval(s: MergePropEv, t: Option[MergePropEv]) = t.exists(_.value >= c)
  }
  private case object CondSrcGeTgt extends Cond {
    val sql = "s.value >= t.value"
    def eval(s: MergePropEv, t: Option[MergePropEv]) = t.exists(s.value >= _.value)
  }

  private sealed trait SetExpr {
    def sql: String
    def eval(s: MergePropEv, t: MergePropEv): Double
  }
  private case object SetSrc extends SetExpr {
    val sql = "s.value"; def eval(s: MergePropEv, t: MergePropEv) = s.value
  }
  private case object SetTgtPlus extends SetExpr {
    val sql = "t.value + 1.0"; def eval(s: MergePropEv, t: MergePropEv) = t.value + 1.0
  }
  private case object SetSum extends SetExpr {
    val sql = "s.value + t.value"; def eval(s: MergePropEv, t: MergePropEv) = s.value + t.value
  }

  private sealed trait RefClause
  private final case class RUpd(cond: Cond, set: SetExpr, tag: String) extends RefClause
  private final case class RDel(cond: Cond) extends RefClause
  private final case class RIns(cond: Cond) extends RefClause

  private def toEngine(c: RefClause): F.MergeClause = c match {
    case RUpd(cond, set, tag) => F.MergeClause.Update(
      Option(cond.sql).filter(_.nonEmpty),
      Map("value" -> set.sql, "event_type" -> s"'$tag'"))
    case RDel(cond) => F.MergeClause.Delete(Option(cond.sql).filter(_.nonEmpty))
    case RIns(cond) => F.MergeClause.Insert(Option(cond.sql).filter(_.nonEmpty))
  }

  /** The independent reference: first-match per matched pair, insert
    * admission = any insert clause's condition, untouched rows carry. */
  private def refMerge(target: Seq[MergePropEv], source: Seq[MergePropEv],
                       clauses: Seq[RefClause]): Seq[MergePropEv] = {
    val byKey = target.map(e => e.event_id -> e).toMap
    val matchedClauses = clauses.collect { case u: RUpd => u; case d: RDel => d }
    val insertConds = clauses.collect { case RIns(c) => c }
    var out = scala.collection.mutable.LinkedHashMap(
      target.map(e => e.event_id -> e): _*)
    source.foreach { s =>
      byKey.get(s.event_id) match {
        case Some(t) =>
          matchedClauses.find {
            case RUpd(c, _, _) => c.eval(s, Some(t))
            case RDel(c) => c.eval(s, Some(t))
          } match {
            case Some(RUpd(_, set, tag)) =>
              out(s.event_id) = t.copy(value = set.eval(s, t), event_type = tag)
            case Some(RDel(_)) => out.remove(s.event_id)
            case _ => // untouched
          }
        case None =>
          if (insertConds.exists(_.eval(s, None))) out(s.event_id) = s
      }
    }
    out.values.toSeq
  }

  private def df(rows: Seq[MergePropEv]): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }

  private def canon(d: DataFrame): Seq[String] =
    d.select("event_id", "user_id", "ts_us", "event_type", "value")
      .collect().map(_.toString).toSeq.sorted

  private def canon(rows: Seq[MergePropEv]): Seq[String] =
    rows.map(e => Row(e.event_id, e.user_id, e.ts_us, e.event_type, e.value).toString)
      .sorted

  // ----------------------------------------------------------- driver

  /** A clause list as standard `MERGE INTO` text. Matched clauses keep
    * their relative order (first-match semantics); an unconditioned
    * matched clause shadows everything after it, so the emitted list
    * truncates there — Spark's analyzer requires only the LAST matched
    * clause may omit its condition. */
  private def mergeSql(tbl: String, srcView: String, clauses: Seq[RefClause]): String = {
    val matched0 = clauses.collect { case u: RUpd => u; case d: RDel => d }
    val cut = matched0.indexWhere {
      case RUpd(CondAlways, _, _) => true; case RDel(CondAlways) => true; case _ => false
    }
    val matched = if (cut < 0) matched0 else matched0.take(cut + 1)
    val inserts = clauses.collect { case i: RIns => i }
    def andOf(c: Cond) = if (c.sql.isEmpty) "" else s"AND ${c.sql} "
    val body = matched.map {
      case RUpd(c, set, tag) =>
        s"WHEN MATCHED ${andOf(c)}THEN UPDATE SET value = ${set.sql}, event_type = '$tag'"
      case RDel(c) => s"WHEN MATCHED ${andOf(c)}THEN DELETE"
    } ++ inserts.map(i => s"WHEN NOT MATCHED ${andOf(i.cond)}THEN INSERT *")
    s"""MERGE INTO $tbl t USING $srcView s ON t.event_id = s.event_id
        ${body.mkString("\n        ")}"""
  }

  /** The reference twin of the truncation above. */
  private def truncateShadowed(clauses: Seq[RefClause]): Seq[RefClause] = {
    val matched0 = clauses.collect { case u: RUpd => u; case d: RDel => d }
    val cut = matched0.indexWhere {
      case RUpd(CondAlways, _, _) => true; case RDel(CondAlways) => true; case _ => false
    }
    val matched: Seq[RefClause] = if (cut < 0) matched0 else matched0.take(cut + 1)
    matched ++ clauses.collect { case i: RIns => i }
  }

  test("standard MERGE INTO (no GRAFT dialect) ≡ the independent reference: random clause sets through the SQL surface (20 cases)") {
    val rnd = new scala.util.Random(20260817L)
    for (caseNo <- 1 to 20) {
      val seed = rnd.nextLong()
      val target = mkRows(seed, 60, 0L)
      val matchedPart = mkRows(seed + 1, 40, 0L).filter(_.event_id % 3 != 1)
      val newPart = mkRows(seed + 2, 25, 1000L)
      val source = rnd.shuffle(matchedPart ++ newPart)
      def cond(): Cond = rnd.nextInt(4) match {
        case 0 => CondAlways
        case 1 => CondSrcGe(val48(seed + 3, rnd.nextInt(50)))
        case 2 => CondTgtGe(val48(seed + 4, rnd.nextInt(50)))
        case _ => CondSrcGeTgt
      }
      def set(): SetExpr = rnd.nextInt(3) match {
        case 0 => SetSrc; case 1 => SetTgtPlus; case _ => SetSum
      }
      def insCond(): Cond =
        if (rnd.nextBoolean()) CondAlways
        else CondSrcGe(val48(seed + 5, rnd.nextInt(50)))
      val nUpd = rnd.nextInt(3)
      val clauses = rnd.shuffle(
        (1 to nUpd).map(i => RUpd(cond(), set(), s"u$i")) ++
          (if (rnd.nextBoolean()) Seq(RDel(cond())) else Nil) ++
          (if (rnd.nextBoolean()) Seq(RIns(insCond())) else Nil))
      if (clauses.nonEmpty && truncateShadowed(clauses).nonEmpty) {
        val d = Files.createTempDirectory(s"graft_mergesql_$caseNo").toString
        F.build(df(target), d, "event_id", Seq("user_id", "ts_us"), 2)
        val tbl = s"graft_mergeprop_sql_$caseNo"
        spark.sql(s"CREATE TABLE $tbl USING graft LOCATION '$d'")
        df(source).createOrReplaceTempView(s"graft_mergeprop_src_$caseNo")
        spark.sql(mergeSql(tbl, s"graft_mergeprop_src_$caseNo", clauses))
        val got = canon(F.read(spark, d))
        val want = canon(refMerge(target, source, truncateShadowed(clauses)))
        assert(got == want,
          s"case $caseNo diverged: clauses=$clauses\n got=${got.take(5)}\n want=${want.take(5)}")
      }
    }
  }

  // ----------------- round-13 shapes: BY SOURCE + compound ON

  /** By-source conditions see only the target row (there is no source
    * row on that side — the engine rejects `s.` references loudly). */
  private sealed trait TCond { def sql: String; def eval(t: MergePropEv): Boolean }
  private case object TAlways extends TCond {
    val sql = ""; def eval(t: MergePropEv) = true
  }
  private final case class TTgtGe(c: Double) extends TCond {
    def sql = s"t.value >= $c"; def eval(t: MergePropEv) = t.value >= c
  }
  private final case class TUserMod(m: Long, r: Long) extends TCond {
    def sql = s"t.user_id % $m = $r"; def eval(t: MergePropEv) = t.user_id % m == r
  }

  private sealed trait BsClause
  private final case class BsUpd(cond: TCond, bump: Double, tag: String) extends BsClause
  private final case class BsDel(cond: TCond) extends BsClause

  /** Reference for the FULL clause surface: matched pairs first-match
    * over (extra ON conjunct AND clause condition); source-absent
    * target rows first-match over the by-source clauses; inserts as
    * before (only legal without extra conjuncts). */
  private def refMergeFull(target: Seq[MergePropEv], source: Seq[MergePropEv],
                           clauses: Seq[RefClause], bySource: Seq[BsClause],
                           extra: Option[Cond]): Seq[MergePropEv] = {
    val srcKeys = source.map(_.event_id).toSet
    val byKey = target.map(e => e.event_id -> e).toMap
    val matchedClauses = clauses.collect { case u: RUpd => u; case d: RDel => d }
    val insertConds = clauses.collect { case RIns(c) => c }
    val out = scala.collection.mutable.LinkedHashMap(
      target.map(e => e.event_id -> e): _*)
    source.foreach { s =>
      byKey.get(s.event_id) match {
        case Some(t) if extra.forall(_.eval(s, Some(t))) =>
          matchedClauses.find {
            case RUpd(c, _, _) => c.eval(s, Some(t))
            case RDel(c) => c.eval(s, Some(t))
          } match {
            case Some(RUpd(_, set, tag)) =>
              out(s.event_id) = t.copy(value = set.eval(s, t), event_type = tag)
            case Some(RDel(_)) => out.remove(s.event_id)
            case _ =>
          }
        case Some(_) => // key matched but extra conjunct failed: no-op
        case None =>
          if (insertConds.exists(_.eval(s, None))) out(s.event_id) = s
      }
    }
    target.filterNot(t => srcKeys.contains(t.event_id)).foreach { t =>
      bySource.find {
        case BsUpd(c, _, _) => c.eval(t); case BsDel(c) => c.eval(t)
      } match {
        case Some(BsUpd(_, bump, tag)) if out.contains(t.event_id) =>
          out(t.event_id) = t.copy(value = t.value + bump, event_type = tag)
        case Some(BsDel(_)) => out.remove(t.event_id)
        case _ =>
      }
    }
    out.values.toSeq
  }

  test("WHEN NOT MATCHED BY SOURCE through standard MERGE INTO ≡ the reference (15 cases, one-commit atomicity)") {
    val rnd = new scala.util.Random(20260818L)
    for (caseNo <- 1 to 15) {
      val seed = rnd.nextLong()
      val target = mkRows(seed, 60, 0L)
      val matchedPart = mkRows(seed + 1, 40, 0L).filter(_.event_id % 3 != 1)
      val newPart = mkRows(seed + 2, 25, 1000L)
      val source = rnd.shuffle(matchedPart ++ newPart)
      def tcond(): TCond = rnd.nextInt(3) match {
        case 0 => TAlways
        case 1 => TTgtGe(val48(seed + 6, rnd.nextInt(50)))
        case _ => TUserMod(3 + rnd.nextInt(3), rnd.nextInt(3))
      }
      val matched: Seq[RefClause] =
        if (rnd.nextBoolean()) Seq(RUpd(CondSrcGeTgt, SetSrc, "m1")) else Nil
      val inserts: Seq[RefClause] =
        if (rnd.nextBoolean()) Seq(RIns(CondAlways)) else Nil
      val bySource0 = rnd.shuffle(
        (if (rnd.nextBoolean()) Seq(BsUpd(tcond(), 5.0, "bs1")) else Nil) ++
          Seq[BsClause](if (rnd.nextBoolean()) BsDel(tcond()) else BsUpd(tcond(), -2.0, "bs2")))
      // Spark requires only the LAST by-source clause may omit its
      // condition — truncate at the first unconditioned one.
      val cut = bySource0.indexWhere {
        case BsUpd(TAlways, _, _) => true; case BsDel(TAlways) => true; case _ => false
      }
      val bySource = if (cut < 0) bySource0 else bySource0.take(cut + 1)

      val d = Files.createTempDirectory(s"graft_mergebs_$caseNo").toString
      F.build(df(target), d, "event_id", Seq("user_id", "ts_us"), 2)
      val tbl = s"graft_mergebs_sql_$caseNo"
      spark.sql(s"CREATE TABLE $tbl USING graft LOCATION '$d'")
      df(source).createOrReplaceTempView(s"graft_mergebs_src_$caseNo")
      def andOf(sql: String) = if (sql.isEmpty) "" else s"AND $sql "
      val body =
        matched.collect { case RUpd(c, set, tag) =>
          s"WHEN MATCHED ${andOf(c.sql)}THEN UPDATE SET value = ${set.sql}, event_type = '$tag'"
        } ++
        inserts.collect { case RIns(c) =>
          s"WHEN NOT MATCHED ${andOf(c.sql)}THEN INSERT *" } ++
        bySource.map {
          case BsUpd(c, bump, tag) =>
            s"WHEN NOT MATCHED BY SOURCE ${andOf(c.sql)}THEN UPDATE SET " +
              s"value = t.value + $bump, event_type = '$tag'"
          case BsDel(c) => s"WHEN NOT MATCHED BY SOURCE ${andOf(c.sql)}THEN DELETE"
        }
      val before = F.currentVersion(spark, d)
      spark.sql(
        s"""MERGE INTO $tbl t USING graft_mergebs_src_$caseNo s ON t.event_id = s.event_id
            ${body.mkString("\n            ")}""")
      assert(F.currentVersion(spark, d) <= before + 1,
        "matched + insert + by-source legs must land as ONE commit")
      val got = canon(F.read(spark, d))
      val want = canon(refMergeFull(target, source, matched ++ inserts, bySource, None))
      assert(got == want,
        s"case $caseNo diverged: matched=$matched inserts=$inserts bySource=$bySource\n" +
          s" got=${got.take(5)}\n want=${want.take(5)}")
    }
  }

  test("compound ON: extra conjuncts lower into every matched clause's condition (10 cases); unsound combinations rejected loudly") {
    val rnd = new scala.util.Random(20260819L)
    for (caseNo <- 1 to 10) {
      val seed = rnd.nextLong()
      val target = mkRows(seed, 60, 0L)
      val source = rnd.shuffle(mkRows(seed + 1, 40, 0L).filter(_.event_id % 3 != 1))
      val extra: Cond = rnd.nextInt(3) match {
        case 0 => CondSrcGe(val48(seed + 3, rnd.nextInt(50)))
        case 1 => CondTgtGe(val48(seed + 4, rnd.nextInt(50)))
        case _ => CondSrcGeTgt
      }
      val clauses: Seq[RefClause] = Seq(
        RUpd(CondSrcGe(val48(seed + 5, rnd.nextInt(50))), SetSum, "u1"),
        if (rnd.nextBoolean()) RDel(CondAlways) else RUpd(CondAlways, SetTgtPlus, "u2"))
      val d = Files.createTempDirectory(s"graft_mergeon_$caseNo").toString
      F.build(df(target), d, "event_id", Seq("user_id", "ts_us"), 2)
      val tbl = s"graft_mergeon_sql_$caseNo"
      spark.sql(s"CREATE TABLE $tbl USING graft LOCATION '$d'")
      df(source).createOrReplaceTempView(s"graft_mergeon_src_$caseNo")
      def andOf(c: Cond) = if (c.sql.isEmpty) "" else s"AND ${c.sql} "
      val body = clauses.map {
        case RUpd(c, set, tag) =>
          s"WHEN MATCHED ${andOf(c)}THEN UPDATE SET value = ${set.sql}, event_type = '$tag'"
        case RDel(c) => s"WHEN MATCHED ${andOf(c)}THEN DELETE"
        case _ => ""
      }
      spark.sql(
        s"""MERGE INTO $tbl t USING graft_mergeon_src_$caseNo s
            ON t.event_id = s.event_id AND ${extra.sql}
            ${body.mkString("\n            ")}""")
      val got = canon(F.read(spark, d))
      val want = canon(refMergeFull(target, source, clauses, Nil, Some(extra)))
      assert(got == want,
        s"case $caseNo diverged: extra=$extra clauses=$clauses\n" +
          s" got=${got.take(5)}\n want=${want.take(5)}")
    }
    // Extra conjuncts + NOT MATCHED would silently change meaning on a
    // key-unique store — the rule must refuse, naming the fix.
    val d = Files.createTempDirectory("graft_mergeon_rej").toString
    F.build(df(mkRows(1L, 20, 0L)), d, "event_id", Seq("user_id", "ts_us"), 2)
    spark.sql(s"CREATE TABLE graft_mergeon_rej USING graft LOCATION '$d'")
    df(mkRows(2L, 20, 10L)).createOrReplaceTempView("graft_mergeon_rej_src")
    val e = intercept[Exception](spark.sql(
      """MERGE INTO graft_mergeon_rej t USING graft_mergeon_rej_src s
         ON t.event_id = s.event_id AND s.value >= 0
         WHEN MATCHED THEN UPDATE SET value = s.value
         WHEN NOT MATCHED THEN INSERT *"""))
    assert(e.getMessage.contains("extra ON conjuncts"), s"got: ${e.getMessage}")
    // A merge condition with NO key-equality conjunct stays rejected.
    val e2 = intercept[Exception](spark.sql(
      """MERGE INTO graft_mergeon_rej t USING graft_mergeon_rej_src s
         ON t.user_id = s.user_id
         WHEN MATCHED THEN UPDATE SET value = s.value"""))
    assert(e2.getMessage.contains("key equality"), s"got: ${e2.getMessage}")
  }

  test("random clause sets: engine merge ≡ independent reference (40 cases)") {
    val rnd = new scala.util.Random(20260816L)
    for (caseNo <- 1 to 40) {
      val seed = rnd.nextLong()
      val target = mkRows(seed, 60, 0L)
      // Source: a matched slice (fresh values, same keys) + unmatched
      // fresh keys; key-unique by construction.
      val matchedPart = mkRows(seed + 1, 40, 0L).filter(_.event_id % 3 != 1)
      val newPart = mkRows(seed + 2, 25, 1000L)
      val source = rnd.shuffle(matchedPart ++ newPart)

      def cond(): Cond = rnd.nextInt(4) match {
        case 0 => CondAlways
        case 1 => CondSrcGe(val48(seed + 3, rnd.nextInt(50)))
        case 2 => CondTgtGe(val48(seed + 4, rnd.nextInt(50)))
        case _ => CondSrcGeTgt
      }
      def set(): SetExpr = rnd.nextInt(3) match {
        case 0 => SetSrc; case 1 => SetTgtPlus; case _ => SetSum
      }
      // Insert conditions see only s.* (the not-matched side has no
      // target row) — the engine rejects a t-reference there loudly.
      def insCond(): Cond =
        if (rnd.nextBoolean()) CondAlways
        else CondSrcGe(val48(seed + 5, rnd.nextInt(50)))
      val nUpd = rnd.nextInt(3)
      val clauses = rnd.shuffle(
        (1 to nUpd).map(i => RUpd(cond(), set(), s"u$i")) ++
          (if (rnd.nextBoolean()) Seq(RDel(cond())) else Nil) ++
          (if (rnd.nextBoolean()) Seq(RIns(insCond())) else Nil))
      if (clauses.nonEmpty) {
        val d = Files.createTempDirectory(s"graft_mergeprop_$caseNo").toString
        F.build(df(target), d, "event_id", Seq("user_id", "ts_us"), 2)
        F.merge(spark, d, df(source), 2, clauses.map(toEngine))
        val got = canon(F.read(spark, d))
        val want = canon(refMerge(target, source, clauses))
        assert(got == want,
          s"case $caseNo diverged: clauses=$clauses\n got=${got.take(5)}\n want=${want.take(5)}")
      }
    }
  }
}
