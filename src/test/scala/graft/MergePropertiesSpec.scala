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
