package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Behavior, Cep, CepStep, Profile}
import graft.sources.Tables

/** Semantic invariants of the product-analytics operators (Q130-Q135)
  * that the oracle hash can't state directly: attribution conserves
  * credit exactly, the lookback window's boundaries are the declared
  * half-open (ts, id) order, arms partition the users, the
  * embedding-drift monitor is exact under cohort-collapse, the KM
  * curve telescopes, and the CUSUM closed form equals the textbook
  * recursion.
  */
class BehaviorSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private val WindowUs = 604800000000L

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private lazy val events = Tables.events(spark, sf)

  private def mkEvents(rows: Seq[(Long, Long, Long, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts_us", "user_id", "event_type")
  }

  test("Q130: every attribution model conserves credit — exactly 1e6 ppm per converting purchase") {
    val nConverting = Behavior.conversionTouches(events, WindowUs).count()
    assert(nConverting > 0)
    val byModel = Behavior.attributionReport(events, WindowUs)
      .groupBy("model").agg(sum("credit_ppm").as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byModel.keySet == Set("first", "last", "linear"))
    byModel.foreach { case (m, total) =>
      assert(total == nConverting * 1000000L,
        s"model $m leaked credit: $total != ${nConverting * 1000000L}")
    }
  }

  test("Q130: window boundaries — half-open on the (ts, id) order, lookback inclusive at exactly -window") {
    // touch A at p.ts - window (inclusive edge: counts), touch B at the
    // same microsecond as the purchase with a smaller id (counts),
    // touch C one microsecond after (excluded), touch D one microsecond
    // before the window opens (excluded).
    val t0 = 10_000_000_000L
    val per = Behavior.conversionTouches(mkEvents(Seq(
      (1L, t0 - WindowUs, 7L, "view"), // A: inclusive lower edge
      (2L, t0, 7L, "click"), // B: same ts, id < pid -> in
      (9L, t0, 7L, "view"), // C': same ts, id > pid -> out
      (3L, t0 + 1L, 7L, "view"), // C: after purchase -> out
      (4L, t0 - WindowUs - 1L, 7L, "click"), // D: before window -> out
      (5L, t0, 7L, "purchase"))), WindowUs).collect()
    assert(per.length == 1)
    val r = per.head
    assert(r.getLong(r.fieldIndex("n_touches")) == 2L)
    assert(r.getString(r.fieldIndex("first_type")) == "view")
    assert(r.getString(r.fieldIndex("last_type")) == "click")
  }

  test("Q130: linear remainder lands on the last touch and credits stay non-negative") {
    // 3 touches -> base 333333, remainder 1 to the last (a click).
    val t0 = 10_000_000_000L
    val rep = Behavior.attributionReport(mkEvents(Seq(
      (1L, t0 - 3000L, 1L, "view"),
      (2L, t0 - 2000L, 1L, "view"),
      (3L, t0 - 1000L, 1L, "click"),
      (4L, t0, 1L, "purchase"))), WindowUs)
      .where(col("model") === "linear")
      .collect().map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(rep == Map("view" -> 666666L, "click" -> 333334L))
  }

  test("Q131: arms partition the exposed users and the readout is deterministic") {
    val out = Behavior.abReadout(events, "ab", 4, 86400000000L).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    val nUsers = out.map(r => r.getLong(r.fieldIndex("n_users"))).sum
    assert(nUsers == events.select("user_id").distinct().count())
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_conv")) <= r.getLong(r.fieldIndex("n_users")))
      assert(r.getBoolean(r.fieldIndex("significant")) ==
        out.head.getBoolean(out.head.fieldIndex("significant")))
    }
    val again = Behavior.abReadout(events, "ab", 4, 86400000000L).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("Q131: the integer z² verdict fires on a constructed separation and stays quiet on identical arms") {
    // Construct users whose arm assignment we read back from the
    // operator itself, then give one arm a much higher conversion rate.
    import spark.implicits._
    val base = (0L until 400L).map(u => (u, u, u, "view")) // everyone exposed
    val armOf = Behavior.abReadout(mkEvents(base), "ab", 4, 86400000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(armOf.values.sum == 400L)
    // arm of each user via the same hash the operator uses:
    val assignment = mkEvents(base)
      .select(col("user_id"), expr(
        s"${graft.functions.PortableHash.hash48("concat('ab', ':', CAST(user_id AS STRING))")} % 2").as("arm"))
      .as[(Long, Long)].collect().toMap
    val sep = base ++ (0L until 400L).filter(u => assignment(u) == 0L)
      .map(u => (1000L + u, 1000L + u, u, "purchase"))
    val verdictSep = Behavior.abReadout(mkEvents(sep), "ab", 4, 86400000000L)
      .select("significant").head.getBoolean(0)
    assert(verdictSep, "a 100%-vs-0% split must be significant")
    val verdictFlat = Behavior.abReadout(mkEvents(base), "ab", 4, 86400000000L)
      .select("significant").head.getBoolean(0)
    assert(!verdictFlat, "identical 0% arms must not be significant")
  }

  test("Q138: the CEP automaton — inclusive step boundary, timeout re-anchoring, strict first match, non-overlap") {
    val W = 1000L
    def run(evs: (Long, Long, Long, String)*) =
      Behavior.cepMatches(mkEvents(evs), W)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // Inclusive boundary: click exactly AT view_ts + W is inside.
    assert(run((1, 0, 1, "view"), (2, W, 1, "click"), (3, W + 10, 1, "purchase"))
      == Seq((1L, 1L, 1L, 2L, 3L, W + 10L)))
    // One past the boundary times out — and a timing-out VIEW
    // re-anchors (the reprocess-in-state-0 rule).
    assert(run((1, 0, 1, "view"), (2, W + 1, 1, "click"), (3, W + 2, 1, "purchase")).isEmpty)
    assert(run((1, 0, 1, "view"), (2, W + 1, 1, "view"),
      (3, W + 2, 1, "click"), (4, W + 3, 1, "purchase"))
      == Seq((1L, 1L, 2L, 3L, 4L, 2L)))
    // Strict first match: a second view INSIDE the window is ignored;
    // credit stays with the first anchor.
    assert(run((1, 0, 1, "view"), (2, 10, 1, "view"),
      (3, 20, 1, "click"), (4, 30, 1, "purchase"))
      == Seq((1L, 1L, 1L, 3L, 4L, 30L)))
    // Non-overlap: the purchase consumes the partial state — a second
    // purchase needs a whole new view→click chain.
    assert(run((1, 0, 1, "view"), (2, 10, 1, "click"),
      (3, 20, 1, "purchase"), (4, 30, 1, "purchase")).size == 1)
    assert(run((1, 0, 1, "view"), (2, 10, 1, "click"), (3, 20, 1, "purchase"),
      (4, 30, 1, "view"), (5, 40, 1, "click"), (6, 50, 1, "purchase"))
      .map(_._2) == Seq(1L, 2L))
  }

  test("Q139: generalized CEP — per-step value predicates, heterogeneous timeouts, 4 steps") {
    import spark.implicits._
    def mk(rows: Seq[(Long, Long, Long, String, Double)]) =
      rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
    val pat = Seq(
      CepStep("signup"),
      CepStep("view", timeoutUs = 2000L),
      CepStep("click", timeoutUs = 1000L),
      CepStep("purchase", minValue = Some(50.0), timeoutUs = 1000L))
    def run(evs: (Long, Long, Long, String, Double)*) =
      Cep.matchesGeneric(mk(evs), pat)
        .select("user_id", "match_no", "step_event_ids", "duration_us")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2), r.getLong(3)))
        .toSeq
    // Full chain with heterogeneous timeouts: view at signup+1500 is
    // inside ITS 2000 window; click/purchase inside their 1000s.
    assert(run((1, 0, 7, "signup", 0), (2, 1500, 7, "view", 0),
      (3, 2000, 7, "click", 0), (4, 2500, 7, "purchase", 99))
      == Seq((7L, 1L, Seq(1L, 2L, 3L, 4L), 2500L)))
    // The SAME gap on the click step (1000-limit) times out instead.
    assert(run((1, 0, 7, "signup", 0), (2, 1500, 7, "view", 0),
      (3, 3000, 7, "click", 0), (4, 3100, 7, "purchase", 99)).isEmpty)
    // Value predicate: a purchase below the floor neither closes the
    // match nor kills it — a later qualifying purchase inside the
    // window still closes.
    assert(run((1, 0, 7, "signup", 0), (2, 100, 7, "view", 0),
      (3, 200, 7, "click", 0), (4, 300, 7, "purchase", 49.99),
      (5, 400, 7, "purchase", 50.0))
      == Seq((7L, 1L, Seq(1L, 2L, 3L, 5L), 400L)))
    // Null value never satisfies a minValue predicate.
    assert(run((1, 0, 7, "signup", 0), (2, 100, 7, "view", 0),
      (3, 200, 7, "click", 0), (4, 300, 7, "purchase", Double.NaN)).isEmpty)
    // Timeout-then-reprocess generalizes: a signup arriving past the
    // view window resets AND re-anchors.
    assert(run((1, 0, 7, "signup", 0), (2, 2500, 7, "signup", 0),
      (3, 2600, 7, "view", 0), (4, 2700, 7, "click", 0),
      (5, 2800, 7, "purchase", 77))
      == Seq((7L, 1L, Seq(2L, 3L, 4L, 5L), 300L)))
  }

  test("Q139b: quantified steps — exact counts, per-gap timeouts, greedy strictness") {
    import spark.implicits._
    def mk(rows: Seq[(Long, Long, Long, String, Double)]) =
      rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
    val pat = Seq(
      CepStep("click", timeoutUs = 1000L, times = 3),
      CepStep("purchase", minValue = Some(30.0), timeoutUs = 2000L))
    def run(evs: (Long, Long, Long, String, Double)*) =
      Cep.matchesGeneric(mk(evs), pat)
        .select("user_id", "match_no", "step_event_ids", "duration_us")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2), r.getLong(3)))
        .toSeq
    // Exactly three clicks (each gap <= 1000) then a qualifying
    // purchase (gap <= 2000) — one match carrying all four ids.
    assert(run((1, 0, 7, "click", 0), (2, 900, 7, "click", 0),
      (3, 1800, 7, "click", 0), (4, 3500, 7, "purchase", 30))
      == Seq((7L, 1L, Seq(1L, 2L, 3L, 4L), 3500L)))
    // TWO clicks then a purchase: the count is exact, no match.
    assert(run((1, 0, 7, "click", 0), (2, 900, 7, "click", 0),
      (3, 1500, 7, "purchase", 99)).isEmpty)
    // A gap violation INSIDE the repetitions resets — and the late
    // click re-anchors (timeout-then-reprocess), so a fresh burst
    // after it still matches.
    assert(run((1, 0, 7, "click", 0), (2, 1001, 7, "click", 0),
      (3, 1900, 7, "click", 0), (4, 2100, 7, "click", 0),
      (5, 2500, 7, "purchase", 50))
      == Seq((7L, 1L, Seq(2L, 3L, 4L, 5L), 1499L)))
    // Greedy strictness: a FOURTH click while seeking the purchase is
    // ignored, not re-anchored — the burst's first three keep credit.
    assert(run((1, 0, 7, "click", 0), (2, 100, 7, "click", 0),
      (3, 200, 7, "click", 0), (4, 300, 7, "click", 0),
      (5, 400, 7, "purchase", 50))
      == Seq((7L, 1L, Seq(1L, 2L, 3L, 5L), 400L)))
    // Non-overlap: seven clicks + purchase yields ONE match (the
    // first three clicks), not C(7,3).
    assert(run((1, 0, 7, "click", 0), (2, 100, 7, "click", 0),
      (3, 200, 7, "click", 0), (4, 300, 7, "click", 0),
      (5, 400, 7, "click", 0), (6, 500, 7, "click", 0),
      (7, 600, 7, "click", 0), (8, 700, 7, "purchase", 50)).size == 1)
  }

  test("Q139c: alternation — either type fills a repetition, non-listed types don't, value predicate still binds") {
    import spark.implicits._
    def mk(rows: Seq[(Long, Long, Long, String, Double)]) =
      rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
    val pat = Seq(
      CepStep("signup"),
      CepStep("view", altTypes = Seq("click"), timeoutUs = 1000L, times = 2),
      CepStep("purchase", timeoutUs = 1000L))
    def run(evs: (Long, Long, Long, String, Double)*) =
      Cep.matchesGeneric(mk(evs), pat)
        .select("user_id", "match_no", "step_event_ids")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSeq
    // view+click mix fills the two repetitions.
    assert(run((1, 0, 7, "signup", 0), (2, 100, 7, "view", 0),
      (3, 200, 7, "click", 0), (4, 300, 7, "purchase", 0))
      == Seq((7L, 1L, Seq(1L, 2L, 3L, 4L))))
    // click+click also fills them (pure alternate type).
    assert(run((1, 0, 7, "signup", 0), (2, 100, 7, "click", 0),
      (3, 200, 7, "click", 0), (4, 300, 7, "purchase", 0))
      == Seq((7L, 1L, Seq(1L, 2L, 3L, 4L))))
    // An unlisted type ('error') neither fills nor resets.
    assert(run((1, 0, 7, "signup", 0), (2, 100, 7, "view", 0),
      (3, 150, 7, "error", 0), (4, 200, 7, "click", 0),
      (5, 300, 7, "purchase", 0))
      == Seq((7L, 1L, Seq(1L, 2L, 4L, 5L))))
    // One engagement is not two.
    assert(run((1, 0, 7, "signup", 0), (2, 100, 7, "view", 0),
      (3, 200, 7, "purchase", 0)).isEmpty)
    // A value floor binds across BOTH alternation types.
    val patV = Seq(
      CepStep("view", altTypes = Seq("click"), minValue = Some(10.0)),
      CepStep("purchase", timeoutUs = 1000L))
    val gotV = Cep.matchesGeneric(mk(Seq(
        (1L, 0L, 7L, "click", 5.0), (2L, 100L, 7L, "view", 5.0),
        (3L, 200L, 7L, "click", 15.0), (4L, 300L, 7L, "purchase", 0.0))), patV)
      .select("step_event_ids").collect().map(_.getSeq[Long](0)).toSeq
    assert(gotV == Seq(Seq(3L, 4L)))
  }

  test("no-timeout steps (Long.MaxValue sentinel) match across arbitrary gaps — overflow regression") {
    import spark.implicits._
    def mk(rows: Seq[(Long, Long, Long, String, Double)]) =
      rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
    def run(pat: Seq[CepStep], evs: (Long, Long, Long, String, Double)*) =
      Cep.matchesGeneric(mk(evs), pat)
        .select("user_id", "match_no", "step_event_ids")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSeq
    // Two steps, both default (no) timeouts: a year-scale gap between
    // view and purchase must still match — `anchor + Long.MaxValue`
    // would wrap negative and reset the cursor on every event.
    val noTmo = Seq(CepStep("view"), CepStep("purchase"))
    assert(run(noTmo,
      (1, 1000000L, 7, "view", 0), (2, 31557600000000L, 7, "purchase", 0))
      == Seq((7L, 1L, Seq(1L, 2L))))
    // A quantified anchor with no timeout completes across gaps too.
    val quant = Seq(CepStep("click", times = 2), CepStep("purchase"))
    assert(run(quant,
      (1, 1000L, 7, "click", 0), (2, 99999999999999L, 7, "click", 0),
      (3, 100000000000007L, 7, "purchase", 0))
      == Seq((7L, 1L, Seq(1L, 2L, 3L))))
    // Mixed: a finite-timeout middle step still times out while the
    // no-timeout terminal step doesn't.
    val mixed = Seq(CepStep("view"), CepStep("click", timeoutUs = 100L),
      CepStep("purchase"))
    assert(run(mixed,
      (1, 0L, 7, "view", 0), (2, 50L, 7, "click", 0),
      (3, 88888888888888L, 7, "purchase", 0))
      == Seq((7L, 1L, Seq(1L, 2L, 3L))))
    assert(run(mixed,
      (1, 0L, 7, "view", 0), (2, 101L, 7, "click", 0),
      (3, 200L, 7, "purchase", 0)).isEmpty)
  }

  test("Q138/Q139 scale shape: one user shuffle + external sort + mapPartitions — no per-group materialization") {
    val plan = Behavior.cepMatches(events, WindowUs)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("FlatMapGroups"),
      "the CEP fold must not buffer per-user groups")
    assert(plan.contains("hashpartitioning(user_id"),
      "exactly the one user_id shuffle")
    assert(plan.contains("Sort ") && plan.contains("MapPartitions"),
      "external sortWithinPartitions feeding a streaming mapPartitions fold")
    val q20plan = graft.operators.SyncReplay.replay(events,
      graft.streaming.SyncConfig(50000L, 10000000L)).queryExecution.sparkPlan.toString
    assert(!q20plan.contains("FlatMapGroups"),
      "the sync replay fold must not buffer per-stream schedules")
  }

  test("Q138: the generic fold equals an independent per-user replay on the real corpus") {
    import spark.implicits._
    val W = 43200000000L // 12h — exercises both match and timeout paths
    val got = Behavior.cepMatches(events, W)
      .collect().map(_.toString).toSeq.sorted
    // Independent reference: collect, group, sort, replay in plain Scala.
    val byUser = events
      .where(col("event_type").isin("view", "click", "purchase"))
      .select("user_id", "event_id", "ts_us", "event_type")
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1)
    val want = byUser.toSeq.flatMap { case (u, evs) =>
      var state = 0; var vId = 0L; var vTs = 0L; var cId = 0L; var cTs = 0L
      var matchNo = 0L
      val out = Seq.newBuilder[String]
      evs.sortBy(e => (e._3, e._2)).foreach { case (_, id, ts, tpe) =>
        if (state == 1 && ts > vTs + W) state = 0
        else if (state == 2 && ts > cTs + W) state = 0
        state match {
          case 0 => if (tpe == "view") { vId = id; vTs = ts; state = 1 }
          case 1 => if (tpe == "click") { cId = id; cTs = ts; state = 2 }
          case 2 => if (tpe == "purchase") {
            matchNo += 1
            out += s"[$u,$matchNo,$vId,$cId,$id,${ts - vTs}]"
            state = 0
          }
        }
      }
      out.result()
    }.sorted
    assert(want.nonEmpty && got == want)
  }

  test("Q132: collapsed cohorts — when every vector is identical, every label's drift is exactly zero") {
    import spark.implicits._
    val vecs = (0L until 50L)
      .map(i => (i, Array.fill(8)(0.25f), (i % 5).toInt))
      .toDF("vec_id", "embedding", "label")
    val out = Profile.embeddingDrift(vecs).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getDouble(r.fieldIndex("cosine")) == 1.0)
      assert(r.getLong(r.fieldIndex("drift_ppm")) == 0L)
    }
  }

  test("Q133: the KM curve telescopes — risk sets account for every exit, survival is non-increasing, censoring never moves it") {
    import graft.operators.Temporal
    val gapUs = 21600000000L
    val rows = Temporal.sessionSurvival(events, gapUs)
      .orderBy("dur_hours").collect()
    assert(rows.length > 1)
    val nRisk = rows.map(r => r.getLong(r.fieldIndex("n_risk")))
    val nChurn = rows.map(r => r.getLong(r.fieldIndex("n_churn")))
    val nCens = rows.map(r => r.getLong(r.fieldIndex("n_censored")))
    val surv = rows.map(r => r.getLong(r.fieldIndex("survival_ppb")))
    // Risk telescoping: each duration's exits are exactly the next
    // risk-set drop (durations with no subject never emit a row).
    rows.indices.dropRight(1).foreach { i =>
      assert(nRisk(i + 1) == nRisk(i) - nChurn(i) - nCens(i))
    }
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a })
    assert(nChurn.sum > 0 && nCens.sum > 0,
      "fixture must exercise both churned and censored sessions")
    // Censored-only durations leave survival untouched; churn moves it.
    rows.indices.dropRight(1).foreach { i =>
      if (nChurn(i + 1) == 0L) assert(surv(i + 1) == surv(i))
    }
    // The driver fold replayed independently.
    var s = 1000000000L
    rows.indices.foreach { i =>
      s = s * (nRisk(i) - nChurn(i)) / nRisk(i)
      assert(surv(i) == s)
    }
  }

  test("Q135: the window closed form equals the textbook max(0, s + dev) recursion, and alarms fire on this corpus") {
    import graft.operators.Temporal
    val out = Temporal.cusumChangePoints(events, 10L, 4L)
      .orderBy("event_type", "hour").collect()
    val series = out.groupBy(_.getString(0))
    // Recompute each series with the literal recursion off the raw
    // hourly counts and the same integer μ/slack.
    series.foreach { case (_, rs) =>
      val xs = rs.sortBy(_.getLong(1)).map(r => r.getLong(2))
      val muC = 100L * xs.sum / xs.length
      val dev = xs.map(x => 100L * x - muC - muC / 10L)
      var s = 0L
      rs.sortBy(_.getLong(1)).zip(dev).foreach { case (r, d) =>
        s = math.max(0L, s + d)
        assert(r.getLong(r.fieldIndex("cusum_c")) == s,
          s"closed form diverged from the recursion at hour ${r.getLong(1)}")
        assert(r.getBoolean(r.fieldIndex("alarm")) == (s > muC * 4L))
      }
    }
    val alarms = out.count(_.getBoolean(4))
    assert(alarms > 0 && alarms < out.length,
      "tuning must yield a mixed alarm verdict on the corpus")
  }

  test("Q132: an opposed cohort reads cosine -1 against a corpus it dominates away from") {
    import spark.implicits._
    // label 0: 99 copies of +e0; label 1: one -e0 vector. Corpus sum
    // points at +e0, so label 1's cosine is exactly -1.
    val vecs = ((0L until 99L).map(i => (i, Array(1f, 0f), 0)) :+
      (99L, Array(-1f, 0f), 1)).toDF("vec_id", "embedding", "label")
    val out = Profile.embeddingDrift(vecs).orderBy("label").collect()
    assert(out(0).getDouble(out(0).fieldIndex("cosine")) == 1.0)
    assert(out(1).getDouble(out(1).fieldIndex("cosine")) == -1.0)
    assert(out(1).getLong(out(1).fieldIndex("drift_ppm")) == 2000000L)
  }
}
