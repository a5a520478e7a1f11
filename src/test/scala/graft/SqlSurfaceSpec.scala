package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Behavior, Pipeline, Temporal}
import graft.sources.Tables

/** The SQL entry points (registered TVFs) answer exactly like the
  * Scala API: same rows AND `sameResult` plans — there is one
  * implementation reachable two ways, not two implementations.
  */
class SqlSurfaceSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  override def afterAll(): Unit = spark.stop()

  private val W = 172800000000L

  private lazy val ev = {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    e.createOrReplaceTempView("ev")
    // The API twin reads through the SAME view, so the plan comparison
    // pins TVF-vs-API, not view-vs-raw-frame projection collapsing.
    spark.table("ev")
  }

  /** exprIds, closure object ids, and codegen hashes differ between
    * two constructions of the same plan; strip them so the comparison
    * pins the plan SHAPE (operators, ordering, expressions). Plans
    * with typed lambdas (mapPartitions) can never be `sameResult` —
    * the closure instance is part of the node — so the normalized
    * string is the honest strongest pin. */
  private def normalize(plan: org.apache.spark.sql.catalyst.plans.QueryPlan[_]): String =
    plan.toString
      .replaceAll("#\\d+", "#x")
      .replaceAll("\\$Lambda[^,\\s)]*", "<lambda>")
      .replaceAll("\\$\\$Lambda[^,\\s)]*", "<lambda>")
      .replaceAll("@[0-9a-f]+", "@x")
      .replaceAll("/0x[0-9a-f]+", "/0xX")

  private def pinned(sql: String, api: DataFrame): Unit = {
    ev // force the view registration
    val viaSql = spark.sql(sql)
    val p1 = viaSql.queryExecution.optimizedPlan
    val p2 = api.queryExecution.optimizedPlan
    assert(p1.sameResult(p2) || normalize(p1) == normalize(p2),
      s"TVF plan diverged from the Scala API plan for: $sql\n--- TVF:\n${normalize(p1)}\n--- API:\n${normalize(p2)}")
    val a = viaSql.collect().map(_.toString).toSeq.sorted
    val b = api.collect().map(_.toString).toSeq.sorted
    assert(a.nonEmpty && a == b, s"TVF rows diverged for: $sql")
  }

  test("graft_cep_matches ≡ Behavior.cepMatches") {
    pinned(s"SELECT * FROM graft_cep_matches('ev', $W)",
      Behavior.cepMatches(ev, W))
  }

  test("graft_cep_pattern ≡ Cep.matchesGeneric — bring-your-own-pattern from SQL") {
    import graft.operators.{Cep, CepStep}
    // The q138 funnel expressed as a pattern string.
    pinned(s"SELECT * FROM graft_cep_pattern('ev', 'view; click <= $W; purchase <= $W')",
      Cep.matchesGeneric(ev, Cep.funnel3(W)))
    // Quantifier (q139b shape).
    pinned(s"SELECT * FROM graft_cep_pattern('ev', 'click{2} <= $W; purchase <= $W')",
      Cep.matchesGeneric(ev, Seq(
        CepStep("click", timeoutUs = W, times = 2),
        CepStep("purchase", timeoutUs = W))))
    // Alternation + value floor (q139/q139c shape), predicates in
    // either order.
    pinned(s"SELECT * FROM graft_cep_pattern('ev', 'signup; view|click{2} <= $W; purchase >= 0 <= $W')",
      Cep.matchesGeneric(ev, Seq(
        CepStep("signup"),
        CepStep("view", altTypes = Seq("click"), timeoutUs = W, times = 2),
        CepStep("purchase", minValue = Some(0.0), timeoutUs = W))))
    pinned(s"SELECT * FROM graft_cep_pattern('ev', 'view; purchase >= 0.5 <= $W')",
      Cep.matchesGeneric(ev, Seq(
        CepStep("view"),
        CepStep("purchase", minValue = Some(0.5), timeoutUs = W))))
    // No-timeout steps (omitted '<=') are the Long.MaxValue sentinel.
    pinned("SELECT * FROM graft_cep_pattern('ev', 'view; purchase')",
      Cep.matchesGeneric(ev, Seq(CepStep("view"), CepStep("purchase"))))
  }

  test("graft_cep_pattern rejects malformed specs loudly") {
    ev
    for (bad <- Seq(
        "",                        // empty spec
        "view;; purchase",         // empty step
        "view; click <= 0",        // non-positive timeout
        "view; click <= 1.5",      // fractional timeout
        "view{0}; purchase",       // zero repetition
        "view|view; purchase",     // duplicate alternation type
        "view >= 1 >= 2",          // duplicate value floor
        "view <= 5 <= 6",          // duplicate timeout
        "view purchase",           // missing ';'
        "view; purchase ~ 3"))     // unknown operator
      assert(intercept[Exception](
        spark.sql(s"SELECT * FROM graft_cep_pattern('ev', '$bad')").collect()) != null,
        s"spec '$bad' should have been rejected")
  }

  test("graft_asof_join ≡ Temporal.asofLastView") {
    pinned("SELECT * FROM graft_asof_join('ev')",
      Temporal.asofLastView(ev))
  }

  test("graft_attribution ≡ Behavior.attributionReport") {
    pinned(s"SELECT * FROM graft_attribution('ev', $W)",
      Behavior.attributionReport(ev, W))
  }

  test("graft_winsorize ≡ Pipeline.winsorize") {
    pinned("SELECT * FROM graft_winsorize('ev', 0.05, 0.95)",
      Pipeline.winsorize(ev, 0.05, 0.95))
  }

  test("graft_resample_ffill ≡ Temporal.resampleDailyFfill") {
    pinned("SELECT * FROM graft_resample_ffill('ev')",
      Temporal.resampleDailyFfill(ev))
  }

  test("graft_cusum ≡ Temporal.cusumChangePoints") {
    pinned("SELECT * FROM graft_cusum('ev', 10, 4)",
      Temporal.cusumChangePoints(ev, 10L, 4L))
  }

  test("graft_trend_ols ≡ Temporal.trendOls") {
    pinned("SELECT * FROM graft_trend_ols('ev')",
      Temporal.trendOls(ev))
  }

  test("graft_fact_at / graft_fact_box ≡ FactStore reads — the lakehouse from SQL") {
    import graft.sources.{FactStore => F}
    import org.apache.spark.sql.functions.col
    val e = ev
    val dir = java.nio.file.Files.createTempDirectory("graft_sqlfact").toString
    F.build(e.select(col("event_id"), col("user_id"), col("ts_us"),
      col("event_type"), col("value")), dir, "event_id", Seq("user_id", "ts_us"), 4)
    F.deleteMatching(spark, dir, col("user_id") % 5 === 1)
    pinned(s"SELECT * FROM graft_fact_at('$dir', 1)", F.read(spark, dir, 1L))
    pinned(s"SELECT * FROM graft_fact_at('$dir', -1)", F.read(spark, dir))
    pinned(s"SELECT * FROM graft_fact_box('$dir', 'user_id', 3, 5)",
      F.readBox(spark, dir, Map("user_id" -> (3L, 5L))))
    val someIds = F.read(spark, dir).select("event_id")
      .limit(3).collect().map(_.getLong(0)).toSeq
    pinned(s"SELECT * FROM graft_fact_point('$dir', ${someIds.mkString(", ")})",
      F.readPoint(spark, dir, someIds))
    pinned(s"SELECT * FROM graft_fact_changes('$dir', 1, 2)",
      F.changes(spark, dir, 1L, 2L))
    val t2 = graft.sources.ManifestLog.commitTimeMs(spark, dir, 2L)
    pinned(s"SELECT * FROM graft_fact_at_time('$dir', $t2)",
      F.readAsOf(spark, dir, t2))
    val e1 = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_fact_box('$dir', 'user_id', 3)").collect())
    assert(e1 != null)
  }

  test("the TVF composes with outer SQL — filters and projections apply on top") {
    ev
    val n = spark.sql(
      s"""SELECT user_id, count(*) AS n
          FROM graft_cep_matches('ev', $W)
          WHERE match_no = 1 GROUP BY user_id""").count()
    assert(n > 0)
  }

  test("bad arguments fail loudly, not silently") {
    ev
    val e1 = intercept[Exception](
      spark.sql("SELECT * FROM graft_cep_matches('ev')").collect())
    assert(e1.getMessage.contains("graft_cep_matches") ||
      Option(e1.getCause).exists(_.getMessage.contains("graft_cep_matches")))
    val e2 = intercept[Exception](
      spark.sql("SELECT * FROM graft_winsorize('ev', user_id, 0.95)").collect())
    assert(e2 != null)
  }
}
