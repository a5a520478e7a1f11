package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{FactStore => F, Tables}

/** Key-grouped distribution through the catalog read path
  * (GraftStorageJoin): a fact⋈fact equi-join on the two stores' keys
  * must plan with ZERO Exchange while both bucketed mirrors are fresh,
  * stand down (correct, shuffled) the moment either store sees DML,
  * and return to zero-Exchange after a mirror refresh — results
  * identical on every path.
  */
class GraftStorageJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse =
    Files.createTempDirectory("graft_sj_warehouse").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", warehouse)
      // Force the sort-merge path: the audit checks the storage layout,
      // not a small-data broadcast (which GraftJoinSizing would pick
      // here and which correctly takes precedence in production).
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(warehouse))
  }

  private lazy val ev = Tables.events(spark, "/root/testdata/sf0.001")
    .select(col("event_id"), col("user_id"), col("ts_us"),
      col("event_type"), col("value"))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  private lazy val (dA, dB) = {
    val a = Files.createTempDirectory("graft_sj_a").toString
    val b = Files.createTempDirectory("graft_sj_b").toString
    F.build(ev.limit(400), a, "event_id", Seq("user_id", "ts_us"), 4)
    F.build(ev.limit(300).select(col("event_id"), (col("value") * 2).as("score")),
      b, "event_id", Seq("event_id"), 4)
    spark.sql(s"CREATE TABLE sj_a USING graft LOCATION '$a'")
    spark.sql(s"CREATE TABLE sj_b USING graft LOCATION '$b'")
    (a, b)
  }

  test("two co-keyed graft tables joined on the key: ZERO Exchange through fresh mirrors; DML stands the rule down; refresh restores it") {
    F.writeBucketedMirror(spark, dA, "sj_a_mirror", 8)
    F.writeBucketedMirror(spark, dB, "sj_b_mirror", 8)

    def joined = spark.sql(
      """SELECT a.event_id, a.user_id, a.value, b.score
         FROM sj_a a JOIN sj_b b ON a.event_id = b.event_id
         WHERE a.user_id >= 0""")
    val want = rows(F.read(spark, dA).as("a")
      .join(F.read(spark, dB).as("b"), "event_id")
      .select(col("event_id"), col("user_id"), col("value"), col("score")))

    val q1 = joined
    val plan1 = q1.queryExecution.executedPlan.toString
    assert(plan1.contains("SortMergeJoin"), s"expected sort-merge:\n$plan1")
    assert(!plan1.contains("Exchange"),
      s"fresh mirrors must plan with zero Exchange on BOTH sides:\n$plan1")
    assert(rows(q1.select(col("event_id"), col("user_id"), col("value"), col("score"))) == want,
      "the mirror-routed join must serve exactly the live lake")

    // DML on one side: the rule must stand down (stale mirror is never
    // served) — the join shuffles but stays CORRECT on live data.
    F.deleteMatching(spark, dA, col("user_id") % 5 === 2)
    val q2 = joined
    assert(q2.queryExecution.executedPlan.toString.contains("Exchange"),
      "a stale mirror must never be routed through")
    val want2 = rows(F.read(spark, dA).as("a")
      .join(F.read(spark, dB).as("b"), "event_id")
      .select(col("event_id"), col("user_id"), col("value"), col("score")))
    assert(rows(q2.select(col("event_id"), col("user_id"), col("value"), col("score"))) == want2)
    assert(want2.size < want.size, "the delete must be visible immediately")

    // Refresh the mirror: zero-Exchange again, post-DML rows.
    F.writeBucketedMirror(spark, dA, "sj_a_mirror", 8)
    val q3 = joined
    val plan3 = q3.queryExecution.executedPlan.toString
    assert(!plan3.contains("Exchange"), s"refreshed mirror must restore the co-located plan:\n$plan3")
    assert(rows(q3.select(col("event_id"), col("user_id"), col("value"), col("score"))) == want2)
  }

  test("drop/recreate at the same path can NOT alias into freshness: version-number collision is caught by the commit timestamp") {
    val d = Files.createTempDirectory("graft_sj_stale").toString
    val d2 = Files.createTempDirectory("graft_sj_stale_other").toString
    F.build(ev.limit(100), d, "event_id", Seq("user_id"), 2)
    F.build(ev.limit(80).select(col("event_id"), col("value")), d2,
      "event_id", Seq("event_id"), 2)
    spark.sql(s"CREATE TABLE sj_stale USING graft LOCATION '$d'")
    spark.sql(s"CREATE TABLE sj_stale_o USING graft LOCATION '$d2'")
    F.writeBucketedMirror(spark, d, "sj_stale_mirror", 4)
    F.writeBucketedMirror(spark, d2, "sj_stale_o_mirror", 4)

    def joined = spark.sql(
      """SELECT a.event_id, a.user_id, b.value
         FROM sj_stale a JOIN sj_stale_o b ON a.event_id = b.event_id""")
    assert(!joined.queryExecution.executedPlan.toString.contains("Exchange"),
      "precondition: fresh mirrors route zero-Exchange")

    // Recreate a DIFFERENT table at the SAME path: version counter
    // resets to the registered version (1 == 1), but the commit
    // timestamp moved — the old mirror must NOT be served.
    F.build(ev.limit(40), d, "event_id", Seq("user_id"), 2)
    spark.sql("REFRESH TABLE sj_stale")
    assert(graft.sources.FactStore.currentVersion(spark, d) == 1L,
      "precondition: the recreated store is back at the registered version number")
    val q = joined
    assert(q.queryExecution.executedPlan.toString.contains("Exchange"),
      "a recreated store at the same path must never route through the old mirror")
    val want = rows(F.read(spark, d).as("a")
      .join(F.read(spark, d2).as("b"), "event_id")
      .select(col("event_id"), col("a.user_id"), col("b.value")))
    assert(rows(q) == want, "the join must serve the RECREATED table's rows")
  }

  test("catalog DROP evicts the mirror registration (invalidateDir)") {
    val d = Files.createTempDirectory("graft_sj_evict").toString
    F.build(ev.limit(60), d, "event_id", Seq("user_id"), 2)
    spark.sql(s"CREATE TABLE sj_evict USING graft LOCATION '$d'")
    F.writeBucketedMirror(spark, d, "sj_evict_mirror", 4)
    graft.sources.GraftTableProvider.invalidateDir(d)
    // Registry-level probe: after eviction the rule's cheap guard fails
    // before any manifest read.
    val m = classOf[graft.plans.GraftStorageJoin].getName
    assert(!graft.plans.GraftStorageJoin.registered(d),
      s"invalidateDir must evict the $m registration for the dropped path")
  }

  test("incremental mirror refresh: appends roll the mirror forward without rewriting untouched files; zero-Exchange serves the new rows") {
    val d = Files.createTempDirectory("graft_sj_incr").toString
    val all = ev.limit(500).cache()
    F.build(all.where(col("event_id") % 5 < 3), d, "event_id", Seq("user_id", "ts_us"), 4)
    spark.sql(s"CREATE TABLE sj_incr USING graft LOCATION '$d'")
    F.writeBucketedMirror(spark, d, "sj_incr_mirror", 8)
    val mirrorDir = new java.io.File(
      spark.sessionState.catalog.defaultTablePath(
        spark.sessionState.sqlParser.parseTableIdentifier("sj_incr_mirror")))
    def dataFiles() = mirrorDir.listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .map(f => (f.getName, f.length(), f.lastModified())).toSet
    val before = dataFiles()
    assert(before.nonEmpty)

    // Two pure appends, then ensure: the mirror must roll FORWARD —
    // every pre-existing file untouched (same name/length/mtime).
    F.append(spark, d, all.where(col("event_id") % 5 === 3), 2)
    F.append(spark, d, all.where(col("event_id") % 5 === 4), 2)
    F.ensureBucketedMirror(spark, d, "sj_incr_mirror", 8)
    val after = dataFiles()
    assert(before.subsetOf(after),
      s"incremental refresh must not rewrite untouched bucket files\nbefore=$before\nafter=$after")
    assert(after.size > before.size, "the appended rows must land as new bucket files")

    val q = spark.sql(
      """SELECT a.event_id, a.user_id, b.score
         FROM sj_incr a JOIN sj_b b ON a.event_id = b.event_id""")
    assert(!q.queryExecution.executedPlan.toString.contains("Exchange"),
      s"the rolled-forward mirror must keep the zero-Exchange plan:\n${q.queryExecution.executedPlan}")
    val want = rows(F.read(spark, d).as("a")
      .join(F.read(spark, dB).as("b"), "event_id")
      .select(col("event_id"), col("user_id"), col("score")))
    assert(rows(q) == want, "the incremental mirror must serve exactly the post-append lake")

    // A row-CHANGING commit breaks the pure-append lineage: ensure
    // falls back to the full rewrite (files replaced), still correct.
    F.deleteMatching(spark, d, col("user_id") % 7 === 3)
    F.ensureBucketedMirror(spark, d, "sj_incr_mirror", 8)
    val q2 = spark.sql(
      """SELECT a.event_id, a.user_id, b.score
         FROM sj_incr a JOIN sj_b b ON a.event_id = b.event_id""")
    assert(!q2.queryExecution.executedPlan.toString.contains("Exchange"))
    val want2 = rows(F.read(spark, d).as("a")
      .join(F.read(spark, dB).as("b"), "event_id")
      .select(col("event_id"), col("user_id"), col("score")))
    assert(rows(q2) == want2)
    all.unpersist()
  }

  test("substitution maps mirror columns BY NAME: a mirror laid out in a different column order still binds") {
    val d = Files.createTempDirectory("graft_sj_order").toString
    F.build(ev.limit(120).select(col("event_id"), col("user_id"), col("value")),
      d, "event_id", Seq("user_id"), 2)
    spark.sql(s"CREATE TABLE sj_ord USING graft LOCATION '$d'")
    // Hand-build the mirror with REORDERED columns, then register it
    // directly — the rule must alias by name, not position.
    graft.sources.Bucketed.writeBucketed(
      F.read(spark, d).select(col("value"), col("event_id"), col("user_id")),
      "sj_ord_mirror", "event_id", 8)
    graft.plans.GraftStorageJoin.register(d, "sj_ord_mirror",
      F.currentVersion(spark, d),
      graft.sources.ManifestLog.commitTimeMs(spark, d, F.currentVersion(spark, d)))
    val q = spark.sql(
      """SELECT a.event_id, a.user_id, a.value, b.score
         FROM sj_ord a JOIN sj_b b ON a.event_id = b.event_id""")
    assert(!q.queryExecution.executedPlan.toString.contains("Exchange"))
    val want = rows(F.read(spark, d).as("a")
      .join(F.read(spark, dB).as("b"), "event_id")
      .select(col("event_id"), col("user_id"), col("value"), col("score")))
    assert(rows(q) == want,
      "a column-order-drifted mirror must still serve name-correct rows")
  }

  test("the rule keeps out of the way: non-key joins and hinted joins plan unchanged") {
    val dC = Files.createTempDirectory("graft_sj_c").toString
    F.build(ev.limit(200), dC, "event_id", Seq("user_id"), 2)
    spark.sql(s"CREATE TABLE sj_c USING graft LOCATION '$dC'")
    F.writeBucketedMirror(spark, dC, "sj_c_mirror", 4)
    // Joining on a NON-key column: bucketing doesn't apply — ordinary
    // shuffle plan, exact results.
    val q = spark.sql(
      """SELECT a.event_id, b.event_id AS other
         FROM sj_c a JOIN sj_b b ON a.user_id = b.event_id""")
    assert(q.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(q.count() ==
      F.read(spark, dC).as("a")
        .join(F.read(spark, dB).as("b"),
          col("a.user_id") === col("b.event_id")).count())
  }
}
