package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{FactStore => F, GraftTableProvider, ManifestLog => M, Tables}

/** The fact lake as a CATALOG TABLE (GraftTableProvider): `CREATE
  * TABLE … USING graft LOCATION` + plain SELECT must serve exactly
  * what the Scala read surface serves, with pushed filters routed into
  * the metadata pruning tiers (Bloom/min-max point probes, z-order
  * box stats) — file pruning asserted, not assumed — and GRAFT DML
  * must accept the catalog identifier as the store name.
  */
class GraftCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private lazy val ev = Tables.events(spark, "/root/testdata/sf0.001")
    .select(col("event_id"), col("user_id"), col("ts_us"),
      col("event_type"), col("value"))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  /** One DML'd store (build + delete + upsert) registered as a table. */
  private lazy val (dir, tbl) = {
    val d = Files.createTempDirectory("graft_cat").toString
    F.build(ev, d, "event_id", Seq("user_id", "ts_us"), 8,
      Seq("user_id", "ts_us", "event_id"))
    F.deleteMatching(spark, d, col("user_id") % 5 === 1)
    F.upsert(spark, d,
      ev.where(col("event_id") % 3 === 0 && col("user_id") % 5 =!= 1)
        .withColumn("value", col("value") + 7.0), 8)
    spark.sql(s"CREATE TABLE graft_cat_events USING graft LOCATION '$d'")
    (d, "graft_cat_events")
  }

  test("CREATE TABLE USING graft + SELECT * serves exactly the live lake (tombstones applied, schema from the manifest)") {
    val got = spark.table(tbl)
    assert(got.columns.toSeq == Seq("event_id", "user_id", "ts_us", "event_type", "value"))
    assert(rows(got) == rows(F.read(spark, dir)))
    // Deleted users never resurface through the catalog path.
    assert(spark.sql(s"SELECT * FROM $tbl WHERE user_id % 5 = 1").isEmpty)
  }

  test("a point lookup pushes IN(key) into the Bloom/min-max tier: files pruned, plan shows the pushed filter") {
    GraftTableProvider.lastPrune = None
    val q = spark.sql(
      s"SELECT event_id, value FROM $tbl WHERE event_id IN (8, 24, 303) ORDER BY event_id")
    val got = q.collect()
    assert(got.map(_.getLong(0)).toSeq ==
      F.readPoint(spark, dir, Seq(8L, 24L, 303L))
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("event_id"),
      s"pushed filters must surface in the plan:\n$plan")
    val Some((mode, kept, total)) = GraftTableProvider.lastPrune
    assert(mode == "point", s"the key IN must route to the point tier (got $mode)")
    assert(kept < total && total > 0,
      s"the probe must prune files before I/O (kept=$kept total=$total)")
  }

  test("range conjuncts on stats columns push into z-order box pruning; residual filters still applied exactly") {
    GraftTableProvider.lastPrune = None
    val lo = 10L; val hi = 25L
    val q = spark.sql(
      s"""SELECT event_id, user_id FROM $tbl
          WHERE user_id BETWEEN $lo AND $hi AND event_type = 'click'""")
    val want = F.read(spark, dir)
      .where(col("user_id").between(lo, hi) && col("event_type") === "click")
      .select("event_id", "user_id")
    assert(rows(q) == rows(want))
    val Some((mode, kept, total)) = GraftTableProvider.lastPrune
    assert(mode == "box", s"stats-column ranges must route to the box tier (got $mode)")
    assert(kept <= total && total > 0)
  }

  test("column pruning reaches the scan: a two-column projection reads a two-column schema") {
    val q = spark.sql(s"SELECT event_id, value FROM $tbl")
    assert(q.queryExecution.executedPlan.toString.contains("ReadSchema"))
    assert(q.schema.fieldNames.toSeq == Seq("event_id", "value"))
    assert(q.count() == F.read(spark, dir).count())
  }

  test("path reads and time travel: format(\"graft\").load + versionAsOf serve each version's own rows") {
    val latest = spark.read.format("graft").load(dir)
    assert(rows(latest) == rows(F.read(spark, dir)))
    val v1 = spark.read.format("graft").option("versionAsOf", 1).load(dir)
    assert(rows(v1) == rows(ev), "versionAsOf 1 must serve the pre-DML lake")
    val v2 = spark.read.format("graft").option("versionAsOf", 2).load(dir)
    assert(rows(v2) == rows(ev.where(col("user_id") % 5 =!= 1)))
    // timestampAsOf resolves through the in-commit timestamps.
    val t2 = M.commitTimeMs(spark, dir, 2L)
    val asOf = spark.read.format("graft").option("timestampAsOf", t2).load(dir)
    assert(rows(asOf) == rows(v2))
  }

  test("GRAFT DML accepts the catalog identifier: DESCRIBE/HISTORY/DELETE/APPEND name the same store as SELECT") {
    val d2 = Files.createTempDirectory("graft_cat_dml").toString
    F.build(ev.where(col("event_id") < 400), d2, "event_id", Seq("user_id"), 4)
    spark.sql(s"CREATE TABLE graft_cat_dml USING graft LOCATION '$d2'")
    val props = spark.sql("GRAFT DESCRIBE graft_cat_dml").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("version") == "1" && props("key_column") == "event_id")
    val v2 = spark.sql(
      "GRAFT DELETE FROM graft_cat_dml WHERE user_id % 7 = 2").head().getLong(0)
    assert(v2 == 2L)
    ev.where(col("event_id").between(400, 449))
      .createOrReplaceTempView("graft_cat_dml_batch")
    val v3 = spark.sql(
      "GRAFT APPEND INTO graft_cat_dml FILES 2 USING graft_cat_dml_batch")
      .head().getLong(0)
    assert(v3 == 3L)
    assert(spark.sql("GRAFT HISTORY graft_cat_dml").collect().map(_.getString(1)).toSeq
      == Seq("build", "delete", "append"))
    // The catalog SELECT sees the DML immediately (no caching staleness).
    assert(rows(spark.table("graft_cat_dml")) == rows(
      ev.where((col("event_id") < 400 && col("user_id") % 7 =!= 2) ||
        col("event_id").between(400, 449))))
    // A non-graft identifier is rejected loudly, not treated as a path.
    spark.sql("CREATE TABLE graft_cat_parq (a INT) USING parquet " +
      s"LOCATION '${Files.createTempDirectory("graft_cat_pq")}'")
    val e = intercept[Exception](spark.sql("GRAFT HISTORY graft_cat_parq").collect())
    assert(e.getMessage.contains("not a graft table"))
  }

  test("INSERT INTO appends a commit; INSERT OVERWRITE replaces live rows with history preserved") {
    val d4 = Files.createTempDirectory("graft_cat_ins").toString
    F.build(ev.where(col("event_id") < 300), d4, "event_id", Seq("user_id"), 4)
    spark.sql(s"CREATE TABLE graft_cat_ins USING graft LOCATION '$d4'")
    // INSERT INTO = one append commit, visible immediately.
    spark.sql(
      """INSERT INTO graft_cat_ins
         SELECT event_id + 5000000, user_id, ts_us, event_type, value
         FROM graft_cat_ins WHERE event_id < 50""")
    assert(M.snapshot(spark, d4).op == "append")
    assert(spark.table("graft_cat_ins").count() ==
      ev.where(col("event_id") < 300).count() + ev.where(col("event_id") < 50).count())
    // Constraints gate the catalog write path too.
    F.addConstraint(spark, d4, "chk_pos", "event_id >= 0")
    val e = intercept[Exception](spark.sql(
      "INSERT INTO graft_cat_ins VALUES (-1, 1, 1, 'x', 0.0)"))
    assert(e.getMessage.contains("chk_pos"))
    // INSERT OVERWRITE = ONE history-preserving replace commit.
    spark.sql(
      """INSERT OVERWRITE graft_cat_ins
         SELECT event_id, user_id, ts_us, event_type, value * 2
         FROM graft_cat_ins WHERE event_id < 100""")
    assert(M.snapshot(spark, d4).op == "overwrite")
    assert(spark.table("graft_cat_ins").count() == ev.where(col("event_id") < 100).count())
    // Every earlier version still time-travels (overwrite ≠ build).
    assert(rows(F.read(spark, d4, 1L)) == rows(ev.where(col("event_id") < 300)))
    assert(F.read(spark, d4, 2L).count() ==
      ev.where(col("event_id") < 300).count() + ev.where(col("event_id") < 50).count())
  }

  test("standard SQL DELETE FROM lands as one tombstone commit — no file rewritten, history intact") {
    val d5 = Files.createTempDirectory("graft_cat_del").toString
    F.build(ev.where(col("event_id") < 300), d5, "event_id", Seq("user_id"), 4)
    spark.sql(s"CREATE TABLE graft_cat_del USING graft LOCATION '$d5'")
    // A DELETE matching nothing is a version no-op, not an empty commit.
    spark.sql("DELETE FROM graft_cat_del WHERE user_id > 9999")
    assert(M.snapshot(spark, d5).op == "build")
    spark.sql("DELETE FROM graft_cat_del WHERE user_id > 7")
    val snap = M.snapshot(spark, d5)
    assert(snap.op == "delete")
    assert(rows(spark.table("graft_cat_del")) ==
      rows(ev.where(col("event_id") < 300 && col("user_id") <= 7)))
    // Zero data files rewritten: v1's data segment is carried verbatim.
    assert(snap.segments.filter(_.kind == "data") ==
      M.snapshot(spark, d5, 1L).segments)
    assert(rows(F.read(spark, d5, 1L)) == rows(ev.where(col("event_id") < 300)),
      "the pre-delete version still time-travels")
    // TRUNCATE TABLE rides SupportsDelete's AlwaysTrue path: one
    // tombstone commit over every live key, history intact.
    spark.sql("TRUNCATE TABLE graft_cat_del")
    assert(spark.table("graft_cat_del").isEmpty)
    assert(M.snapshot(spark, d5).op == "delete")
    assert(rows(F.read(spark, d5, 1L)) == rows(ev.where(col("event_id") < 300)),
      "truncate is a commit, not history rewriting")
  }

  test("manifest statistics reach join planning: a small catalog table broadcasts instead of shuffling both sides") {
    // Scan-level stats (the DSv2 contract): real numbers, no data I/O.
    val scanStats = new graft.sources.GraftScanBuilder(dir, M.Latest,
        spark.table(tbl).schema).build()
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(scanStats.numRows.getAsLong >= ev.count(),
      "numRows must come from the manifest (data-segment row sum, upper bound)")
    assert(scanStats.sizeInBytes.getAsLong > 0 &&
      scanStats.sizeInBytes.getAsLong < 64L * 1024 * 1024,
      "sizeInBytes must be the real file-length sum")
    // The planner consequence that matters at scale: the V1Scan
    // wrapper hides scan stats from join selection, so GraftJoinSizing
    // feeds the manifest size into the Join hint — joining a big frame
    // against the small fact table broadcasts the fact side upfront
    // instead of shuffling both (AQE would only recover it after the
    // wasted map stage).
    val big = spark.range(200000).select(col("id").as("event_id"))
    val plan = big.join(spark.table(tbl), "event_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the small graft side must broadcast:\n$plan")
  }

  test("fractional thresholds on a non-integral stats column never mis-prune: metadata tier skipped, residual exact") {
    val d6 = Files.createTempDirectory("graft_cat_frac").toString
    // `value` is DOUBLE and DECLARED a stats column — its sidecar
    // stats are truncated longs, so a pushed `value > 10.5` translated
    // into long bounds would silently drop rows in (10.5, 11).
    F.build(ev.where(col("event_id") < 400), d6, "event_id",
      Seq("user_id"), 4, Seq("user_id", "value", "event_id"))
    spark.sql(s"CREATE TABLE graft_cat_frac USING graft LOCATION '$d6'")
    val base = F.read(spark, d6)
    for (cond <- Seq("value > 10.5", "value < 80.7", "value >= 10.5 AND value < 80.7")) {
      val got = spark.sql(s"SELECT event_id FROM graft_cat_frac WHERE $cond")
      val want = base.where(expr(cond)).select("event_id")
      assert(rows(got) == rows(want), s"catalog filter '$cond' must be exact")
      assert(got.count() > 0, s"'$cond' should match rows at this SF (degenerate test otherwise)")
    }
    // Integral bounds on the same column still prune soundly.
    assert(rows(spark.sql("SELECT event_id FROM graft_cat_frac WHERE value >= 11 AND value <= 80"))
      == rows(base.where(col("value") >= 11 && col("value") <= 80).select("event_id")))
  }

  test("the widened store serves its declared types through the catalog (schema follows the manifest)") {
    val d3 = Files.createTempDirectory("graft_cat_widen").toString
    F.build(ev.limit(100).withColumn("clicks", (col("event_id") % 100).cast("int")),
      d3, "event_id", Seq("user_id"), 2)
    F.widenColumn(spark, d3, "clicks", "bigint")
    spark.sql(s"CREATE TABLE graft_cat_wide USING graft LOCATION '$d3'")
    assert(spark.table("graft_cat_wide").schema("clicks").dataType.catalogString
      == "bigint")
  }
}
