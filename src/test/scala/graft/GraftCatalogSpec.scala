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

  private val warehouse = Files.createTempDirectory("graft_cat_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", warehouse)
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

  // ------------------------------------------------ the TableCatalog

  test("TableCatalog lifecycle: CREATE NAMESPACE / CREATE TABLE / INSERT / SHOW TABLES / DROP — creation IS a FactStore commit") {
    spark.sql("CREATE NAMESPACE graft.db")
    spark.sql(
      """CREATE TABLE graft.db.t
         (event_id BIGINT, user_id BIGINT, ts_us BIGINT, event_type STRING, value DOUBLE)
         TBLPROPERTIES ('key'='event_id', 'order'='user_id,ts_us',
                        'stats'='user_id,ts_us,event_id')""")
    val d = s"$warehouse/db/t"
    val snap = M.snapshot(spark, d)
    assert(snap.version == 1L && snap.op == "create")
    assert(snap.meta("keyCol") == "event_id" &&
      snap.meta("orderCols") == "user_id ts_us")
    // The empty table reads as an empty frame of the DECLARED shape.
    val empty = spark.table("graft.db.t")
    assert(empty.isEmpty && empty.columns.toSeq ==
      Seq("event_id", "user_id", "ts_us", "event_type", "value"))
    // First contact: CREATE then INSERT just works (an append commit).
    ev.limit(500).createOrReplaceTempView("cat_create_src")
    spark.sql("INSERT INTO graft.db.t SELECT * FROM cat_create_src")
    assert(M.snapshot(spark, d).op == "append")
    assert(rows(spark.table("graft.db.t")) == rows(ev.limit(500)))
    // The declared key drives the point tier (pruning live immediately).
    GraftTableProvider.lastPrune = None
    spark.sql("SELECT * FROM graft.db.t WHERE event_id = 7").collect()
    assert(GraftTableProvider.lastPrune.exists(_._1 == "point"))
    // Listing and drop.
    assert(spark.sql("SHOW TABLES IN graft.db").collect().map(_.getString(1)).contains("t"))
    spark.sql("DROP TABLE graft.db.t")
    assert(!spark.sql("SHOW TABLES IN graft.db").collect().map(_.getString(1)).contains("t"))
    assert(!new java.io.File(d).exists(), "a managed table's data is deleted with it")
  }

  test("CTAS: CREATE TABLE … AS SELECT creates the store from the query schema and lands the rows as one append") {
    ev.where(col("event_id") < 200).createOrReplaceTempView("cat_ctas_src")
    spark.sql(
      """CREATE TABLE graft.db.ctas
         TBLPROPERTIES ('key'='event_id', 'order'='user_id')
         AS SELECT event_id, user_id, value FROM cat_ctas_src""")
    val d = s"$warehouse/db/ctas"
    assert(M.snapshot(spark, d).version == 2L, "create + one append commit")
    assert(rows(spark.table("graft.db.ctas")) ==
      rows(ev.where(col("event_id") < 200).select("event_id", "user_id", "value")))
    // The created lake is a full citizen: DML, time travel, DESCRIBE.
    spark.sql("DELETE FROM graft.db.ctas WHERE user_id > 7")
    assert(rows(spark.table("graft.db.ctas")) ==
      rows(ev.where(col("event_id") < 200 && col("user_id") <= 7)
        .select("event_id", "user_id", "value")))
    assert(F.read(spark, d, 2L).count() == ev.where(col("event_id") < 200).count())
    spark.sql("DROP TABLE graft.db.ctas")
  }

  test("catalog guardrails: key property required, PARTITIONED BY rejected, unsupported ALTERs loud, rename works") {
    val e1 = intercept[Exception](spark.sql(
      "CREATE TABLE graft.db.nokey (a BIGINT, b DOUBLE)"))
    assert(e1.getMessage.contains("key"), s"got: ${e1.getMessage}")
    val e2 = intercept[Exception](spark.sql(
      """CREATE TABLE graft.db.part (a BIGINT, b DOUBLE)
         PARTITIONED BY (b) TBLPROPERTIES ('key'='a')"""))
    assert(e2.getMessage.contains("PARTITIONED BY") || e2.getMessage.contains("order"),
      s"got: ${e2.getMessage}")
    spark.sql("CREATE TABLE graft.db.ren (a BIGINT, b DOUBLE) TBLPROPERTIES ('key'='a')")
    // Shapes the versioned model cannot express stay loud rejections.
    val e3 = intercept[Exception](spark.sql(
      "ALTER TABLE graft.db.ren ALTER COLUMN b COMMENT 'nope'"))
    assert(e3.getMessage.contains("not supported"), s"got: ${e3.getMessage}")
    val e4 = intercept[Exception](spark.sql(
      "ALTER TABLE graft.db.ren SET TBLPROPERTIES ('x'='1')"))
    assert(e4.getMessage.contains("not supported"), s"got: ${e4.getMessage}")
    val e5 = intercept[Exception](spark.sql(
      "ALTER TABLE graft.db.ren ADD COLUMN c DOUBLE AFTER a"))
    assert(e5.getMessage.contains("FIRST/AFTER"), s"got: ${e5.getMessage}")
    // RENAME TO takes a catalog-relative identifier (V2 semantics).
    spark.sql("ALTER TABLE graft.db.ren RENAME TO db.ren2")
    assert(spark.sql("SHOW TABLES IN graft.db").collect().map(_.getString(1))
      .contains("ren2"))
    spark.sql("DROP TABLE graft.db.ren2")
  }

  test("standard ALTER TABLE lowers into versioned evolution commits: ADD/RENAME/DROP/widen with time travel through the DDL") {
    spark.sql(
      """CREATE TABLE graft.db.alt (id BIGINT, v INT, tag STRING)
         TBLPROPERTIES ('key'='id', 'order'='id')""")
    val d = s"$warehouse/db/alt"
    spark.sql("INSERT INTO graft.db.alt VALUES (1, 10, 'a'), (2, 20, 'b')")

    // ADD COLUMNS: one commit, existing rows read NULL, no file rewritten.
    spark.sql("ALTER TABLE graft.db.alt ADD COLUMNS (score DOUBLE, note STRING)")
    val snap = M.snapshot(spark, d)
    assert(snap.op == "addcol" && snap.version == 3L)
    assert(spark.table("graft.db.alt").columns.toSeq ==
      Seq("id", "v", "tag", "score", "note"))
    assert(spark.sql("SELECT score FROM graft.db.alt").collect()
      .forall(_.isNullAt(0)), "pre-evolution rows read the new column as NULL")
    spark.sql("INSERT INTO graft.db.alt VALUES (3, 30, 'c', 9.5, 'hi')")
    assert(spark.sql(
      "SELECT note FROM graft.db.alt WHERE id = 3").collect().head.getString(0) == "hi")

    // RENAME: logical only; time travel serves each version's names.
    spark.sql("ALTER TABLE graft.db.alt RENAME COLUMN tag TO label")
    assert(spark.table("graft.db.alt").columns.contains("label"))
    assert(spark.read.format("graft").option("versionAsOf", 4).load(d)
      .columns.contains("tag"), "pre-rename versions keep the old name")

    // Widen through standard DDL: int -> bigint, one metadata commit.
    spark.sql("ALTER TABLE graft.db.alt ALTER COLUMN v TYPE BIGINT")
    assert(spark.table("graft.db.alt").schema("v").dataType.catalogString == "bigint")
    // Narrowing is refused — by Spark's own analyzer (it checks
    // Cast.canUpCast before the catalog sees the change) or, for
    // shapes it lets through, by the commit layer's widen gate.
    val eN = intercept[Exception](spark.sql(
      "ALTER TABLE graft.db.alt ALTER COLUMN v TYPE INT"))
    assert(eN.getMessage.contains("widen") ||
      eN.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"), s"got: ${eN.getMessage}")

    // DROP COLUMN: logical drop; older versions still serve it.
    spark.sql("ALTER TABLE graft.db.alt DROP COLUMN note")
    assert(!spark.table("graft.db.alt").columns.contains("note"))
    assert(spark.read.format("graft").option("versionAsOf", 5).load(d)
      .columns.contains("note"))
    // The dropped physical name is retired: re-adding it is rejected.
    val eR = intercept[Exception](spark.sql(
      "ALTER TABLE graft.db.alt ADD COLUMNS (note STRING)"))
    assert(eR.getMessage.contains("retired"), s"got: ${eR.getMessage}")

    // The evolved table stays a full DML citizen.
    spark.sql("UPDATE graft.db.alt SET score = 1.0 WHERE id = 1")
    assert(spark.sql("SELECT score FROM graft.db.alt WHERE id = 1")
      .collect().head.getDouble(0) == 1.0)
    spark.sql("DROP TABLE graft.db.alt")
  }

  test("CREATE TABLE … LOCATION: the store lives at LOCATION; DROP removes only the catalog pointer") {
    val loc = Files.createTempDirectory("graft_cat_ext").toString + "/ext_store"
    spark.sql(
      s"""CREATE TABLE graft.db.ext (event_id BIGINT, v DOUBLE)
          TBLPROPERTIES ('key'='event_id') LOCATION '$loc'""")
    spark.sql("INSERT INTO graft.db.ext VALUES (1, 1.5), (2, 2.5)")
    assert(M.snapshot(spark, loc).op == "append")
    assert(spark.table("graft.db.ext").count() == 2)
    spark.sql("DROP TABLE graft.db.ext")
    assert(M.snapshot(spark, loc).op == "append",
      "dropping an external table must not delete its data")
  }

  test("GRAFT statements accept TableCatalog identifiers: DESCRIBE/HISTORY/VACUUM name graft.db.t") {
    spark.sql("CREATE TABLE graft.db.gstmt (a BIGINT, b DOUBLE) TBLPROPERTIES ('key'='a')")
    spark.sql("INSERT INTO graft.db.gstmt VALUES (1, 1.0), (2, 2.0)")
    val props = spark.sql("GRAFT DESCRIBE graft.db.gstmt").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("key_column") == "a" && props("version") == "2")
    assert(spark.sql("GRAFT HISTORY graft.db.gstmt").collect()
      .map(_.getString(1)).toSeq == Seq("create", "append"))
    spark.sql("GRAFT VACUUM graft.db.gstmt RETAIN 1")
    assert(spark.table("graft.db.gstmt").count() == 2)
    spark.sql("DROP TABLE graft.db.gstmt")
  }

  test("catalog INSERT file count follows the batch size: a tiny INSERT commits one file, not a fixed eight") {
    spark.sql("CREATE TABLE graft.db.sized (a BIGINT, b DOUBLE) TBLPROPERTIES ('key'='a')")
    spark.sql("INSERT INTO graft.db.sized VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    val snap = M.snapshot(spark, s"$warehouse/db/sized")
    val appended = snap.segments.filter(s => s.kind == "data" && s.dir.contains("append"))
    assert(appended.map(_.files.length).sum == 1,
      s"a 3-row INSERT should land as one file, got ${appended.map(_.files.length).sum}")
    spark.sql("DROP TABLE graft.db.sized")
  }

  test("a rebuilt store at the same path serves its NEW schema through the catalog (schema cache invalidates)") {
    val d7 = Files.createTempDirectory("graft_cat_rebuild").toString
    F.build(ev.limit(50).select("event_id", "user_id", "value"),
      d7, "event_id", Seq("user_id"), 2)
    spark.sql(s"CREATE TABLE graft_cat_rebuild USING graft LOCATION '$d7'")
    assert(spark.table("graft_cat_rebuild").columns.toSeq ==
      Seq("event_id", "user_id", "value"))
    // Rebuild IN PLACE with a different schema (build wipes the dir and
    // re-commits version 1): the catalog must not serve the stale shape.
    F.build(ev.limit(50).select("event_id", "ts_us", "event_type"),
      d7, "event_id", Seq("ts_us"), 2)
    val got = spark.table("graft_cat_rebuild")
    assert(got.columns.toSeq == Seq("event_id", "ts_us", "event_type"),
      s"stale schema served after rebuild: ${got.columns.toSeq}")
    assert(got.count() == 50)
  }

  test("INSERT OVERWRITE from an empty source empties the table; repeating it is a no-op that leaves no orphan segment") {
    val d8 = Files.createTempDirectory("graft_cat_empty").toString
    F.build(ev.limit(30), d8, "event_id", Seq("user_id"), 2)
    spark.sql(s"CREATE TABLE graft_cat_empty USING graft LOCATION '$d8'")
    spark.sql("INSERT OVERWRITE graft_cat_empty SELECT * FROM graft_cat_empty WHERE 1 = 0")
    assert(spark.table("graft_cat_empty").isEmpty)
    val v = M.currentVersion(spark, d8)
    def segDirs() = new java.io.File(d8).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("seg-")).map(_.getName).toSet
    val before = segDirs()
    spark.sql("INSERT OVERWRITE graft_cat_empty SELECT * FROM graft_cat_empty WHERE 1 = 0")
    assert(M.currentVersion(spark, d8) == v, "overwriting an already-empty table is a version no-op")
    assert(segDirs() == before, "the no-op path must not leave an unreferenced tombstone segment")
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
