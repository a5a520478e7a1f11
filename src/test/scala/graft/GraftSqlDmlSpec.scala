package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{FactStore => F, ManifestLog => M, Tables}

/** The GRAFT SQL DML surface (GraftSqlParser): every statement is a
  * thin command over the FactStore API — so the pinned contract is
  * LINEAGE EQUIVALENCE: a lifecycle driven entirely from `spark.sql`
  * produces a store byte-equal (rows, history ops, schema) to the same
  * lifecycle driven through the Scala API. Plus: parse failures are
  * loud and GRAFT-specific, and the delegating parser leaves ordinary
  * SQL untouched.
  */
class GraftSqlDmlSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private val nFiles = 4
  private lazy val ev = Tables.events(spark, "/root/testdata/sf0.001")
    .select(col("event_id"), col("user_id"), col("ts_us"),
      col("event_type"), col("value"))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  private def version(df: DataFrame): Long = df.head().getLong(0)

  test("a full SQL-driven lifecycle ≡ the Scala-API lifecycle (rows, ops, schema)") {
    ev.createOrReplaceTempView("graft_sql_ev")
    ev.where(col("event_id") % 3 === 0)
      .withColumn("value", col("value") + 7.0)
      .createOrReplaceTempView("graft_sql_patch")

    // SQL-driven store.
    val dS = Files.createTempDirectory("graft_sqldml_s").toString
    assert(version(spark.sql(
      s"GRAFT BUILD '$dS' KEY event_id ORDER BY (user_id, ts_us) " +
        s"STATS (user_id, ts_us, event_id) FILES $nFiles USING graft_sql_ev")) == 1L)
    assert(version(spark.sql(
      s"GRAFT DELETE FROM '$dS' WHERE user_id % 5 = 1")) == 2L)
    assert(version(spark.sql(
      s"GRAFT UPSERT INTO '$dS' FILES $nFiles USING " +
        "(SELECT * FROM graft_sql_patch WHERE user_id % 5 <> 1)")) == 3L)
    assert(version(spark.sql(s"GRAFT COMPACT '$dS' FILES $nFiles")) == 4L)

    // The same lifecycle through the Scala API.
    val dA = Files.createTempDirectory("graft_sqldml_a").toString
    F.build(ev, dA, "event_id", Seq("user_id", "ts_us"), nFiles,
      Seq("user_id", "ts_us", "event_id"))
    F.deleteMatching(spark, dA, col("user_id") % 5 === 1)
    F.upsert(spark, dA,
      ev.where(col("event_id") % 3 === 0 && col("user_id") % 5 =!= 1)
        .withColumn("value", col("value") + 7.0), nFiles)
    F.compact(spark, dA, nFiles)

    val s = F.read(spark, dS); val a = F.read(spark, dA)
    assert(s.columns.toSeq == a.columns.toSeq)
    assert(rows(s) == rows(a))
    assert(M.snapshots(spark, dS).map(_.op) == M.snapshots(spark, dA).map(_.op))
    // And the versioned reads agree at every pin.
    (1L to 4L).foreach(v =>
      assert(rows(F.read(spark, dS, v)) == rows(F.read(spark, dA, v)), s"version $v"))
  }

  test("GRAFT MERGE: conditional clauses from SQL ≡ FactStore.merge") {
    import F.MergeClause._
    ev.createOrReplaceTempView("graft_sql_ev2")
    val src = ev.where(col("event_id") % 9 === 4)
      .withColumn("value", col("value") +
        when(col("event_id") % 2 === 0, lit(100.0)).otherwise(lit(-100.0)))
      .unionByName(ev.where(col("event_id") % 9 === 5)
        .withColumn("event_id", col("event_id") + 1000000000000L)
        .withColumn("event_type", lit("inserted")))
    src.createOrReplaceTempView("graft_sql_msrc")

    val dS = Files.createTempDirectory("graft_sqlmerge_s").toString
    spark.sql(s"GRAFT BUILD '$dS' KEY event_id ORDER BY (user_id, ts_us) " +
      s"FILES $nFiles USING graft_sql_ev2")
    assert(version(spark.sql(
      s"""GRAFT MERGE INTO '$dS' FILES $nFiles USING graft_sql_msrc
          WHEN MATCHED AND s.value >= t.value THEN UPDATE SET value = s.value + t.value, event_type = 'merged'
          WHEN MATCHED THEN DELETE
          WHEN NOT MATCHED AND s.value >= 100.0 THEN INSERT""")) == 2L)

    val dA = Files.createTempDirectory("graft_sqlmerge_a").toString
    F.build(ev, dA, "event_id", Seq("user_id", "ts_us"), nFiles)
    F.merge(spark, dA, src, nFiles, Seq(
      Update(Some("s.value >= t.value"),
        Map("value" -> "s.value + t.value", "event_type" -> "'merged'")),
      Delete(None),
      Insert(Some("s.value >= 100.0"))))
    assert(rows(F.read(spark, dS)) == rows(F.read(spark, dA)))
    assert(M.snapshot(spark, dS, 2L).op == "merge")
  }

  test("GRAFT RESTORE / VACUUM / RECLUSTER / RENAME / DROP / HISTORY round-trip") {
    ev.createOrReplaceTempView("graft_sql_ev3")
    val d = Files.createTempDirectory("graft_sqlmisc").toString
    spark.sql(s"GRAFT BUILD '$d' KEY event_id ORDER BY (user_id) FILES 2 USING graft_sql_ev3")
    spark.sql(s"GRAFT DELETE FROM '$d' WHERE user_id % 7 = 2")
    assert(version(spark.sql(s"GRAFT RESTORE '$d' TO VERSION 1")) == 3L)
    assert(rows(F.read(spark, d)) == rows(ev), "restore republished v1")
    assert(version(spark.sql(s"GRAFT RENAME COLUMN value TO amount IN '$d'")) == 4L)
    assert(version(spark.sql(s"GRAFT DROP COLUMN event_type IN '$d'")) == 5L)
    assert(F.read(spark, d).columns.toSeq ==
      Seq("event_id", "user_id", "ts_us", "amount"))
    assert(version(spark.sql(s"GRAFT RECLUSTER '$d' BY (ts_us)")) == 6L)
    assert(M.snapshot(spark, d).meta("orderCols") == "ts_us")
    val hist = spark.sql(s"GRAFT HISTORY '$d'").collect()
    assert(hist.map(_.getString(1)).toSeq ==
      Seq("build", "delete", "restore", "rename", "drop", "recluster"))
    assert(hist.map(_.getLong(2)).forall(_ > 0L), "in-commit timestamps present")
    spark.sql(s"GRAFT VACUUM '$d' RETAIN 1")
    assert(M.committedVersions(M.fs(spark, d), d) == Seq(6L))
    assert(F.read(spark, d).columns.toSeq ==
      Seq("event_id", "user_id", "ts_us", "amount"))
  }

  test("GRAFT APPEND and incremental COMPACT from SQL") {
    ev.createOrReplaceTempView("graft_sql_ev4")
    val d = Files.createTempDirectory("graft_sqlappend").toString
    spark.sql(s"GRAFT BUILD '$d' KEY event_id ORDER BY (user_id) FILES 2 " +
      "USING (SELECT * FROM graft_sql_ev4 WHERE event_id % 2 = 0)")
    spark.sql(s"GRAFT APPEND INTO '$d' FILES 2 " +
      "USING (SELECT * FROM graft_sql_ev4 WHERE event_id % 2 <> 0)")
    assert(rows(F.read(spark, d)) == rows(ev))
    spark.sql(s"GRAFT DELETE FROM '$d' WHERE event_id % 2 = 0")
    // Tombstones kill the whole even segment → it crosses the default
    // TOMBFRAC and is folded; the odd segment is carried by reference.
    val v = version(spark.sql(s"GRAFT COMPACT '$d' FILES 2 INCREMENTAL"))
    assert(v == 4L)
    assert(rows(F.read(spark, d)) == rows(ev.where(col("event_id") % 2 =!= 0)))
    val segs = M.snapshot(spark, d).segments
    // The fully-dead segment folds to NOTHING (no zero-row segment is
    // committed); the healthy segment is carried by reference.
    assert(!segs.exists(_.dir.contains("base")), "the dead segment is gone")
    assert(segs.filter(_.kind == "data").forall(_.dir.contains("append")),
      "the healthy segment is carried by reference")
  }

  test("GRAFT ADD/DROP CONSTRAINT from SQL: recorded, enforced, lifted") {
    ev.createOrReplaceTempView("graft_sql_ev5")
    val d = Files.createTempDirectory("graft_sqlcheck").toString
    spark.sql(s"GRAFT BUILD '$d' KEY event_id ORDER BY (user_id) FILES 2 USING graft_sql_ev5")
    assert(version(spark.sql(
      s"GRAFT ADD CONSTRAINT chk_value CHECK (value >= 0 AND user_id >= 0) IN '$d'")) == 2L)
    assert(F.constraints(spark, d) ==
      Map("chk_value" -> "value >= 0 AND user_id >= 0"))
    val e = intercept[Exception](spark.sql(s"GRAFT APPEND INTO '$d' FILES 2 USING " +
      "(SELECT event_id + 9000000 AS event_id, user_id, ts_us, event_type, " +
      "-value - 1 AS value FROM graft_sql_ev5 LIMIT 20)"))
    assert(e.getMessage.contains("chk_value"))
    assert(version(spark.sql(s"GRAFT DROP CONSTRAINT chk_value IN '$d'")) == 3L)
    assert(F.constraints(spark, d).isEmpty)
  }

  test("GRAFT MERGE accepts parenthesized CASE expressions in conditions and SET") {
    import F.MergeClause._
    ev.limit(300).createOrReplaceTempView("graft_sql_ev7")
    val src = ev.limit(150).withColumn("value", col("value") + 3.0)
    src.createOrReplaceTempView("graft_sql_msrc7")
    val cond = "(CASE WHEN s.value >= t.value THEN 1 ELSE 0 END) = 1"
    val setV = "(CASE WHEN s.value > 100.0 THEN s.value ELSE t.value END)"
    val dS = Files.createTempDirectory("graft_sqlcase_s").toString
    spark.sql(s"GRAFT BUILD '$dS' KEY event_id ORDER BY (user_id) FILES 2 USING graft_sql_ev7")
    spark.sql(
      s"""GRAFT MERGE INTO '$dS' FILES 2 USING graft_sql_msrc7
          WHEN MATCHED AND $cond THEN UPDATE SET value = $setV, event_type = 'cased'
          WHEN NOT MATCHED THEN INSERT""")
    val dA = Files.createTempDirectory("graft_sqlcase_a").toString
    F.build(ev.limit(300), dA, "event_id", Seq("user_id"), 2)
    F.merge(spark, dA, src, 2, Seq(
      Update(Some(cond), Map("value" -> setV, "event_type" -> "'cased'")),
      Insert(None)))
    assert(rows(F.read(spark, dS)) == rows(F.read(spark, dA)))
    assert(F.read(spark, dS).where(col("event_type") === "cased").count() > 0)
  }

  test("GRAFT MERGE accepts NAKED (unparenthesized) CASE in conditions and SET") {
    import F.MergeClause._
    ev.limit(300).createOrReplaceTempView("graft_sql_ev8")
    val src = ev.limit(150).withColumn("value", col("value") + 3.0)
    src.createOrReplaceTempView("graft_sql_msrc8")
    // Top-level CASE WHEN … THEN … END in BOTH positions: the splitter
    // must not read the CASE's own WHEN/THEN as clause structure.
    val cond = "CASE WHEN s.value >= t.value THEN true ELSE false END"
    val setV = "CASE WHEN s.value > 100.0 THEN s.value WHEN s.value > 50.0 THEN s.value + 1.0 ELSE t.value END"
    val dS = Files.createTempDirectory("graft_sqlncase_s").toString
    spark.sql(s"GRAFT BUILD '$dS' KEY event_id ORDER BY (user_id) FILES 2 USING graft_sql_ev8")
    spark.sql(
      s"""GRAFT MERGE INTO '$dS' FILES 2 USING graft_sql_msrc8
          WHEN MATCHED AND $cond THEN UPDATE SET value = $setV, event_type = 'ncased'
          WHEN MATCHED THEN DELETE
          WHEN NOT MATCHED AND CASE WHEN s.value >= 0 THEN true ELSE false END THEN INSERT""")
    val dA = Files.createTempDirectory("graft_sqlncase_a").toString
    F.build(ev.limit(300), dA, "event_id", Seq("user_id"), 2)
    F.merge(spark, dA, src, 2, Seq(
      Update(Some(cond), Map("value" -> setV, "event_type" -> "'ncased'")),
      Delete(None),
      Insert(Some("CASE WHEN s.value >= 0 THEN true ELSE false END"))))
    assert(rows(F.read(spark, dS)) == rows(F.read(spark, dA)))
    assert(F.read(spark, dS).where(col("event_type") === "ncased").count() > 0)
  }

  test("a column legally named `case` never derails clause splitting: qualified refs, SET targets, and operators stay value positions") {
    import F.MergeClause._
    val base = ev.limit(200).withColumnRenamed("value", "case")
    base.createOrReplaceTempView("graft_sql_evC")
    val src = base.limit(100).withColumn("case", col("case") + 5.0)
    src.createOrReplaceTempView("graft_sql_msrcC")
    val dS = Files.createTempDirectory("graft_sqlcasecol_s").toString
    spark.sql(s"GRAFT BUILD '$dS' KEY event_id ORDER BY (user_id) FILES 2 USING graft_sql_evC")
    // `t.case`/`s.case` (qualified), `SET case =` (operator follows),
    // and a condition comparing them: none may open CASE tracking —
    // caseDepth would never close and the WHEN/THEN split would fail.
    spark.sql(
      s"""GRAFT MERGE INTO '$dS' FILES 2 USING graft_sql_msrcC
          WHEN MATCHED AND s.case > t.case THEN UPDATE SET case = s.case + t.case, event_type = 'cased'
          WHEN NOT MATCHED THEN INSERT""")
    val dA = Files.createTempDirectory("graft_sqlcasecol_a").toString
    F.build(base, dA, "event_id", Seq("user_id"), 2)
    F.merge(spark, dA, src, 2, Seq(
      Update(Some("s.case > t.case"),
        Map("case" -> "s.case + t.case", "event_type" -> "'cased'")),
      Insert(None)))
    assert(rows(F.read(spark, dS)) == rows(F.read(spark, dA)))
    assert(F.read(spark, dS).where(col("event_type") === "cased").count() > 0)
    // A REAL naked CASE still tracks (simple-CASE operand form too).
    spark.sql(
      s"""GRAFT MERGE INTO '$dS' FILES 2 USING graft_sql_msrcC
          WHEN MATCHED THEN UPDATE SET event_type = CASE t.event_type WHEN 'cased' THEN 'recased' ELSE t.event_type END
          WHEN NOT MATCHED THEN INSERT""")
    assert(F.read(spark, dS).where(col("event_type") === "recased").count() > 0)
  }

  test("operator-leading simple-CASE operands still OPEN a CASE; `case NOT IN (…)` stays a value position") {
    import F.MergeClause._
    ev.limit(200).createOrReplaceTempView("graft_sql_evN")
    val src = ev.limit(100).withColumn("value", col("value") + 2.0)
    src.createOrReplaceTempView("graft_sql_msrcN")
    val dS = Files.createTempDirectory("graft_sqlnegcase_s").toString
    spark.sql(s"GRAFT BUILD '$dS' KEY event_id ORDER BY (user_id) FILES 2 USING graft_sql_evN")
    // `CASE -expr WHEN …` and `CASE NOT expr WHEN …`: operator-leading
    // simple-CASE operands — the splitter must still track CASE…END
    // depth, or the CASE's own WHEN/THEN reads as clause structure.
    val setV = "CASE -s.value WHEN -1.0 THEN 0.0 ELSE s.value END"
    val cond = "CASE NOT s.value >= t.value WHEN true THEN false ELSE true END"
    spark.sql(
      s"""GRAFT MERGE INTO '$dS' FILES 2 USING graft_sql_msrcN
          WHEN MATCHED AND $cond THEN UPDATE SET value = $setV, event_type = 'neg'
          WHEN NOT MATCHED THEN INSERT""")
    val dA = Files.createTempDirectory("graft_sqlnegcase_a").toString
    F.build(ev.limit(200), dA, "event_id", Seq("user_id"), 2)
    F.merge(spark, dA, src, 2, Seq(
      Update(Some(cond), Map("value" -> setV, "event_type" -> "'neg'")),
      Insert(None)))
    assert(rows(F.read(spark, dS)) == rows(F.read(spark, dA)))
    assert(F.read(spark, dS).where(col("event_type") === "neg").count() > 0)

    // An UNQUALIFIED column named `case` followed by NOT IN is a VALUE
    // usage (demoted by the NOT-lookahead) — were it misread as a CASE
    // opener, the depth would never close and the THEN/WHEN split fails.
    val baseC = ev.limit(120).withColumn("case", col("value") + 1.0)
    baseC.createOrReplaceTempView("graft_sql_evN2")
    ev.limit(60).withColumn("value", col("value") + 9.0)
      .createOrReplaceTempView("graft_sql_msrcN2")
    val dC = Files.createTempDirectory("graft_sqlnotin_s").toString
    spark.sql(s"GRAFT BUILD '$dC' KEY event_id ORDER BY (user_id) FILES 2 USING graft_sql_evN2")
    spark.sql(
      s"""GRAFT MERGE INTO '$dC' FILES 2 USING graft_sql_msrcN2
          WHEN MATCHED AND case NOT IN (-12345.0) THEN UPDATE SET value = s.value
          WHEN NOT MATCHED THEN INSERT""")
    val dC2 = Files.createTempDirectory("graft_sqlnotin_a").toString
    F.build(baseC, dC2, "event_id", Seq("user_id"), 2)
    F.merge(spark, dC2,
      ev.limit(60).withColumn("value", col("value") + 9.0), 2, Seq(
        Update(Some("case NOT IN (-12345.0)"), Map("value" -> "s.value")),
        Insert(None)))
    assert(rows(F.read(spark, dC)) == rows(F.read(spark, dC2)))
  }

  test("GRAFT OVERWRITE INTO replaces the live rows in one history-preserving commit") {
    ev.createOrReplaceTempView("graft_sql_evA")
    val d = Files.createTempDirectory("graft_sqlow").toString
    spark.sql(s"GRAFT BUILD '$d' KEY event_id ORDER BY (user_id) FILES 2 USING graft_sql_evA")
    val v = version(spark.sql(s"GRAFT OVERWRITE INTO '$d' FILES 2 USING " +
      "(SELECT event_id, user_id, ts_us, event_type, value * 3 AS value " +
      "FROM graft_sql_evA WHERE event_id < 100)"))
    assert(v == 2L && M.snapshot(spark, d).op == "overwrite")
    assert(rows(F.read(spark, d)) == rows(
      ev.where(col("event_id") < 100).withColumn("value", col("value") * 3)))
    assert(rows(F.read(spark, d, 1L)) == rows(ev),
      "overwrite is a commit, not a wipe — v1 still time-travels")
    // An EMPTY overwrite empties the table (the SQL idiom), loudly
    // committing one tombstone generation — never an NPE from a
    // zero-row stats write; and overwriting an empty table is a no-op.
    val v3 = version(spark.sql(s"GRAFT OVERWRITE INTO '$d' USING " +
      "(SELECT * FROM graft_sql_evA WHERE 1 = 0)"))
    assert(v3 == 3L && F.read(spark, d).isEmpty)
    assert(rows(F.read(spark, d, 2L)).nonEmpty, "history intact through the empty overwrite")
    val v4 = version(spark.sql(s"GRAFT OVERWRITE INTO '$d' USING " +
      "(SELECT * FROM graft_sql_evA WHERE 1 = 0)"))
    assert(v4 == 3L, "overwriting an already-empty table is a version no-op")
  }

  test("string literals with case-EXPANDING characters (ß) never desync clause splitting") {
    ev.limit(50).createOrReplaceTempView("graft_sql_ev9")
    val d = Files.createTempDirectory("graft_sqless").toString
    spark.sql(s"GRAFT BUILD '$d' KEY event_id ORDER BY (user_id) FILES 2 USING graft_sql_ev9")
    // 'ß'.toUpperCase == "SS": a whole-string uppercase would shift
    // every offset past this literal and missplit the WHEN/THEN that
    // follow it — per-character matching must hold the positions.
    spark.sql(
      s"""GRAFT MERGE INTO '$d' FILES 2 USING graft_sql_ev9
          WHEN MATCHED AND t.event_type <> 'straße when then end case' THEN UPDATE SET event_type = 'straße'
          WHEN NOT MATCHED THEN INSERT""")
    assert(F.read(spark, d).where(col("event_type") === "straße").count() == 50)
  }

  test("GRAFT DESCRIBE and time-based VACUUM (RETAIN n HOURS)") {
    ev.createOrReplaceTempView("graft_sql_ev6")
    val d = Files.createTempDirectory("graft_sqldesc").toString
    spark.sql(s"GRAFT BUILD '$d' KEY event_id ORDER BY (user_id, ts_us) " +
      s"STATS (user_id, ts_us, event_id) FILES 2 USING graft_sql_ev6")
    spark.sql(s"GRAFT ADD CONSTRAINT chk_v CHECK (value >= 0) IN '$d'")
    spark.sql(s"GRAFT DELETE FROM '$d' WHERE user_id % 9 = 1")
    val props = spark.sql(s"GRAFT DESCRIBE '$d'").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("version") == "3" && props("last_op") == "delete")
    assert(props("key_column") == "event_id")
    assert(props("order_columns") == "user_id ts_us")
    assert(props("logical_schema") == "event_id, user_id, ts_us, event_type, value")
    assert(props("constraints") == "chk_v: value >= 0")
    assert(props("data_segments") == "1" && props("data_files") == "2")
    assert(props("data_rows") == ev.count().toString)
    assert(props("tombstone_segments") == "1")
    assert(props("committed_at_ms").toLong > 0L)
    // Generous time retention keeps everything (all commits are fresh).
    spark.sql(s"GRAFT VACUUM '$d' RETAIN 1000 HOURS")
    assert(M.committedVersions(M.fs(spark, d), d) == Seq(1L, 2L, 3L))
    // Zero retention (driven directly with a future 'now' so same-ms
    // commits can't flake): only the LATEST version survives.
    M.vacuumOlderThan(spark, d, 0L, System.currentTimeMillis() + 60000L)
    assert(M.committedVersions(M.fs(spark, d), d) == Seq(3L))
    assert(rows(F.read(spark, d)) == rows(ev.where(col("user_id") % 9 =!= 1)),
      "the retained version serves byte-identically")
  }

  test("malformed GRAFT statements fail loudly; ordinary SQL passes through the delegate") {
    val e = intercept[Exception](spark.sql("GRAFT FROB 'x'"))
    assert(e.getMessage.contains("GRAFT statement error"))
    val e2 = intercept[Exception](spark.sql(
      "GRAFT MERGE INTO '/tmp/x' USING v WHEN SORTA MATCHED THEN UPDATE SET a = 1"))
    assert(e2.getMessage.contains("GRAFT"))
    assert(spark.sql("SELECT 1 + 1 AS two").head().getInt(0) == 2)
    // A non-GRAFT statement that merely MENTIONS graft is untouched.
    assert(spark.sql("SELECT 'GRAFT DELETE' AS s").head().getString(0)
      == "GRAFT DELETE")
  }
}
