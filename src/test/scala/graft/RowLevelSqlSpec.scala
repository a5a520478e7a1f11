package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{FactStore => F, ManifestLog => M, Tables}

/** Standard SQL row-level DML on graft tables (GraftRowLevelSql):
  * `UPDATE t SET … WHERE …` and `MERGE INTO` with NO graft dialect must
  * route into the one FactStore commit layer — same results as the
  * Scala API, versioned history, time travel intact — and DELETEs
  * whose predicates the Filter algebra cannot carry (modulo etc.) must
  * work instead of failing at planning. Unsupported shapes are loud
  * and name the alternative.
  */
class RowLevelSqlSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def freshTable(name: String, data: DataFrame): String = {
    val d = Files.createTempDirectory(s"graft_rls_$name").toString
    F.build(data, d, "event_id", Seq("user_id", "ts_us"), 4,
      Seq("user_id", "ts_us", "event_id"))
    spark.sql(s"CREATE TABLE $name USING graft LOCATION '$d'")
    d
  }

  test("standard UPDATE: expression SET + WHERE lands as one tombstone+data commit, history intact") {
    val d = freshTable("rls_upd", ev.limit(400))
    spark.sql(
      """UPDATE rls_upd SET value = value * 2 + 1, event_type = 'bumped'
         WHERE user_id % 3 = 0 AND event_id < 350""")
    val snap = M.snapshot(spark, d)
    assert(snap.version == 2L && snap.op == "update")
    val want = ev.limit(400).select(
      col("event_id"), col("user_id"), col("ts_us"),
      when(col("user_id") % 3 === 0 && col("event_id") < 350, lit("bumped"))
        .otherwise(col("event_type")).as("event_type"),
      when(col("user_id") % 3 === 0 && col("event_id") < 350, col("value") * 2 + 1)
        .otherwise(col("value")).as("value"))
    assert(rows(spark.table("rls_upd")) == rows(want))
    assert(rows(F.read(spark, d, 1L)) == rows(ev.limit(400)),
      "the pre-update version still time-travels")
    // The write is change-bounded: only matched rows in the new segment.
    val updSeg = snap.segments.filter(s => s.kind == "data" && s.dir.contains("update"))
    assert(updSeg.map(_.rows).sum ==
      ev.limit(400).where(col("user_id") % 3 === 0 && col("event_id") < 350).count())
  }

  test("UPDATE without WHERE rewrites every live row; an UPDATE matching nothing is a version no-op") {
    val d = freshTable("rls_updall", ev.limit(100))
    spark.sql("UPDATE rls_updall SET value = 0.5")
    assert(spark.table("rls_updall").select(sum(col("value"))).head().getDouble(0) == 50.0)
    val v = M.currentVersion(spark, d)
    spark.sql("UPDATE rls_updall SET value = 9.9 WHERE event_id < 0")
    assert(M.currentVersion(spark, d) == v, "no matched rows => no commit")
  }

  test("UPDATE of the key column is rejected loudly (a key change is a new identity)") {
    freshTable("rls_updkey", ev.limit(50))
    val e = intercept[Exception](spark.sql(
      "UPDATE rls_updkey SET event_id = event_id + 1"))
    assert(e.getMessage.contains("key"), s"got: ${e.getMessage}")
  }

  test("DELETE with a predicate the Filter algebra cannot carry (modulo) works through the row-level path") {
    val d = freshTable("rls_delmod", ev.limit(300))
    spark.sql("DELETE FROM rls_delmod WHERE user_id % 3 = 0")
    assert(M.snapshot(spark, d).op == "delete")
    assert(rows(spark.table("rls_delmod")) ==
      rows(ev.limit(300).where(col("user_id") % 3 =!= 0)))
    // Complex boolean shapes too (function calls + OR).
    spark.sql("DELETE FROM rls_delmod WHERE pmod(event_id, 7) = 1 OR length(event_type) > 90")
    assert(rows(spark.table("rls_delmod")) ==
      rows(ev.limit(300).where(col("user_id") % 3 =!= 0 &&
        !(pmod(col("event_id"), lit(7)) === 1 || length(col("event_type")) > 90))))
  }

  test("standard MERGE INTO: UPDATE SET * / INSERT * and conditional clauses ≡ the Scala merge engine") {
    import F.MergeClause._
    val base = ev.limit(300)
    val src = base.limit(150).withColumn("value", col("value") + 10.0)
      .withColumn("event_type", lit("fresh"))
      .unionByName(base.limit(200).where(col("event_id") >= 150)
        .withColumn("event_id", col("event_id") + 900000))
    val d = freshTable("rls_merge", base)
    src.createOrReplaceTempView("rls_merge_src")
    spark.sql(
      """MERGE INTO rls_merge t USING rls_merge_src s ON t.event_id = s.event_id
         WHEN MATCHED AND s.value >= t.value + 10.0 THEN UPDATE SET value = s.value + t.value, event_type = 'merged'
         WHEN MATCHED THEN DELETE
         WHEN NOT MATCHED AND s.value >= 0 THEN INSERT *""")
    // Twin store driven through the Scala API.
    val dA = Files.createTempDirectory("graft_rls_merge_twin").toString
    F.build(base, dA, "event_id", Seq("user_id", "ts_us"), 4,
      Seq("user_id", "ts_us", "event_id"))
    F.merge(spark, dA, src, 4, Seq(
      Update(Some("s.value >= t.value + 10.0"),
        Map("value" -> "s.value + t.value", "event_type" -> "'merged'")),
      Delete(None),
      Insert(Some("s.value >= 0"))))
    assert(rows(spark.table("rls_merge")) == rows(F.read(spark, dA)))
    assert(M.snapshot(spark, d).op == "merge")
    // UPDATE SET * (star expansion) over a fresh pair.
    val d2 = freshTable("rls_merge2", base)
    spark.sql(
      """MERGE INTO rls_merge2 t USING rls_merge_src s ON t.event_id = s.event_id
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    val dB = Files.createTempDirectory("graft_rls_merge_twin2").toString
    F.build(base, dB, "event_id", Seq("user_id", "ts_us"), 4,
      Seq("user_id", "ts_us", "event_id"))
    F.merge(spark, dB, src, 4, Seq(
      Update(None, Map("user_id" -> "s.user_id", "ts_us" -> "s.ts_us",
        "event_type" -> "s.event_type", "value" -> "s.value")),
      Insert(None)))
    assert(rows(spark.table("rls_merge2")) == rows(F.read(spark, dB)))
  }

  test("unsupported merge shapes fail loudly with guidance, never as a generic capability error") {
    freshTable("rls_merge_bad", ev.limit(50))
    ev.limit(20).createOrReplaceTempView("rls_bad_src")
    val e1 = intercept[Exception](spark.sql(
      """MERGE INTO rls_merge_bad t USING rls_bad_src s ON t.user_id = s.user_id
         WHEN MATCHED THEN DELETE"""))
    assert(e1.getMessage.contains("key"), s"got: ${e1.getMessage}")
    // NOT MATCHED BY SOURCE graduated to supported in round 13
    // (MergePropertiesSpec owns its semantics); a non-identity INSERT
    // column list remains a loud rejection with guidance.
    val e2 = intercept[Exception](spark.sql(
      """MERGE INTO rls_merge_bad t USING rls_bad_src s ON t.event_id = s.event_id
         WHEN NOT MATCHED THEN INSERT (event_id, user_id, ts_us, event_type, value)
           VALUES (s.event_id, s.user_id, s.ts_us, 'forced', s.value)"""))
    assert(e2.getMessage.contains("INSERT"), s"got: ${e2.getMessage}")
    // Extra ON conjuncts next to NOT MATCHED clauses: loud, with the
    // rewrite named (the round-13 compound-ON soundness boundary).
    val e3 = intercept[Exception](spark.sql(
      """MERGE INTO rls_merge_bad t USING rls_bad_src s
         ON t.event_id = s.event_id AND t.user_id >= 0
         WHEN MATCHED THEN DELETE
         WHEN NOT MATCHED THEN INSERT *"""))
    assert(e3.getMessage.contains("extra ON conjuncts"), s"got: ${e3.getMessage}")
  }

  test("row-level SQL works against TableCatalog identifiers too (graft.db.x)") {
    val wh = Files.createTempDirectory("graft_rls_wh").toString
    // A second catalog instance pointed at a fresh warehouse.
    spark.conf.set("spark.sql.catalog.rlscat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rlscat.warehouse", wh)
    ev.limit(120).createOrReplaceTempView("rls_cat_src")
    spark.sql(
      """CREATE TABLE rlscat.db.t TBLPROPERTIES ('key'='event_id', 'order'='user_id')
         AS SELECT * FROM rls_cat_src""")
    spark.sql("UPDATE rlscat.db.t SET value = value + 1 WHERE user_id % 2 = 0")
    assert(M.snapshot(spark, s"$wh/db/t").op == "update")
    assert(rows(spark.table("rlscat.db.t")) == rows(
      ev.limit(120).withColumn("value",
        when(col("user_id") % 2 === 0, col("value") + 1).otherwise(col("value")))))
  }
}
