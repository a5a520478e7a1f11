package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Tables, WireJson}
import graft.streaming.{SyncConfig, SyncCore}

/** The reference's JSON wire surface: request parsing, response
  * serialization (field names and shapes per main.go:96-115), and the
  * JSON-lines file source/sink roundtrip.
  */
class WireJsonSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("CSV roundtrip with explicit schema preserves the event log exactly") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts_us", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    WireJson.writeCsv(ev, dir)
    val back = WireJson.readCsv(spark, dir, ev.schema)
    assert(back.exceptAll(ev).isEmpty && ev.exceptAll(back).isEmpty)
    assert(back.schema == ev.schema)
  }

  test("ORC roundtrip is self-describing: full fidelity, schema from the footer, pushdown on read") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts_us", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    WireJson.writeOrc(ev, dir)
    val back = WireJson.readOrc(spark, dir)
    assert(back.schema == ev.schema) // no schema handed in — footer-derived
    assert(back.exceptAll(ev).isEmpty && ev.exceptAll(back).isEmpty)
    // Predicates reach the ORC scan like parquet (stripe-stat pruning).
    val filtered = back.where(org.apache.spark.sql.functions.col("user_id") === 1L)
    val scan = filtered.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scan.exists(_.metadata.get("PushedFilters").exists(_.contains("EqualTo(user_id,1)"))))
  }

  test("request bodies parse into typed events/state; malformed rows yield null, not a crash") {
    import spark.implicits._
    val raw = Seq(
      """{"Events":[{"T":0,"Type":"move","Origin":"ignored","Body":"x=1"}],"State":{"hp":"90"}}""",
      """{"Events":[]}""",
      """not json at all""").toDF("body")
    val parsed = WireJson.parseRequests(raw, "body").collect()
    assert(parsed(0).getAs[collection.Seq[org.apache.spark.sql.Row]]("events")
      .head.getAs[String]("Type") == "move")
    assert(parsed(0).getAs[Map[String, String]]("state") == Map("hp" -> "90"))
    assert(parsed(1).getAs[collection.Seq[_]]("events").isEmpty
      && parsed(1).getAs[Map[_, _]]("state") == null)
    assert(parsed(2).getAs[collection.Seq[_]]("events") == null)
  }

  test("responses serialize with the reference's Go field names") {
    val cfg = SyncConfig(tickUnit = 50L, clientTimeout = 10000L)
    var g = SyncCore.init(now = 1000L, seed = 7L)
    val (g1, _) = SyncCore.process(cfg, g, 1000L, "alice", None,
      events = Seq(("move", "x=1")), state = Some(Map("hp" -> "90")))
    val (_, r2) = SyncCore.process(cfg, g1, 1200L, "alice", None, Nil, None)

    val json = WireJson.serializeResponses(WireJson.responsesFromCore(spark, Seq(r2)))
      .head.getString(0)
    assert(json.contains("\"T\":" + r2.t))
    assert(json.contains("\"ProxyId\":\"1\""))
    assert(json.contains("\"Type\":\"_a\"")) // seed event delivered on first tick
    assert(json.contains("\"Type\":\"move\""))
    assert(json.contains("\"Data\":{\"hp\":\"90\"}"))
    // The wire JSON roundtrips through the declared response schema.
    import spark.implicits._
    val back = spark.read.schema(WireJson.responseSchema).json(Seq(json).toDS())
    assert(back.head.getAs[Long]("T") == r2.t)
  }

  test("JSON-lines sink/source roundtrips the events table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts_us", "user_id", "event_type", "value")
    WireJson.writeJsonLines(ev, dir)
    val back = WireJson.readJsonLines(spark, dir, ev.schema)
    assert(back.count() == ev.count())
    assert(back.exceptAll(ev).isEmpty && ev.exceptAll(back).isEmpty)
  }
}
