package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.{SyncEvent, SyncResponse, SyncStateRow}

/** The reference's wire format (its only source and sink) as Spark
  * schemas + declarative converters.
  *
  * Reference anchors: request body = `GameRequest{Events, State}`
  * (main.go:96-99, decoded main.go:63-69); response =
  * `GameResponse{T, Events, States, ProxyId}` serialized with Go's
  * `json.Marshal` (main.go:101-115), so field names are the Go
  * exported names verbatim. Event/State shapes: model/event.go:7-12,
  * model/state.go:7-11.
  *
  * Everything here is `from_json`/`to_json` over typed schemas —
  * codegen'd row-level work, no UDFs, safe at any scale; JSON-lines
  * files shard like any other splittable source.
  */
object WireJson {

  /** model/event.go:7-12 with Go-exported JSON field names. */
  val eventSchema: StructType = StructType(Seq(
    StructField("T", LongType),
    StructField("Type", StringType),
    StructField("Origin", StringType),
    StructField("Body", StringType)))

  /** model/state.go:7-11. */
  val stateSchema: StructType = StructType(Seq(
    StructField("T", LongType),
    StructField("Origin", StringType),
    StructField("Data", MapType(StringType, StringType))))

  /** main.go:96-99 (`State` is omitempty → nullable). */
  val requestSchema: StructType = StructType(Seq(
    StructField("Events", ArrayType(eventSchema)),
    StructField("State", MapType(StringType, StringType))))

  /** main.go:101-107. */
  val responseSchema: StructType = StructType(Seq(
    StructField("T", LongType),
    StructField("Events", ArrayType(eventSchema)),
    StructField("States", ArrayType(stateSchema)),
    StructField("ProxyId", StringType)))

  /** Parse raw request-body JSON (one request per row in `jsonCol`)
    * into typed `events` / `state` columns — the engine-side twin of
    * the reference's `decoder.Decode(&req)` (main.go:63-69). Malformed
    * JSON yields null (PERMISSIVE), where the reference panics
    * (main.go:66-68) — a server can't crash per bad request at scale.
    */
  def parseRequests(raw: DataFrame, jsonCol: String): DataFrame =
    raw
      .withColumn("_req", from_json(col(jsonCol), requestSchema))
      .withColumn("events", col("_req.Events"))
      .withColumn("state", col("_req.State"))
      .drop("_req")

  /** One spooled listener request ([[SyncHttpServer]]'s request log):
    * the URL-path fields plus the raw GameRequest body, one JSON object
    * per accepted request, appended in per-stream processing order.
    */
  val spoolSchema: StructType = StructType(Seq(
    StructField("seq", LongType),
    StructField("stream", StringType),
    StructField("now", LongType),
    StructField("client_id", StringType),
    StructField("last_known_t", LongType),
    StructField("body", StringType)))

  /** Lift a listener spool into typed [[graft.operators.SyncRequest]]s
    * — the live→engine loop closure: the same rows drive the
    * Structured Streaming engine (S4 shape) or the batch replay, and
    * both must reproduce the live responses (StreamingSpec S4b).
    * Restrictions of the SyncRequest model, by design: stream names
    * must be numeric (the engine keys streams by long id), one event
    * per request with a NUMERIC body and numeric client ids (the
    * testdata sync model — the replay paths sort by (now, body) and
    * derive user_id from client_id; non-numeric values fail fast in
    * the fold), and `now` values must be distinct within a stream for
    * order fidelity: SyncRequest carries no spool seq, so same-
    * millisecond requests replay in body order, not arrival order.
    * StreamingSpec S4b's scripted scenario satisfies all four.
    */
  def spooledSyncRequests(spool: DataFrame): Dataset[graft.operators.SyncRequest] = {
    import spool.sparkSession.implicits._
    parseRequests(spool, "body")
      .select(
        col("stream").cast("long").as("stream_id"),
        col("now"),
        col("client_id"),
        coalesce(element_at(col("events"), 1).getField("Type"), lit("")).as("event_type"),
        coalesce(element_at(col("events"), 1).getField("Body"), lit("")).as("body"))
      .as[graft.operators.SyncRequest]
  }

  /** Serialize one sync response to the reference's wire JSON
    * (main.go:101-115). Row shape in: (t, proxy_id,
    * events array<struct>, states array<struct>) — see
    * [[responsesFromCore]] for building it from engine values.
    */
  def serializeResponses(resp: DataFrame): DataFrame =
    resp.select(to_json(struct(
      col("t").as("T"),
      col("events").as("Events"),
      col("states").as("States"),
      col("proxy_id").cast("string").as("ProxyId"))).as("response_json"))

  /** Lift in-memory [[SyncResponse]]s (the pure core's output) into the
    * wire row shape consumed by [[serializeResponses]].
    */
  def responsesFromCore(spark: SparkSession, resps: Seq[SyncResponse]): DataFrame = {
    val rows = resps.map { r =>
      Row(
        r.t,
        r.deltaEvents.map { case (_, e) => Row(e.t, e.eventType, e.origin, e.body) },
        r.deltaStates.map(s => Row(s.t, s.origin, s.data)),
        r.proxyId.toString)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      StructType(Seq(
        StructField("t", LongType),
        StructField("events", ArrayType(eventSchema)),
        StructField("states", ArrayType(stateSchema)),
        StructField("proxy_id", StringType))))
  }

  /** JSON-lines sink: one JSON object per line, splittable on read. */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** JSON-lines source with an explicit schema — never infer on a large
    * corpus (inference is a full extra pass over the data).
    */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** CSV sink (header, splittable on read). CSV carries no types, so the
    * reader below requires the explicit schema back.
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** CSV source with an explicit schema — same rule as JSON: inference
    * is an extra full pass AND guesses types per-file; a 100 TB ingest
    * declares its schema.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** ORC sink — the second columnar format a warehouse-facing engine
    * must speak (parquet is the native one). ORC files carry their own
    * schema and min/max stripe statistics, so reads below prune and
    * push down exactly like parquet.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** ORC source. No schema parameter: unlike CSV/JSON, ORC is
    * self-describing — the footer IS the schema, no inference pass.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
