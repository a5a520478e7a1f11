package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{EventLog, Pipeline}
import graft.sources.Tables

/** The two-pass exact-quantile selection (histogram cells → rank-select
  * within target cells) against Spark's own `percentile`: bit-identical
  * pre-rounding on the real corpus, for both the grouped (q25) and
  * whole-corpus (q56 bounds) shapes. This is what licenses swapping the
  * unbounded per-group multiset buffer out of the headline queries: the
  * replacement is provably the same function, computed with bounded
  * shuffle keys and bounded sort partitions.
  */
class QuantileSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      // These suites drive EVERY SparkEntry query, including the
      // TableCatalog ones (q140r CTAS) — the graft catalog must exist.
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse",
        s"${System.getProperty("java.io.tmpdir")}/graft_catalog_warehouse")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftSession.registerUdafs(s)
    s
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val sf = "/root/testdata/sf0.001"

  test("grouped two-pass quantiles are bit-identical to percentile()") {
    val ev = Tables.events(spark, sf)
    val ps = Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99")
    val viaBuffer = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        expr("percentile(value, 0.99)").as("p99"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    val viaTwoPass = EventLog.exactQuantiles(ev, ps)
      .select("event_type", "n", "p50", "p90", "p99")
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(viaTwoPass == viaBuffer)
  }

  test("two-pass quantiles at awkward p values (rank exactly integral, p=0, p=1)") {
    val ev = Tables.events(spark, sf)
    // p=0 → min, p=1 → max, plus a p designed to make p·(n−1) integral
    // for at least some group sizes.
    val ps = Seq(0.0 -> "pmin", 0.25 -> "p25", 1.0 -> "pmax")
    val viaBuffer = ev.groupBy("event_type")
      .agg(
        expr("percentile(value, 0.0D)").as("pmin"),
        expr("percentile(value, 0.25D)").as("p25"),
        expr("percentile(value, 1.0D)").as("pmax"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    val viaTwoPass = EventLog.exactQuantiles(ev, ps)
      .select("event_type", "pmin", "p25", "pmax")
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(viaTwoPass == viaBuffer)
    // And p=0 / p=1 really are the group min/max.
    val minMax = ev.groupBy("event_type")
      .agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(viaTwoPass.map(r => Seq(r(1), r(3))) == minMax.map(r => Seq(r(1), r(2))))
  }

  test("whole-corpus two-pass bounds (q56 shape) are bit-identical to percentile()") {
    val docs = Tables.table(spark, sf, "documents")
    val viaBuffer = docs
      .agg(expr("percentile(n_chars, 0.05D)").as("lo"),
        expr("percentile(n_chars, 0.95D)").as("hi"))
      .collect()(0).toSeq
    val viaTwoPass = EventLog.exactQuantiles(
        docs.withColumn("_all", lit(0)), Seq(0.05 -> "lo", 0.95 -> "hi"),
        cellsPerUnit = 1.0, groupCol = "_all", valueCol = "n_chars")
      .select("lo", "hi").collect()(0).toSeq
    assert(viaTwoPass == viaBuffer)
  }

  test("coarse grid cells (many rows per cell) still select exactly") {
    val ev = Tables.events(spark, sf)
    val ps = Seq(0.5 -> "p50", 0.9 -> "p90")
    val fine = EventLog.exactQuantiles(ev, ps, cellsPerUnit = 100.0)
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    // 0.01 cells/unit → ~few cells over the whole value range: pass 2
    // does real within-cell rank work instead of hitting 1-row cells.
    val coarse = EventLog.exactQuantiles(ev, ps, cellsPerUnit = 0.01)
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(coarse == fine)
  }

  test("no headline query plans an exact-percentile multiset buffer") {
    // The scale contract behind this spec: `percentile(...)` buffers a
    // group's whole value multiset in one aggregation buffer.
    // approx_percentile's mergeable GK sketch is allowed.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.optimizedPlan.toString
      if ("(?<!approx_)percentile\\(".r.findFirstIn(plan).isDefined) Some(name) else None
    }
    assert(offenders.isEmpty, s"exact percentile() buffer in: $offenders")
  }
}
