package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Environment-portability guard for the events reader.
  *
  * Round-5 post-mortem: the sandbox's Spark moved to 4.1.2, the
  * `nanosAsLong` legacy conf vanished, and every events query failed
  * analysis — silently, because nothing pinned the reader's OUTPUT
  * contract against golden values. This spec reads `events.parquet`
  * fresh (no GraftSession, mimicking a foreign harness session) and
  * asserts the normalized schema + exact epoch values DuckDB computes
  * for the same file (`epoch_us(ts)`), under BOTH NTZ-inference
  * settings, so the next silent environment flip is a 1-line diagnosis
  * here rather than 42 dead queries in the round artifact.
  */
class EventsReaderSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  // Golden values computed by DuckDB over the same parquet:
  //   select min(epoch_us(ts)), max(epoch_us(ts)), count(*) from events
  private val GoldenMinUs = 1704067798778549L
  private val GoldenMaxUs = 1706657176220708L
  private val GoldenRows  = 1000L

  // Suites share the forked test JVM; a leftover session would make
  // getOrCreate hand back someone else's conf. Force a fresh one.
  private def fresh(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  private def check(spark: SparkSession): Unit = {
    try {
      spark.sparkContext.setLogLevel("ERROR")
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType, "normalized ts must be TimestampType")
      assert(ev.schema("ts_us").dataType == LongType)
      assert(ev.schema("ts_ns").dataType == LongType)
      val row = ev.agg(
        min(col("ts_us")), max(col("ts_us")), count(lit(1)),
        min(col("ts_ns")), min(unix_micros(col("ts")))).head()
      assert(row.getLong(0) == GoldenMinUs, s"min ts_us ${row.getLong(0)} != golden $GoldenMinUs")
      assert(row.getLong(1) == GoldenMaxUs, s"max ts_us ${row.getLong(1)} != golden $GoldenMaxUs")
      assert(row.getLong(2) == GoldenRows)
      assert(row.getLong(3) == GoldenMinUs * 1000L, "ts_ns must be exactly 1000x ts_us on micro data")
      assert(row.getLong(4) == GoldenMinUs, "ts column instant must agree with ts_us")
    } finally spark.stop()
  }

  test("events reader matches DuckDB goldens with NTZ inference disabled (GraftSession path)") {
    fresh()
    check(SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
  }

  test("events reader matches DuckDB goldens with NTZ inference enabled (foreign-session path)") {
    fresh()
    check(SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
  }
}
