package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Bucketed, Tables}

/** Co-located (bucketed) joins: writing both sides bucketed by the join
  * key must remove every Exchange from the join plan — the one-time
  * layout cost that replaces a per-query fact-table shuffle at scale.
  */
class BucketedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private val warehouse =
    java.nio.file.Files.createTempDirectory("graft_warehouse").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", warehouse)
      // Force the sort-merge path so the audit checks bucketing, not a
      // small-data broadcast.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(warehouse))
  }

  test("join of two co-bucketed tables plans with zero Exchange and matches the plain join") {
    val ev = Tables.events(spark, sf)
    val left = ev.select("event_id", "user_id", "value")
    val right = ev.groupBy("user_id").agg(count(lit(1)).as("n_events"))
    Bucketed.writeBucketed(left, "ev_bucketed", "user_id", 8)
    Bucketed.writeBucketed(right, "users_bucketed", "user_id", 8)

    val joined = spark.table("ev_bucketed")
      .join(spark.table("users_bucketed"), "user_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

    val expected = left.join(right, "user_id")
    assert(joined.exceptAll(expected).isEmpty && expected.exceptAll(joined).isEmpty)
    assert(joined.count() == left.count())
  }

  test("aggregation on the bucket key also plans without an Exchange") {
    val agg = spark.table("ev_bucketed")
      .groupBy("user_id").agg(sum("value").as("sv"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed aggregation still shuffles:\n$plan")
    assert(agg.count() > 0)
  }
}
