package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew
import graft.sources.Tables

/** The skew-resilient formulations must be exactly the naive plans'
  * results — salting and staging are physical rewrites, not semantic
  * ones.
  */
class SkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

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

  test("salted join equals the plain join, for any salt width and salt source") {
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "event_type", "value")
    val dim = ev.groupBy("event_type").agg(avg("value").as("type_avg"))
    val plain = ev.join(dim, "event_type")
    for ((src, n) <- Seq(col("event_id") -> 8, col("user_id") -> 3, lit(7) -> 5)) {
      val salted = Skew.saltedJoin(ev, dim, "event_type", src, n)
        .select(plain.columns.map(col): _*)
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        s"salted join diverged for saltSource=$src nSalts=$n")
    }
    assert(plain.count() > 0)
  }

  test("salted join scatters the hot key across salts (the skew property)") {
    val ev = Tables.events(spark, sf)
    val dim = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
    val perSalt = Skew.saltedJoin(
        ev.withColumn("_keep_salt", pmod(hash(col("event_id")), lit(8))),
        dim, "event_type", col("event_id"), 8)
      .groupBy("event_type", "_keep_salt").count()
    // Every (hot key, salt) cell is populated and no cell holds the
    // whole key's volume: the per-task bound that makes the join
    // skew-safe.
    val cells = perSalt.groupBy("event_type")
      .agg(count(lit(1)).as("n_salts"), max("count").as("max_cell"),
        sum("count").as("total"))
      .collect()
    assert(cells.nonEmpty)
    cells.foreach { r =>
      assert(r.getAs[Long]("n_salts") == 8L)
      assert(r.getAs[Long]("max_cell") < r.getAs[Long]("total"))
    }
  }

  test("two-stage distinct equals the direct count(DISTINCT) aggregation") {
    val ev = Tables.events(spark, sf)
    val fast = Skew.twoStageDistinct(ev).select("event_type", "n_users", "n_events")
    val slow = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
      .select("event_type", "n_users", "n_events")
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
    assert(fast.count() > 0)
  }
}
