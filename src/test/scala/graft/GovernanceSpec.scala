package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Pipeline, Privacy, Profile}
import graft.sources.Tables

/** Structural invariants of the governance/quality operators
  * (q124-q129) — the claims behind the oracle hashes: the k-anonymity
  * gate never releases a thin cell, DP noise is reproducible and
  * consistent, winsorization clips into the band and only flags true
  * outliers, PSI contributions are non-negative and count-preserving,
  * fuzzy matching stays inside blocks, and the erasure audit's output
  * really contains no erased subject.
  */
class GovernanceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

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

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private lazy val events = Tables.events(spark, sf)
  private lazy val docs = Tables.table(spark, sf, "documents")

  test("q124: every released cell clears k, and released events never exceed the log") {
    val k = 5
    val rel = Privacy.kAnonRelease(events, k).collect()
    assert(rel.nonEmpty)
    assert(rel.forall(_.getAs[Long]("n_users") >= k))
    val total = events.count()
    assert(rel.map(_.getAs[Long]("n_events")).sum <= total)
    // Suppressed residual rows never name a bucket.
    assert(rel.filter(_.getAs[String]("level") == "suppressed")
      .forall(_.getAs[Long]("bucket") == -1L))
  }

  test("q129: DP noise is deterministic across runs and internally consistent") {
    val eps = 0.5
    val a = Privacy.dpCountRelease(events, eps).collect()
    val b = Privacy.dpCountRelease(events, eps).collect()
    assert(a.toSeq == b.toSeq, "cell-seeded noise must be reproducible")
    assert(a.nonEmpty)
    a.foreach { r =>
      val (n, noise, rel) = (r.getAs[Long]("n_raw"),
        r.getAs[Double]("noise"), r.getAs[Double]("released"))
      // released = n_raw + noise on the 1e-6 grid.
      assert(math.abs(rel - (n + noise)) < 1e-6)
      // Laplace inverse-CDF tail bound for u on the (k+0.5)/2^48 grid:
      // |noise| <= b * ln(2^49).
      assert(math.abs(noise) <= (1.0 / eps) * 49 * math.log(2.0) + 1e-6)
    }
    // Noise varies across cells (not a constant offset).
    assert(a.map(_.getAs[Double]("noise")).distinct.length > 1)
  }

  test("q125: winsorized values sit inside the band; clip flags match movement") {
    val out = Pipeline.winsorize(events, 0.05, 0.95)
    val joined = out.join(events.select("event_id", "value"), "event_id")
    // A row is flagged clipped iff its winsorized value differs from
    // the (grid-rounded) raw value.
    val moved = joined.withColumn("vr",
      graft.functions.Deterministic.roundTo(col("value"), 4))
    assert(moved.filter(!col("clipped") && col("value_w") =!= col("vr")).count() == 0)
    assert(moved.filter(col("clipped") && col("value_w") === col("vr")).count() == 0)
    // Some rows clip at this band on real data, but never the majority.
    val n = out.count()
    val c = out.filter(col("clipped")).count()
    assert(c > 0 && c < n / 2)
    assert(n == events.count())
  }

  test("q126: PSI contributions are non-negative and counts partition the corpus") {
    val drift = Profile.distributionDrift(docs)
    assert(drift.filter(col("psi_c") < 0).count() == 0)
    val nDocs = docs.count()
    val perFeature = drift.groupBy("feature")
      .agg(sum(col("n_a") + col("n_b")).as("n")).collect()
    assert(perFeature.length == 3)
    assert(perFeature.forall(_.getAs[Long]("n") == nDocs))
  }

  test("q128: fuzzy matches stay in-block, are ordered pairs, and never lev-0") {
    val parts = Tables.table(spark, sf, "part")
    val m = Dedup.fuzzyEntityMatch(parts, 2).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      val (a, b, blk, lev) = (r.getAs[String]("name_a"), r.getAs[String]("name_b"),
        r.getAs[String]("block"), r.getAs[Long]("lev"))
      assert(a < b)
      assert(a.endsWith(" " + blk) && b.endsWith(" " + blk))
      assert(lev >= 1 && lev <= 2)
    }
  }

  test("q127: no erased subject id appears on any serving surface") {
    GraftSession.registerUdafs(spark)
    val audit = SparkEntry.queries("q127_erasure_audit")(spark, sf)
    val rows = audit.collect()
    assert(rows.nonEmpty)
    // The take-down set is ids ≡ 5 (mod 13) — none may surface.
    assert(rows.forall(_.getAs[Long]("id") % 13 != 5))
    assert(Set("bm25", "phrase", "ann").subsetOf(
      rows.map(_.getAs[String]("surface")).toSet))
  }
}
