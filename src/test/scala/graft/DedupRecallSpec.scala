package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.sources.Tables

/** The lexical-dedup accuracy contract, sibling of [[RecallSpec]]'s ANN
  * floors: MinHash+LSH candidate generation is a *recall* device — its
  * whole point is to find (almost) every truly-similar pair without the
  * O(n²) scan — so its recall against brute-force Jaccard ground truth
  * must be pinned, or a future "optimization" (fewer bands, a cheaper
  * signature) could silently start missing duplicates while every
  * determinism spec stays green.
  *
  * Ground truth here is the exhaustive all-pairs shingle Jaccard on the
  * real 500-document corpus (125k pairs — fine in a spec, and exactly
  * the computation LSH exists to avoid at scale). With the production
  * parameters (8 hashes, 4 bands × 2 rows) the banding S-curve gives a
  * pair of true similarity j collision probability 1-(1-j²)⁴; the
  * corpus's injected near-dups all sit at j ≥ 0.88 where that is
  * ≥ 0.998, so measured recall is 1.0 — pinned at a 0.9 floor so a
  * regenerated corpus with a boundary pair can't flake the suite while
  * a real recall regression (a band dropped, a hash lane broken) still
  * fails loudly.
  */
class DedupRecallSpec extends AnyFunSuite with BeforeAndAfterAll {

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
    GraftSession.registerUdafs(s)
    s
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val Threshold = 0.2

  private lazy val docs =
    Tables.table(spark, "/root/testdata/sf0.001", "documents")

  /** Exhaustive ground truth: every pair (a < b) with shingle Jaccard
    * ≥ threshold, keyed exactly like [[Dedup.nearDupPairs]] output.
    */
  private lazy val bruteForce: Map[(Long, Long), Double] = {
    val sh = Dedup.withShingles(docs).select("doc_id", "shingles")
    val a = sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("jac", expr(
        "size(array_intersect(sh_a, sh_b)) / size(array_union(sh_a, sh_b))"))
      .where(col("jac") >= Threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jac"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
  }

  private lazy val lsh: Map[(Long, Long), Double] =
    Dedup.nearDupPairs(docs, Threshold).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("LSH pairs are a subset of brute-force ground truth, Jaccard identical") {
    // The exact-Jaccard re-check on candidates guarantees zero false
    // positives — every emitted pair must exist in ground truth with
    // the same (4-decimal) similarity.
    assert(bruteForce.nonEmpty, "corpus should contain near-dup pairs")
    lsh.foreach { case (pair, jac) =>
      assert(bruteForce.contains(pair), s"LSH emitted non-similar pair $pair")
      assert(math.abs(bruteForce(pair) - jac) < 1e-9,
        s"Jaccard mismatch on $pair: lsh=$jac brute=${bruteForce(pair)}")
    }
  }

  test("LSH recall vs brute force meets its floor") {
    val found = bruteForce.keySet intersect lsh.keySet
    val recall = found.size.toDouble / bruteForce.size
    // Banding math: min ground-truth similarity in this corpus is
    // ~0.89 → per-pair collision probability 1-(1-0.89²)⁴ ≈ 0.998.
    // Measured recall 1.0 (28/28); floor 0.9 tolerates a regenerated
    // corpus with an unlucky boundary pair, still fails on any
    // structural regression (a dropped band halves the exponent).
    assert(recall >= 0.9,
      s"LSH recall = $recall (${found.size}/${bruteForce.size}; measured 1.0, floor 0.9)")
  }

  test("every high-similarity pair (j >= 0.85) is found") {
    // Above the S-curve knee the collision probability exceeds 0.997;
    // missing a j >= 0.85 pair on a 28-pair corpus indicates a broken
    // signature, not sampling noise.
    val high = bruteForce.filter(_._2 >= 0.85).keySet
    val missed = high -- lsh.keySet
    assert(missed.isEmpty, s"missed high-similarity pairs: $missed")
  }

  test("the bucket cap is an explicit recall/skew dial: cap 1 yields zero candidates") {
    // MaxBucket gates oversized buckets out of candidate generation; at
    // the degenerate cap every 2+ bucket is dropped, so no pairs can be
    // emitted. Pins that the knob actually gates (and that callers
    // trading skew-safety for recall see the trade, not a silent no-op).
    assert(Dedup.nearDupPairs(docs, Threshold, maxBucket = 1).count() == 0L)
  }
}
