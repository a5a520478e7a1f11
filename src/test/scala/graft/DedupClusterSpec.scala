package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Connected-component clustering over near-dup pairs: the properties
  * the DuckDB oracle can't stress on the natural corpus — transitive
  * chains much longer than any plausible fixed round cap, which the
  * pointer-jumped label propagation must collapse in O(log n) rounds.
  */
class DedupClusterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("a 60-link transitive chain collapses to ONE cluster (diameter >> naive round budget)") {
    import spark.implicits._
    // Sliding-window documents: doc i = words[i .. i+40]. Adjacent docs
    // share 38/40 shingles (J ≈ 0.95 ≥ 0.9); docs two apart share
    // 37/41 (J ≈ 0.90... below after the strict >= on rounded 0.9024?
    // — at threshold 0.92 only ADJACENT pairs qualify), so the cluster
    // graph is a path of diameter 59: min-label needs 59 naive rounds,
    // pointer jumping a handful.
    val words = (0 until 110).map(i => f"w$i%03d")
    val docs = (0 until 60)
      .map(i => (i.toLong, words.slice(i, i + 41).mkString(" ")))
      .toDF("doc_id", "text")

    val out = Dedup.nearDupClusters(docs, 0.92)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))

    assert(out.length == 60, s"expected all 60 docs clustered, got ${out.length}")
    assert(out.forall(_._2 == 0L), "every doc must join the single chain cluster")
    assert(out.forall(_._3 == 60L), "cluster size must be the full chain")
    assert(out.count(_._4) == 1 && out.find(_._4).get._1 == 0L,
      "exactly the min member is canonical")
  }

  test("disjoint duplicate groups stay separate clusters") {
    import spark.implicits._
    // Three groups of 3 identical docs each — no cross-group similarity.
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta", "eta theta iota kappa lambda mu",
      "nu xi omicron pi rho sigma")
    val docs = (for (g <- 0 until 3; c <- 0 until 3)
      yield ((g * 10 + c).toLong, texts(g))).toDF("doc_id", "text")

    val out = Dedup.nearDupClusters(docs, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 9)
    assert(out.groupBy(_._2).keySet == Set(0L, 10L, 20L), "min member labels clusters")
    assert(out.forall(_._3 == 3L))
  }
}
