package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WebGraph
import graft.sources.Tables

/** Structural contracts of the web-graph centrality operators (q99
  * family) that the value-exact oracle doesn't state directly: the
  * closed-form graph has the declared degree profile, PageRank keeps
  * the teleport floor and an (almost-)conserved mass on the integer
  * grid, and rank actually concentrates (non-degenerate fixture).
  */
class WebGraphSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  override def afterAll(): Unit = spark.stop()

  private lazy val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
  private lazy val n = docs.count()

  test("link graph has the closed-form degree profile and in-range destinations") {
    val edges = WebGraph.linkGraph(docs).collect()
    assert(edges.length == docs.select(expr("sum(1 + doc_id % 3)"))
      .first().getLong(0), "edge count must equal sum of out-degrees")
    edges.foreach { r =>
      val (src, dst, deg) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(deg == 1 + src % 3)
      assert(dst >= 0 && dst < n, s"dst $dst out of range for n=$n")
    }
  }

  test("pageRank keeps the teleport floor and near-conserved integer mass") {
    val ranks = WebGraph.pageRank(docs, 4).collect()
    assert(ranks.length == n)
    val vals = ranks.map(_.getLong(1))
    // Teleport floor: a page nobody links to still holds 150000 micros.
    assert(vals.min >= 150000L)
    // Integer truncation only ever DROPS mass: total stays within
    // (n edges + n nodes) truncation losses per round of n × 1e6.
    val total = vals.sum
    assert(total <= n * 1000000L, s"mass created: $total > ${n * 1000000L}")
    assert(total >= n * 1000000L - 4 * 200 * (n + vals.length),
      s"mass lost beyond truncation bounds: $total")
    // Non-degenerate: centrality actually concentrates on the fixture.
    assert(vals.distinct.length > n / 2, "rank distribution collapsed")
    assert(vals.max > 2 * 1000000L, "no page concentrated rank")
  }

  test("zero rounds is the uniform start; each round changes the frame") {
    val r0 = WebGraph.pageRank(docs, 0).collect()
    assert(r0.forall(_.getLong(1) == 1000000L))
    val r1 = WebGraph.pageRank(docs, 1).collect().toSeq
    val r2 = WebGraph.pageRank(docs, 2).collect().toSeq
    assert(r1 != r2, "a second round must move ranks on this fixture")
  }

  test("Q134: degree-oriented triangle count equals an independent brute-force enumeration") {
    // Independent reference: collect the canonical undirected edge set
    // and count triangles by direct adjacency-set intersection — a
    // different algorithm entirely (no orientation, no joins).
    val edges = WebGraph.linkGraph(docs)
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = edges.foldLeft(Map.empty[Long, Set[Long]].withDefaultValue(Set.empty[Long])) {
      case (m, (u, v)) => m.updated(u, m(u) + v).updated(v, m(v) + u)
    }
    val brute = edges.toSeq.map { case (u, v) => (adj(u) & adj(v)).size }.sum / 3L
    val row = WebGraph.triangles(docs).head
    assert(row.getLong(row.fieldIndex("n_triangles")) == brute,
      s"oriented count ${row.getLong(row.fieldIndex("n_triangles"))} != brute $brute")
    assert(brute > 0L, "degenerate fixture: no triangles to count")
    // Consistency of the summary row itself.
    assert(row.getLong(row.fieldIndex("n_edges")) == edges.size.toLong)
    assert(row.getLong(row.fieldIndex("clustering_ppm")) ==
      3L * brute * 1000000L / row.getLong(row.fieldIndex("n_wedges")))
  }
}
