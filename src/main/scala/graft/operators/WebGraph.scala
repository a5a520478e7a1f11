package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Web-graph centrality (north-star LLM-pipeline surface): a crawl
  * curation pipeline ranks pages/hosts by link centrality (the
  * CommonCrawl-style quality prior) before spending tokens on them.
  * The graph here is a deterministic closed-form fixture over the
  * documents table (the q92 salted-URL convention): page `i` links to
  * `outdeg(i) = 1 + i mod 3` pages `dst = (31·i + 17·j + 1) mod N`,
  * j < outdeg — varying out- AND in-degree, no dangling nodes, and
  * every edge recomputable by a SQL oracle in O(1).
  *
  * [[pageRank]] is the standard damped power iteration, kept on an
  * exact integer grid (the q88 PCA discipline): ranks live in micros
  * (BIGINT), each round is `r' = 150000 + (85 · Σ_u r_u div deg_u)
  * div 100` — integer `div` at the same two points the oracle uses
  * `//`, all values nonnegative, so Spark and DuckDB agree bit-for-bit
  * with no float drift across rounds.
  *
  * Scale shape: per round ONE shuffle keyed on the edge destination
  * (the canonical distributed-PageRank exchange) plus the map-side
  * contribution join; rank rows are (id, one long). Rounds are a fixed
  * small constant and each round ends in `localCheckpoint`, so plan
  * depth stays constant (the kmeansTrain loop contract) instead of
  * growing linearly with rounds.
  */
object WebGraph {

  /** The closed-form link graph: (src, dst, deg) — deg denormalized
    * onto every edge (it is closed-form in src, so no degree join is
    * ever needed). N comes from a broadcast one-row count frame, not a
    * driver collect.
    */
  def linkGraph(docs: DataFrame): DataFrame = {
    val n = docs.agg(count(lit(1)).as("n"))
    docs.select(col("doc_id").as("src"))
      .crossJoin(broadcast(n))
      .select(col("src"), col("n"),
        explode(expr("sequence(0, CAST(src % 3 AS INT))")).as("j"))
      .select(
        col("src"),
        ((col("src") * 31 + col("j") * 17 + 1) % col("n")).as("dst"),
        (col("src") % 3 + 1).as("deg"))
  }

  /** Q99 — the graph itself, summarized per destination: in-degree and
    * the distinct-source count (self-links and collisions make them
    * differ), the frontier statistics a crawl scheduler reads.
    */
  def linkStats(docs: DataFrame): DataFrame =
    linkGraph(docs)
      .groupBy("dst")
      .agg(
        count(lit(1)).as("in_deg"),
        countDistinct(col("src")).as("n_src"))
      .orderBy("dst")

  /** Q99b — damped PageRank on the exact-integer micros grid, `rounds`
    * iterations from the uniform start (1e6 micros per page).
    */
  def pageRank(docs: DataFrame, rounds: Int): DataFrame = {
    val ids = docs.select(col("doc_id"))
    // Every round joins the SAME edge frame — materialize it once
    // (the nearDupClusters loop convention) instead of re-deriving it
    // from the corpus scan each iteration. Round-13 tried eager edges
    // localCheckpoint + LAZY per-round rank checkpoints (defer all
    // materialization into the final consuming job); that regressed
    // q99b −16% / q99c −28% (BENCH_r13 vs r12): the one consuming job
    // then pays `rounds` chained persist-write+read barriers serially
    // where the eager form overlaps each round's write with the next
    // round's planning. Reverted to r12's measured-faster shape:
    // persist edges (filled by round 1's eager checkpoint action),
    // eager per-round checkpoints, explicit edge free at the end.
    val edges = linkGraph(docs).persist()
    var ranks = ids.withColumn("r", lit(1000000L))
    for (_ <- 1 to rounds) {
      val inMass = edges
        .join(ranks.withColumnRenamed("doc_id", "src"), "src")
        .select(col("dst").as("doc_id"), expr("r div deg").as("c"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("s"))
      ranks = ids
        .join(inMass, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(150000L) + expr("85 * coalesce(s, 0L) div 100")).as("r"))
        .localCheckpoint()
    }
    edges.unpersist()
    ranks.select(col("doc_id"), col("r").as("rank_micros")).orderBy("doc_id")
  }

  /** Q99c — host-level centrality: page ranks rolled up to the q92
    * host fixture (`site(id mod 5).example`) — the domain-quality
    * prior a curation mixture consumes; bounded key space, map-side
    * combine.
    */
  def hostRank(docs: DataFrame, rounds: Int): DataFrame =
    pageRank(docs, rounds)
      .withColumn("host",
        concat(lit("site"), (col("doc_id") % 5).cast("string"), lit(".example")))
      .groupBy("host")
      .agg(
        count(lit(1)).as("n_pages"),
        sum("rank_micros").as("rank_micros_sum"))
      .orderBy("host")

  /** Q134 — triangle counting with degree orientation (the third
    * graph-topology statistic next to degree stats and PageRank: the
    * clustering coefficient separates hub-and-spoke link farms from
    * genuinely interlinked communities — a crawl-quality prior).
    *
    * The naive wedge join (adjacency ⋈ adjacency on the center) blows
    * up on hubs: a degree-d node contributes d² wedges. The standard
    * scalable fix (Cohen's MapReduce triangle algorithm / Latapy's
    * compact-forward) ORIENTS each undirected edge from its lower-
    * (degree, id) endpoint to its higher one — an acyclic tournament
    * in which every triangle has exactly ONE node with out-edges to
    * the other two, and out-degrees are O(√m), so the wedge join is
    * sum-of-out-degree² = O(m^1.5) worst case instead of d_max².
    *
    * Shape: dedup to canonical undirected edges (one distinct), one
    * degree agg, the orientation projection, one self-equi-join on the
    * wedge apex, and one equi-join probing the closing edge by its
    * unordered (lo, hi) key — every shuffle is on plain BIGINT keys.
    * Output is one row of exact integers: edge/wedge/triangle counts
    * and the global clustering coefficient 3T/wedges on the ppm grid.
    */
  def triangles(docs: DataFrame): DataFrame = {
    val und = linkGraph(docs)
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val deg = und.select(col("u").as("id"))
      .unionAll(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val oriented = und
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          col("u")).otherwise(col("v")).as("a"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          col("v")).otherwise(col("u")).as("b"))
    // Each unordered out-pair of the apex once (id order on the spokes);
    // the closing edge is probed by its unordered key, since its own
    // orientation direction is unknown at the wedge.
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.a") === col("e2.a") && col("e1.b") < col("e2.b"))
      .select(
        least(col("e1.b"), col("e2.b")).as("lo"),
        greatest(col("e1.b"), col("e2.b")).as("hi"))
    val closing = oriented.select(
      least(col("a"), col("b")).as("lo"),
      greatest(col("a"), col("b")).as("hi"))
    val tri = wedges.join(closing, Seq("lo", "hi"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val totals = deg.agg(
      count(lit(1)).as("n_nodes"),
      expr("sum(deg) div 2").as("n_edges"),
      sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    // Zero-wedge graphs (e.g. a perfect matching) must yield 0, not a
    // null (non-ANSI int div) / error (ANSI, and DuckDB's `// 0`).
    totals.crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0,
          expr("3 * n_triangles * 1000000L div n_wedges"))
          .otherwise(lit(0L)).as("clustering_ppm"))
  }
}
