package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** The ANN accuracy contract AT BENCH SCALE: RecallSpec pins recall
  * floors on the sf0.001 fixture corpus; this main re-pins the same
  * headline curves on the corpus the bench runs at (sf0.1 by default),
  * so "an optimization destroyed accuracy at scale" is CI-visible in a
  * checked-in artifact, not just on the tiny fixture. Same REGISTERED
  * configs as the queries (q18i trained IVF, q85b IVF-PQ re-rank,
  * q18h multi-table LSH), same ground truths (exhaustive cosine /
  * squared-L2 top-k).
  *
  * Prints one JSON line with every measured recall, writes the full
  * artifact to SPARK_GRAFT_RECALL_OUT (default RECALL_LAST.json), and
  * exits non-zero if any floor or structural property (monotone nProbe
  * / nTables / full-probe exactness) is violated — the bench-side twin
  * the round-7 verdict asked for.
  */
object RecallAtScale {

  // The registered query configs (SparkEntry): keep in lock-step.
  private val NumCentroids = 8
  private val KmeansIters = 3
  private val NQueries = 4
  private val K = 5
  private val PqSub = 4
  private val PqCodes = 8
  private val PqShortlist = 50
  private val IvfPqProbes = 2

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.table(spark, sfDir, "embeddings")

    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    // Exhaustive cosine top-k — ground truth for the IVF/LSH family.
    val exactCos = hits(Similarity.udafTopK(emb, NQueries).where(col("rnk") <= K))
    require(exactCos.size == NQueries * K, s"cosine ground truth short: ${exactCos.size}")

    // Exhaustive squared-L2 top-k — ground truth for the PQ family.
    val exactL2 = {
      val e = emb.withColumn("e", col("embedding").cast("array<double>"))
      val q = e.where(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("e").as("qe"))
      hits(e.where(col("vec_id") >= NQueries)
        .crossJoin(broadcast(q))
        .withColumn("dd", expr(
          """aggregate(sequence(0, 63), CAST(0.0 AS DOUBLE),
               (acc, i) -> acc + (e[i] - qe[i]) * (e[i] - qe[i]))"""))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("qid").orderBy(col("dd"), col("vec_id"))))
        .where(col("rnk") <= K))
    }
    require(exactL2.size == NQueries * K, s"L2 ground truth short: ${exactL2.size}")

    def recallCos(s: Set[(Long, Long)]): Double =
      (s intersect exactCos).size.toDouble / exactCos.size
    def recallL2(s: Set[(Long, Long)]): Double =
      (s intersect exactL2).size.toDouble / exactL2.size

    // q18i: trained-IVF nProbe curve at the registered config.
    val ivfCurve = Seq(1, 2, 4, NumCentroids).map { np =>
      np -> recallCos(hits(Similarity.ivfSearchTrainedProbes(
        emb, NumCentroids, KmeansIters, NQueries, K, np)))
    }
    // q18h: multi-table LSH curve.
    val lshCurve = Seq(1, 4, 8).map { nt =>
      nt -> recallCos(hits(Similarity.multiTableLshSearch(emb, NQueries, K, nt)))
    }
    // q85b: IVF-PQ + exact re-rank at the registered config.
    val ivfPq = recallL2(hits(Similarity.ivfPqRerankSearch(emb, NumCentroids,
      PqSub, PqCodes, KmeansIters, NQueries, PqShortlist, K, IvfPqProbes)))

    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    def check(ok: Boolean, msg: String): Unit = if (!ok) violations += msg

    // Floors: sf0.1 measured values (in comments) minus regeneration
    // headroom — the same discipline as RecallSpec's fixture floors.
    check(ivfCurve.head._2 >= 0.55,
      s"trained IVF nProbe=1 recall ${ivfCurve.head._2} < 0.55 (measured 1.0 at sf0.1)")
    ivfCurve.sliding(2).foreach { case Seq((n1, r1), (n2, r2)) =>
      check(r2 >= r1, s"IVF recall dropped widening nProbe $n1->$n2: $r1 -> $r2")
    }
    check(ivfCurve.last._2 == 1.0,
      s"full probe (nProbe=$NumCentroids) must be exhaustive; recall ${ivfCurve.last._2}")
    lshCurve.sliding(2).foreach { case Seq((n1, r1), (n2, r2)) =>
      check(r2 >= r1, s"LSH recall dropped widening tables $n1->$n2: $r1 -> $r2")
    }
    check(lshCurve.last._2 >= 0.2,
      s"8-table LSH recall ${lshCurve.last._2} < 0.2 (measured 0.35 at sf0.1 — " +
        "one 6-plane table measures 0.0 there: honest small-table cost, the " +
        "multi-table dial is the recovery path)")
    check(ivfPq >= 0.6, s"IVF-PQ re-rank recall $ivfPq < 0.6 (measured 0.8 at sf0.1)")

    val json =
      s"""{"sf":"$sfDir","k":$K,"n_queries":$NQueries,""" +
        s""""ivf_trained_nprobe":{${ivfCurve.map { case (n, r) => s""""$n":$r""" }.mkString(",")}},""" +
        s""""lsh_ntables":{${lshCurve.map { case (n, r) => s""""$n":$r""" }.mkString(",")}},""" +
        s""""ivfpq_rerank":$ivfPq,""" +
        s""""violations":[${violations.map(v => "\"" + v.replace("\"", "'") + "\"").mkString(",")}]}"""
    println(json)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_RECALL_OUT", "/root/repo/RECALL_LAST.json")),
      json + "\n")
    catch { case e: Throwable => System.err.println(s"[recall] could not write artifact: $e") }
    spark.stop()
    if (violations.nonEmpty) {
      violations.foreach(v => System.err.println(s"[recall] VIOLATION: $v"))
      sys.exit(1)
    }
  }
}
