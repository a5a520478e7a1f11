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
    // Warm-up: one representative scan+shuffle query, untimed.
    try SparkEntry.queries("q06_pricing_summary")(spark, sfDir).count()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }
    // Optional comma-separated name filter for single-query iteration.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
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
