package graft
import org.apache.spark.sql.SparkSession
import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

/** Benchmark main: times every SparkEntry query at the SF the driver
  * points at. One JSON line on stdout; per-query failures are reported
  * as `"error"` markers (never fake timings) and flip the exit code.
  * A warm-up pass runs first so JVM/JIT/codegen warm-up is not billed
  * to whichever query happens to run first.
  *
  * Self-diagnosing: alongside wall time, every query records the JVM's
  * process-CPU-time delta and GC-time delta. On an idle box a Spark
  * query's wall time is bounded by its CPU work (cpu_s / cores <=
  * wall_s <= cpu_s for parallel plans); when something else heavy runs
  * on the machine the process is descheduled and wall grows while cpu
  * does not. A query whose wall exceeds SuspectRatio x its cpu (and is
  * not trivially short) is flagged `suspect` and re-run once — so a
  * contaminated run is distinguishable from a real regression in the
  * artifact itself, without access to the box. (Motivated by a round-4
  * bench where a concurrent workload inflated a 1.7 s projection to
  * 286 s wall.)
  */
object Bench {
  /** Wall > SuspectRatio x process-CPU => the JVM spent most of the
    * interval off-CPU. Local parquet reads are page-cache-backed, so
    * big involuntary wait == external contention, not I/O. */
  private val SuspectRatio = 3.0
  /** Don't flag sub-second queries: fixed overheads (driver-side plan
    * work is single-threaded but brief) dominate there. */
  private val SuspectMinWallSec = 1.0

  private val osBean = ManagementFactory.getOperatingSystemMXBean
  private def processCpuNanos(): Long = osBean match {
    case sun: com.sun.management.OperatingSystemMXBean => sun.getProcessCpuTime
    case _                                             => -1L
  }
  private def gcMillis(): Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(0L, b.getCollectionTime)).sum

  /** One timed run of a query: (wall_s, cpu_s, gc_s, error). */
  private def timeOnce(spark: SparkSession, name: String,
                       fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                       sfDir: String): (Double, Double, Double, Option[Throwable]) = {
    val cpu0 = processCpuNanos(); val gc0 = gcMillis(); val t0 = System.nanoTime()
    // toRdd executes the query's OWN physical plan. A `count()` on top
    // would let Catalyst prune every column the count doesn't need —
    // timing a scan instead of the query (projection-heavy queries
    // like the minhash signatures collapse to nothing under count).
    val err =
      try { fn(spark, sfDir).queryExecution.toRdd.count(); None }
      catch { case e: Throwable => Some(e) }
    val wall = (System.nanoTime() - t0) / 1e9
    val cpu = if (cpu0 < 0) -1.0 else (processCpuNanos() - cpu0) / 1e9
    val gc = (gcMillis() - gc0) / 1e3
    (wall, cpu, gc, err)
  }

  private def isSuspect(wall: Double, cpu: Double): Boolean =
    cpu >= 0 && wall > SuspectMinWallSec && wall > SuspectRatio * cpu

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
                   // One-time partitioned-layout ingests happen here so
                   // the timed q01b / q64 / q94 measure the pruned scan,
                   // not the write (writePartitioned / writeOnce /
                   // buildOnce memoize). The ANN store is NOT warmed:
                   // q89_index_build is the explicit timed build, and
                   // q89b-d after it (name order) measure serving.
                   "q01b_delta_pruned" -> sfDir,
                   "q64_doc_lookup" -> sfDir,
                   "q94_stored_bm25" -> sfDir,
                   // The q98 deleted/compacted stores: their build is
                   // the same training pipeline q89_index_build times
                   // explicitly; the timed q98/q98b should measure
                   // tombstone-view / compacted serving, not re-bill
                   // the build.
                   "q98_deleted_search" -> sfDir,
                   "q98b_compacted_search" -> sfDir,
                   "q101_deleted_bm25" -> sfDir,
                   "q101b_compacted_bm25" -> sfDir,
                   "q96_appended_bm25" -> sfDir,
                   "q102_stored_lm" -> sfDir,
                   "q104_appended_lm" -> sfDir,
                   "q104b_deleted_lm" -> sfDir,
                   "q104c_compacted_lm" -> sfDir,
                   // The versioned store's lifecycle (build/append/
                   // delete/compact commits) happens here so the timed
                   // q107 queries measure manifest-resolved serving and
                   // time travel, not maintenance; likewise the
                   // reindexed store for q108b.
                   "q107_version_history" -> sfDir,
                   "q108b_reindexed_search" -> sfDir,
                   "q109c_postings_history" -> sfDir,
                   // The upserted lifecycles (text + ANN) and the three
                   // z-order layouts: built here so the timed q111/q113/
                   // q114/q115/q117 queries measure serving/pruned reads,
                   // not store maintenance.
                   "q111c_upsert_history" -> sfDir,
                   "q111d_upserted_ann_search" -> sfDir,
                   "q113_zorder_box" -> sfDir,
                   "q114_layout_append" -> sfDir,
                   "q114b_layout_optimized" -> sfDir))
      try SparkEntry.queries(wq._1)(spark, wq._2).count()
      catch { case e: Throwable => System.err.println(s"[bench] warmup ${wq._1} failed: $e") }
    // Fixed-work CPU calibration: a constant amount of pure computation
    // (2^32 xxhash64 rows through a sum, no I/O, SF-independent), timed
    // like a query. Cross-round wall comparisons divide by this row to
    // cancel host contention — the r6→r7 artifacts showed a uniform
    // ~1.35× wall drift across UNCHANGED queries (proportionally scaled
    // cpu), which a fixed-work reference run in the same JVM makes
    // quantifiable inside the artifact itself. Suspect-retried like any
    // query so one descheduled run can't poison the normalizer.
    val (calibWall, calibCpu) = {
      import org.apache.spark.sql.functions.{col, sum, xxhash64}
      // % keeps the running sum within 2^53 of zero — ANSI mode makes a
      // raw sum(xxhash64) a guaranteed long-overflow error at 2^32 rows.
      val fn = (s: SparkSession, _: String) =>
        s.range(1L << 32).select(sum(xxhash64(col("id")) % 1000000L).as("h"))
      val (w1, c1, _, e1) = timeOnce(spark, "calibration", fn, sfDir)
      e1.foreach(e => System.err.println(s"[bench] calibration failed: $e"))
      if (e1.isDefined) (-1.0, -1.0) // never report a failure's timing
      else if (isSuspect(w1, c1)) {
        val (w2, c2, _, e2) = timeOnce(spark, "calibration", fn, sfDir)
        if (e2.isEmpty && w2 < w1) (w2, c2) else (w1, c1)
      } else (w1, c1)
    }
    // Optional comma-separated name filter for single-query iteration.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    case class R(name: String, wall: Double, cpu: Double, gc: Double,
                 retried: Boolean, suspect: Boolean, err: Option[Throwable])
    val results = selected.map { case (name, fn) =>
      val (w1, c1, g1, e1) = timeOnce(spark, name, fn, sfDir)
      e1.foreach(e => System.err.println(s"[bench] $name FAILED: $e"))
      if (e1.isEmpty && isSuspect(w1, c1)) {
        // Starved of CPU (wall >> cpu): measure once more; keep the
        // better run but mark the query so the artifact shows the
        // first attempt was contended.
        System.err.println(f"[bench] $name suspect (wall=$w1%.2fs cpu=$c1%.2fs) — re-running")
        val (w2, c2, g2, e2) = timeOnce(spark, name, fn, sfDir)
        if (e2.isEmpty && w2 < w1) R(name, w2, c2, g2, retried = true, isSuspect(w2, c2), None)
        else R(name, w1, c1, g1, retried = true, suspect = true, e1)
      } else R(name, w1, c1, g1, retried = false, isSuspect(w1, c1), e1)
    }
    def numMap(f: R => Double): String = results.map { r =>
      "\"" + r.name + "\":" + r.err.fold(f"${f(r)}%.3f")(_ => "\"error\"")
    }.mkString("{", ",", "}")
    val qs = numMap(_.wall)
    val total = results.collect { case r if r.err.isEmpty => r.wall }.sum
    val totalCpu = results.collect { case r if r.err.isEmpty && r.cpu >= 0 => r.cpu }.sum
    val totalGc = results.collect { case r if r.err.isEmpty => r.gc }.sum
    val suspects = results.filter(r => r.suspect && r.err.isEmpty).map("\"" + _.name + "\"").mkString("[", ",", "]")
    val retried = results.filter(_.retried).map("\"" + _.name + "\"").mkString("[", ",", "]")
    val nErr = results.count(_.err.isDefined)
    val errNames = results.filter(_.err.isDefined).map("\"" + _.name + "\"").mkString("[", ",", "]")
    // Field ORDER is survivability engineering: the driver retains only a
    // tail of stdout, so the headline totals + environment stamp go LAST
    // (after the wide per-query map) where a tail-truncation keeps them.
    // The complete artifact (incl. per-query cpu/gc) is also written to a
    // file in the repo so no capture window can lose it.
    val line = f"""{"metric":"total","unit":"sec","queries":$qs,"suspect":$suspects,"retried":$retried,"errors":$nErr,"error_names":$errNames,"calib_wall_s":$calibWall%.3f,"calib_cpu_s":$calibCpu%.3f,"total_cpu_s":$totalCpu%.3f,"total_gc_s":$totalGc%.3f,"cores":$cpus,"spark_version":"${spark.version}","sf":"$sfDir","value":$total%.3f}"""
    println(line)
    val full = f"""{"metric":"total","unit":"sec","queries":$qs,"cpu_s":${numMap(_.cpu)},"gc_s":${numMap(_.gc)},"suspect":$suspects,"retried":$retried,"errors":$nErr,"error_names":$errNames,"calib_wall_s":$calibWall%.3f,"calib_cpu_s":$calibCpu%.3f,"total_cpu_s":$totalCpu%.3f,"total_gc_s":$totalGc%.3f,"cores":$cpus,"spark_version":"${spark.version}","sf":"$sfDir","value":$total%.3f}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_LAST.json")), full + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write BENCH_LAST.json: $e") }
    spark.stop()
    if (nErr > 0) sys.exit(1)
  }
}
