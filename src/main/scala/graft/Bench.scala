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

  // --- JIT / code-cache telemetry (round-9 bimodality diagnosis) -----
  // The round-8 artifact of record measured 984 s vs 207 s for IDENTICAL
  // code: 81/226 queries inflated >2x with CPU growing WITH wall (so the
  // wall>>cpu suspect detector is blind) and GC flat. Prime suspect: the
  // 226 whole-stage-codegen queries generate thousands of Janino classes;
  // if the JIT code cache saturates (default ReservedCodeCacheSize is
  // 240 MB on JDK 17) HotSpot disables compilation and hot loops run
  // interpreted — exactly patchy, proportional CPU inflation with no GC
  // signal. So every query row now carries the JIT-compilation-time
  // delta and the absolute CodeHeap/Metaspace occupancy at its end, and
  // a fixed-work calibration row repeats every ~40 queries — the
  // artifact itself localizes any mid-run onset and names the mechanism.
  private val compBean = ManagementFactory.getCompilationMXBean
  private def jitMillis(): Long =
    if (compBean != null && compBean.isCompilationTimeMonitoringSupported)
      compBean.getTotalCompilationTime
    else -1L
  private def poolsMb(prefix: String): Double =
    ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith(prefix))
      .map(p => Option(p.getUsage).fold(0.0)(_.getUsed / 1048576.0)).sum
  /** Segmented code cache: "CodeHeap 'non-nmethods'" + profiled +
    * non-profiled. Falls back to the unsegmented "CodeCache" pool. */
  private def codeCacheUsedMb(): Double = {
    val seg = poolsMb("CodeHeap")
    if (seg > 0) seg else poolsMb("CodeCache")
  }
  private def codeCacheMaxMb(): Double =
    ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(p => p.getName.startsWith("CodeHeap") || p.getName.startsWith("CodeCache"))
      .map(p => Option(p.getUsage).fold(0.0)(_.getMax / 1048576.0)).sum
  private def metaspaceUsedMb(): Double = poolsMb("Metaspace")

  /** One timed run of a query: (wall_s, cpu_s, gc_s, jit_s, error). */
  private def timeOnce(spark: SparkSession, name: String,
                       fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                       sfDir: String): (Double, Double, Double, Double, Option[Throwable]) = {
    val cpu0 = processCpuNanos(); val gc0 = gcMillis(); val jit0 = jitMillis()
    val t0 = System.nanoTime()
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
    val jit = if (jit0 < 0) -1.0 else (jitMillis() - jit0) / 1e3
    (wall, cpu, gc, jit, err)
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
                   "q114b_layout_optimized" -> sfDir,
                   // The fact-store DML lifecycle (build/delete/upsert/
                   // compact commits) happens here so the timed q140
                   // queries measure manifest-resolved serving and time
                   // travel, not store maintenance. (q127's store build
                   // stays inside the timed query by design — the
                   // erasure audit bills its own takedown.)
                   "q140_fact_delete" -> sfDir,
                   "q140f_fact_evolution" -> sfDir))
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
    import org.apache.spark.sql.functions.{col, sum, xxhash64}
    // % keeps the running sum within 2^53 of zero — ANSI mode makes a
    // raw sum(xxhash64) a guaranteed long-overflow error at 2^32 rows.
    val calibFn = (s: SparkSession, _: String) =>
      s.range(1L << 32).select(sum(xxhash64(col("id")) % 1000000L).as("h"))
    def runCalib(): (Double, Double) = {
      val (w1, c1, _, _, e1) = timeOnce(spark, "calibration", calibFn, sfDir)
      e1.foreach(e => System.err.println(s"[bench] calibration failed: $e"))
      if (e1.isDefined) (-1.0, -1.0) // never report a failure's timing
      else if (isSuspect(w1, c1)) {
        val (w2, c2, _, _, e2) = timeOnce(spark, "calibration", calibFn, sfDir)
        if (e2.isEmpty && w2 < w1) (w2, c2) else (w1, c1)
      } else (w1, c1)
    }
    val (calibWall, calibCpu) = runCalib()
    // Optional comma-separated name filter for single-query iteration.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    case class R(name: String, wall: Double, cpu: Double, gc: Double,
                 jit: Double, ccMb: Double, msMb: Double,
                 retried: Boolean, suspect: Boolean, err: Option[Throwable])
    // Mid-run calibration rows: the same fixed-work query re-timed every
    // CalibEvery queries, so a mid-run slowdown onset (JIT starvation,
    // catalog/listener accretion, external contention) is localized IN
    // the artifact instead of inferred from a single start-of-run row.
    val CalibEvery = 40
    val calibSeries = scala.collection.mutable.ArrayBuffer[(Int, Double, Double)]()
    if (calibWall > 0) calibSeries += ((0, calibWall, calibCpu))
    val results = selected.zipWithIndex.map { case ((name, fn), i) =>
      if (i > 0 && i % CalibEvery == 0) {
        val (cw, cc) = runCalib()
        if (cw > 0) calibSeries += ((i, cw, cc))
        System.err.println(f"[bench] calib@$i wall=$cw%.3fs cpu=$cc%.3fs codecache=${codeCacheUsedMb()}%.0fMB jitTotal=${jitMillis() / 1e3}%.1fs")
      }
      val (w1, c1, g1, j1, e1) = timeOnce(spark, name, fn, sfDir)
      val cc = codeCacheUsedMb(); val ms = metaspaceUsedMb()
      e1.foreach(e => System.err.println(s"[bench] $name FAILED: $e"))
      if (e1.isEmpty && isSuspect(w1, c1)) {
        // Starved of CPU (wall >> cpu): measure once more; keep the
        // better run but mark the query so the artifact shows the
        // first attempt was contended.
        System.err.println(f"[bench] $name suspect (wall=$w1%.2fs cpu=$c1%.2fs) — re-running")
        val (w2, c2, g2, j2, e2) = timeOnce(spark, name, fn, sfDir)
        if (e2.isEmpty && w2 < w1) R(name, w2, c2, g2, j2, codeCacheUsedMb(), metaspaceUsedMb(), retried = true, isSuspect(w2, c2), None)
        else R(name, w1, c1, g1, j1, cc, ms, retried = true, suspect = true, e1)
      } else R(name, w1, c1, g1, j1, cc, ms, retried = false, isSuspect(w1, c1), e1)
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
    val totalJit = results.collect { case r if r.err.isEmpty && r.jit >= 0 => r.jit }.sum
    val calibJson = calibSeries.map { case (i, w, c) =>
      f"""{"after":$i,"wall_s":$w%.3f,"cpu_s":$c%.3f}""" }.mkString("[", ",", "]")
    val jvmDiag = f""""jit_total_s":$totalJit%.3f,"codecache_end_mb":${codeCacheUsedMb()}%.1f,"codecache_max_mb":${codeCacheMaxMb()}%.0f,"metaspace_end_mb":${metaspaceUsedMb()}%.1f,"calib_series":$calibJson"""
    val line = f"""{"metric":"total","unit":"sec","queries":$qs,"suspect":$suspects,"retried":$retried,"errors":$nErr,"error_names":$errNames,"calib_wall_s":$calibWall%.3f,"calib_cpu_s":$calibCpu%.3f,"total_cpu_s":$totalCpu%.3f,"total_gc_s":$totalGc%.3f,$jvmDiag,"cores":$cpus,"spark_version":"${spark.version}","sf":"$sfDir","value":$total%.3f}"""
    println(line)
    val full = f"""{"metric":"total","unit":"sec","queries":$qs,"cpu_s":${numMap(_.cpu)},"gc_s":${numMap(_.gc)},"jit_s":${numMap(_.jit)},"codecache_mb":${numMap(_.ccMb)},"suspect":$suspects,"retried":$retried,"errors":$nErr,"error_names":$errNames,"calib_wall_s":$calibWall%.3f,"calib_cpu_s":$calibCpu%.3f,"total_cpu_s":$totalCpu%.3f,"total_gc_s":$totalGc%.3f,$jvmDiag,"cores":$cpus,"spark_version":"${spark.version}","sf":"$sfDir","value":$total%.3f}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_LAST.json")), full + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write BENCH_LAST.json: $e") }
    spark.stop()
    if (nErr > 0) sys.exit(1)
  }
}
