package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{SkippingStore => S, Tables}

/** The data-skipping contracts of the z-ordered layout (q113 family):
  * pruning is real (files skipped on EVERY indexed dimension), sound
  * (an excluded file provably holds no matching row), and pure I/O
  * (answers equal the plain scan — pinned by the q113 oracles; here we
  * pin the file counts the oracles cannot see).
  */
class SkippingStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  override def afterAll(): Unit = spark.stop()

  private val nFiles = 16
  private lazy val ev = Tables.events(spark, "/root/testdata/sf0.001")
    .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))

  private lazy val zDir = {
    val d = Files.createTempDirectory("graft_skip_z").toString
    S.write(ev, d, Seq("user_id", "ts_us"), nFiles)
    d
  }
  /** The single-dimension strawman: perfectly sorted by user_id alone,
    * with ts_us stats still recorded (stats exist for every column —
    * the LAYOUT is what decides their skipping power).
    */
  private lazy val linDir = {
    val d = Files.createTempDirectory("graft_skip_lin").toString
    S.write(ev, d, Seq("user_id"), nFiles, Seq("user_id", "ts_us"))
    d
  }

  private val tsLo = 1705708800000000L // 2024-01-20
  private val tsHi = 1705881600000000L // 2024-01-22

  test("a two-dimensional box prunes files AND answers exactly the plain filtered scan") {
    val bounds = Map("user_id" -> (3L, 7L), "ts_us" -> (tsLo, tsHi))
    val (kept, total) = S.pruneFiles(spark, zDir, bounds)
    assert(total == nFiles)
    assert(kept.nonEmpty && kept.size < total,
      s"the box must skip files (${kept.size}/$total kept)")
    val got = S.readBox(spark, zDir, bounds)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = ev.where(col("user_id").between(3, 7) &&
        col("ts_us").between(tsLo, tsHi))
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want, "skipping must never change an answer")
  }

  test("the interleave skips on the dimension a linear sort cannot: time-only slice, z-order vs user-sorted") {
    val bounds = Map("ts_us" -> (tsLo, tsHi))
    val (keptZ, totalZ) = S.pruneFiles(spark, zDir, bounds)
    val (keptLin, totalLin) = S.pruneFiles(spark, linDir, bounds)
    // Every user appears in the slice, so every user-sorted file
    // overlaps it — the linear layout can skip nothing at all. (File
    // totals differ slightly: 15 distinct users underfill the range
    // partitioner; fractions are the honest comparison.)
    assert(keptLin.size == totalLin,
      s"the strawman should be unable to skip (kept ${keptLin.size}/$totalLin)")
    assert(keptZ.size.toDouble / totalZ < keptLin.size.toDouble / totalLin,
      s"z-order must beat the linear layout on its blind dimension " +
        s"(${keptZ.size}/$totalZ vs ${keptLin.size}/$totalLin)")
    // And both answer identically.
    assert(S.readBox(spark, zDir, bounds).count() ==
      S.readBox(spark, linDir, bounds).count())
  }

  test("skipping is SOUND: every excluded file provably holds no matching row") {
    val bounds = Map("user_id" -> (3L, 7L), "ts_us" -> (tsLo, tsHi))
    val (kept, _) = S.pruneFiles(spark, zDir, bounds)
    val (all, _) = S.pruneFiles(spark, zDir,
      Map("user_id" -> (Long.MinValue, Long.MaxValue)))
    val excluded = all.toSet -- kept.toSet
    assert(excluded.nonEmpty)
    val leaked = spark.read.parquet(excluded.map(f => s"$zDir/$f").toSeq: _*)
      .where(col("user_id").between(3, 7) && col("ts_us").between(tsLo, tsHi))
      .count()
    assert(leaked == 0L, s"$leaked matching rows hid in excluded files")
  }

  test("a box outside the data's range reads zero files and zero rows, safely") {
    val bounds = Map("user_id" -> (100000L, 200000L))
    val (kept, _) = S.pruneFiles(spark, zDir, bounds)
    assert(kept.isEmpty)
    assert(S.readBox(spark, zDir, bounds).count() == 0L)
  }

  test("unindexed bound names are rejected, not silently unskipped") {
    val ex = intercept[IllegalArgumentException] {
      S.pruneFiles(spark, zDir, Map("value" -> (0L, 1L)))
    }
    assert(ex.getMessage.contains("not indexed"))
  }

  test("append stays sound but loosens pruning; OPTIMIZE restores it; vacuum reclaims only unreferenced generations") {
    val d = Files.createTempDirectory("graft_skip_life").toString
    val base = ev.where(col("event_id") % 4 =!= 0)
    val batch = ev.where(col("event_id") % 4 === 0)
    S.write(base, d, Seq("user_id", "ts_us"), nFiles)
    S.append(spark, d, batch, 4)
    val bounds = Map("user_id" -> (3L, 7L), "ts_us" -> (tsLo, tsHi))
    val want = ev.where(col("user_id").between(3, 7) &&
        col("ts_us").between(tsLo, tsHi))
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    def got() = S.readBox(spark, d, bounds)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got() == want, "an appended batch must be served, exactly")
    val (keptApp, totalApp) = S.pruneFiles(spark, d, bounds)
    S.optimize(spark, d, nFiles)
    assert(got() == want, "optimize must not change a single row")
    val (keptOpt, totalOpt) = S.pruneFiles(spark, d, bounds)
    assert(totalOpt < totalApp, "optimize folds the generations")
    assert(keptOpt.size.toDouble / totalOpt <= keptApp.size.toDouble / totalApp,
      s"optimize must not loosen pruning " +
        s"(${keptOpt.size}/$totalOpt vs ${keptApp.size}/$totalApp)")
    // Old generations linger for in-flight readers, then vacuum
    // reclaims exactly them.
    val subdirs = (dd: String) => new java.io.File(dd).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(subdirs(d).exists(_.startsWith("base-")) &&
      subdirs(d).exists(_.startsWith("batch-")))
    S.vacuum(spark, d)
    assert(subdirs(d).forall(_.startsWith("opt-")),
      s"vacuum must drop unreferenced generations, left ${subdirs(d)}")
    assert(got() == want, "the optimized generation serves after vacuum")
  }

  /** The Bloom tier (q116): a layout whose manifest also carries a
    * per-file Bloom bitset on event_id — the high-cardinality column
    * the (user, time) z-order scatters, so its per-file [min, max]
    * spans nearly everything and zone maps cannot prune equality.
    */
  private lazy val bloomDir = {
    val d = Files.createTempDirectory("graft_skip_bloom").toString
    S.write(ev, d, Seq("user_id", "ts_us"), nFiles, bloomCols = Seq("event_id"))
    d
  }
  private val probeIds = Seq(11L, 203L, 555L, 909L)

  test("bloom point probe prunes files zone maps cannot, and answers exactly the plain IN scan") {
    val (kept, total) = S.pruneFilesPoint(spark, bloomDir, "event_id", probeIds)
    assert(total == nFiles)
    assert(kept.nonEmpty && kept.size < total,
      s"the Bloom tier must skip files (${kept.size}/$total kept)")
    val want = ev.where(col("event_id").isin(probeIds: _*))
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val got = S.readPoint(spark, bloomDir, "event_id", probeIds)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want && want.size == probeIds.size)
  }

  test("bloom exclusion is SOUND: an excluded file holds no probe value") {
    val (kept, _) = S.pruneFilesPoint(spark, bloomDir, "event_id", probeIds)
    val all = S.pruneFiles(spark, bloomDir,
      Map("user_id" -> (Long.MinValue, Long.MaxValue)))._1
    val excluded = all.toSet -- kept.toSet
    assert(excluded.nonEmpty)
    val leaked = spark.read.parquet(excluded.map(f => s"$bloomDir/$f").toSeq: _*)
      .where(col("event_id").isin(probeIds: _*)).count()
    assert(leaked == 0L, s"$leaked probe rows hid in Bloom-excluded files")
  }

  test("a probe for absent values reads (almost) nothing and returns zero rows") {
    val ghosts = Seq(-5L, -77L, Long.MaxValue / 2)
    val (kept, total) = S.pruneFilesPoint(spark, bloomDir, "event_id", ghosts)
    // False positives are allowed but must be rare at ~10 bits/key.
    assert(kept.size <= total / 4, s"${kept.size}/$total kept for absent values")
    assert(S.readPoint(spark, bloomDir, "event_id", ghosts).count() == 0L)
  }

  test("appends carry Bloom bitsets: an appended row is probe-visible, via its batch file") {
    val d = Files.createTempDirectory("graft_skip_bloom_app").toString
    S.write(ev.where(col("event_id") =!= 500L), d, Seq("user_id", "ts_us"),
      nFiles, bloomCols = Seq("event_id"))
    assert(S.readPoint(spark, d, "event_id", Seq(500L)).count() == 0L)
    S.append(spark, d, ev.where(col("event_id") === 500L), 1)
    val (kept, _) = S.pruneFilesPoint(spark, d, "event_id", Seq(500L))
    assert(kept.exists(_.startsWith("batch-")),
      s"the appended batch's bloom must admit its own row, kept: $kept")
    assert(S.readPoint(spark, d, "event_id", Seq(500L)).count() == 1L)
  }

  test("a probe on a column without a Bloom filter is rejected, not silently unskipped") {
    val ex = intercept[IllegalArgumentException] {
      S.pruneFilesPoint(spark, bloomDir, "value", Seq(1L))
    }
    assert(ex.getMessage.contains("no Bloom filter"))
    val ex2 = intercept[IllegalArgumentException] {
      S.pruneFilesPoint(spark, zDir, "event_id", Seq(1L))
    }
    assert(ex2.getMessage.contains("no Bloom filter"))
  }

  test("a crashed append (data files on disk, no manifest swap) is invisible") {
    val d = Files.createTempDirectory("graft_skip_crash").toString
    S.write(ev, d, Seq("user_id", "ts_us"), nFiles)
    val before = S.readAll(spark, d).count()
    ev.limit(50).write.parquet(s"$d/batch-deadbeef")
    assert(S.readAll(spark, d).count() == before,
      "reads resolve the manifest's file list — unreferenced files must not leak in")
  }
}
