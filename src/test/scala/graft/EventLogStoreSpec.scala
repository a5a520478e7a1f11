package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EventLog
import graft.sources.{EventLogStore, Tables}

/** The time-partitioned event-log layout: results must be identical to
  * the flat scan, and the bucket-range predicate must actually prune —
  * i.e. land in the scan's PartitionFilters and shrink the matched
  * partition list. This is the O(delta)-not-O(log) property the 100 TB
  * framing depends on (SURVEY.md §4 row 1).
  */
class EventLogStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private val bucketUs = 86400000000L // 1 day
  private val lo = 1704844800000000L  // 2024-01-10
  private val hi = 1705708800000000L  // 2024-01-20

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

  private lazy val out = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_evstore_spec"
    EventLogStore.writePartitioned(Tables.events(spark, sf), dir, bucketUs)
    dir
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("partitioned delta scan returns exactly the flat delta scan's rows") {
    val flat = EventLog.deltaEvents(Tables.events(spark, sf), lo, hi)
    val pruned = EventLogStore.deltaEvents(spark, out, lo, hi, bucketUs)
    assert(pruned.exceptAll(flat).isEmpty && flat.exceptAll(pruned).isEmpty)
    assert(pruned.count() > 0)
  }

  test("bucket range lands in PartitionFilters and prunes the file listing") {
    val df = EventLogStore.deltaEvents(spark, out, lo, hi, bucketUs)
    val scan = df.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec leaf in the plan"))
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "t_bucket")),
      s"t_bucket not in PartitionFilters: ${scan.partitionFilters}")
    val matched = scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters).length
    val total = scan.relation.location.listFiles(Nil, Nil).length
    assert(total >= 25, s"expected ~30 daily buckets, got $total")
    assert(matched <= 11, s"expected ~10 matched buckets, got $matched of $total")
  }

  test("the row-range predicate still reaches the scan as a data filter") {
    val df = EventLogStore.deltaEvents(spark, out, lo, hi, bucketUs)
    val scan = df.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }.get
    assert(scan.dataFilters.exists(_.references.exists(_.name == "ts_us")),
      s"ts_us range not in dataFilters: ${scan.dataFilters}")
  }

  /** A query that states only the ts_us range — no bucket math. */
  private def bareRangeScan() =
    spark.read.parquet(out)
      .filter(col("ts_us") > lo && col("ts_us") <= hi)

  private def partitionFiltersOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }.get
      .partitionFilters

  test("BucketRangeInference derives t_bucket pruning from a bare ts_us range") {
    spark.conf.set(graft.plans.BucketRangeInference.BucketConf, bucketUs.toString)
    try {
      val df = bareRangeScan()
      assert(partitionFiltersOf(df).exists(_.references.exists(_.name == "t_bucket")),
        "inference rule did not add a t_bucket partition filter")
      // Same rows as the explicit formulation (on the shared row columns
      // — the bare scan also carries the partition column).
      val explicit = EventLogStore.deltaEvents(spark, out, lo, hi, bucketUs)
      val bare = df.select(explicit.columns.map(col): _*)
      assert(bare.exceptAll(explicit).isEmpty && explicit.exceptAll(bare).isEmpty)
    } finally spark.conf.unset(graft.plans.BucketRangeInference.BucketConf)
  }

  test("BucketRangeInference is inert without the layout conf") {
    val df = bareRangeScan()
    assert(!partitionFiltersOf(df).exists(_.references.exists(_.name == "t_bucket")))
  }

  test("compaction bounds bucket file counts after repeated appends, preserving contents") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val ev = Tables.events(spark, sf)
    val maxFiles = 4
    // Six micro-ingests (disjoint event slices): each lands one new file
    // per touched bucket — the small-file accumulation a live log suffers.
    (0 until 6).foreach { k =>
      EventLogStore.appendBatch(ev.where(col("event_id") % 6 === k), dir, bucketUs)
    }
    val before = EventLogStore.bucketFileCounts(spark, dir)
    assert(before.values.max > maxFiles,
      s"fixture should accumulate small files, got ${before.values.max} max")
    val pre = spark.read.parquet(dir).orderBy("event_id").collect().toSeq

    val rewritten = EventLogStore.compact(spark, dir, bucketUs, maxFiles)
    assert(rewritten.nonEmpty)
    val after = EventLogStore.bucketFileCounts(spark, dir)
    assert(after.keySet == before.keySet, "compaction must not add or drop buckets")
    assert(after.values.max <= maxFiles,
      s"file counts not bounded after compaction: $after")
    val post = spark.read.parquet(dir).orderBy("event_id").collect().toSeq
    assert(post == pre, "compaction changed the data")

    // Healthy store is a fixed point: nothing left to rewrite.
    assert(EventLogStore.compact(spark, dir, bucketUs, maxFiles).isEmpty)

    // The delta-scan contract (rows + pruning) survives compaction.
    val flat = EventLog.deltaEvents(Tables.events(spark, sf), lo, hi)
    val pruned = EventLogStore.deltaEvents(spark, dir, lo, hi, bucketUs)
    assert(pruned.exceptAll(flat).isEmpty && flat.exceptAll(pruned).isEmpty)
  }

  test("schema evolution: mergeSchema unions old and new file schemas with null backfill") {
    // A long-lived log gains columns over time; old files must stay
    // readable with nulls in the new positions — the append-only lake
    // contract (no rewrite of history).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "click"), (2L, "view")).toDF("event_id", "event_type")
      .write.parquet(s"$dir/part=old")
    Seq((3L, "click", 0.5)).toDF("event_id", "event_type", "score")
      .write.parquet(s"$dir/part=new")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("event_id", "event_type", "score", "part"))
    assert(merged.count() == 3)
    assert(merged.where(col("score").isNull).count() == 2)
    // Old readers (explicit schema) still read new files: extra column pruned.
    val oldView = spark.read
      .schema("event_id BIGINT, event_type STRING").parquet(s"$dir/part=new")
    assert(oldView.collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
