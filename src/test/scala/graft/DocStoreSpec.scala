package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Snapshot
import graft.sources.{DocStore, Tables}

/** Operational contract of the id-partitioned doc store: a diff-driven
  * refresh converges the store to the new snapshot while rewriting ONLY
  * the touched buckets (untouched files byte-identical), is idempotent,
  * and clears fully-emptied buckets.
  */
class DocStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val Span = 50L

  private def files(dir: String): Map[String, (Long, Long)] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).toSeq.filter(_.isDirectory).flatMap { d =>
      fs.listStatus(d.getPath).toSeq.filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(f => f.getPath.toString -> (f.getModificationTime, f.getLen))
    }.toMap
  }

  private def contents(df: DataFrame): Seq[Seq[Any]] =
    df.select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)

  test("applyDiff converges the store to the new snapshot, rewriting only touched buckets") {
    // Id-local churn — the store's design assumption: a crawl refresh
    // revises a contiguous id range (bucket 2), drops a tail range
    // (bucket 9's 480+), and appends new ids (bucket 10). Buckets
    // 0-1 and 3-8 must come through byte-identical.
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val oldV = docs
    val newV = docs
      .filter(col("doc_id") < 480)
      .withColumn("text",
        when(col("doc_id").between(100, 149), concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
      .unionByName(docs.filter(col("doc_id") < 20)
        .withColumn("doc_id", col("doc_id") + 500))
    val dir = Files.createTempDirectory("docstore").toString

    DocStore.write(oldV, dir, Span)
    val before = files(dir)

    val touched = DocStore.applyDiff(spark, dir, newV, Span)

    // The store now IS the new snapshot.
    assert(contents(DocStore.read(spark, dir)) == contents(newV))

    // Touched = exactly the buckets owning a non-unchanged doc.
    val want = Snapshot.diff(oldV, newV).filter(col("status") =!= "unchanged")
      .select((col("doc_id") / Span).cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(touched == want)
    assert(touched.nonEmpty && touched.size < before.keySet.map(_.split("d_bucket=")(1).split("/")(0)).size,
      "fixture should touch some but not all buckets")

    // Untouched buckets: files byte-identical (same paths, mtimes, sizes).
    val after = files(dir)
    val untouchedBefore = before.filterNot { case (p, _) => touched.exists(b => p.contains(s"d_bucket=$b/")) }
    val untouchedAfter = after.filterNot { case (p, _) => touched.exists(b => p.contains(s"d_bucket=$b/")) }
    assert(untouchedBefore == untouchedAfter, "untouched buckets were rewritten")

    // Idempotence: a second apply finds nothing to do and moves no file.
    assert(DocStore.applyDiff(spark, dir, newV, Span).isEmpty)
    assert(files(dir) == after)
  }

  test("applyDiff fails fast when the diff touches more buckets than the cap") {
    // Non-id-local churn: every doc revised → every bucket touched.
    // With the cap below the bucket count the driver-side collect must
    // refuse (crisp error, no unbounded collect) and leave the store
    // untouched.
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val dir = Files.createTempDirectory("docstore-cap").toString
    DocStore.write(docs, dir, Span)
    val before = files(dir)
    val revised = docs.withColumn("text", concat(col("text"), lit(" v2")))
    val e = intercept[IllegalArgumentException] {
      DocStore.applyDiff(spark, dir, revised, Span, maxTouchedBuckets = 3L)
    }
    assert(e.getMessage.contains("churn is not id-local"))
    assert(files(dir) == before, "a refused diff must not modify the store")
    // The same diff under the default cap succeeds (sanity).
    assert(DocStore.applyDiff(spark, dir, revised, Span).nonEmpty)
  }

  test("id-range lookup prunes partitions at listing time and returns the exact range") {
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val dir = Files.createTempDirectory("docstore_lk").toString
    DocStore.write(docs, dir, Span)

    val lk = DocStore.lookup(spark, dir, 120L, 180L, Span)
    assert(lk.collect().map(_.getLong(0)).toSeq == (120L to 180L))

    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case q: QueryStageExec => scansOf(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scansOf)
    }
    val scan = scansOf(lk.queryExecution.executedPlan).head
    val pf = scan.metadata("PartitionFilters")
    assert(pf.contains("d_bucket"), s"no partition filter: $pf")
    // 500 docs / span 50 = 10 buckets, one file each (repartitioned by
    // bucket at write); ids 120-180 live in buckets 2-3, so the
    // executed scan must have opened exactly 2 of the 10 files.
    assert(scan.metrics("numFiles").value == 2,
      s"pruning read ${scan.metrics("numFiles").value} files")
  }

  test("a bucket whose docs are all removed is cleared from the store") {
    import spark.implicits._
    val oldV = Seq(
      (0L, "a", "en", "s0", 1L), (1L, "b", "en", "s0", 1L), // bucket 0
      (50L, "c", "en", "s0", 1L), (51L, "d", "en", "s0", 1L) // bucket 1
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val newV = oldV.filter(col("doc_id") < 50) // bucket 1 vanishes
    val dir = Files.createTempDirectory("docstore_rm").toString

    DocStore.write(oldV, dir, Span)
    val touched = DocStore.applyDiff(spark, dir, newV, Span)
    assert(touched == Seq(1L))
    assert(contents(DocStore.read(spark, dir)) == contents(newV))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(dir, "d_bucket=1")))
  }
}
