package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Tables, TextIndexStore, VersionedTextIndex => V}

/** Transactional contract of the manifest-versioned lexical index
  * (q109 family): the BM25 stats row commits in the SAME manifest as
  * the postings change it describes — the postings-ahead-of-stats crash
  * window TextIndexStore.append documents is gone — plus time travel,
  * delete idempotence, and compaction that carries the stats segment
  * forward by reference.
  */
class VersionedTextIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private val nBuckets = 8
  private val terms = Seq("spark", "join", "window")
  private lazy val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
  private def base = docs.filter(col("doc_id") < 400)
  private def rest = docs.filter(col("doc_id") >= 400)
  private def delIds = docs.select(col("doc_id")).filter(col("doc_id") % 9 === 4)

  private def freshLifecycle(): String = {
    val d = Files.createTempDirectory("graft_vtispec").toString
    V.build(base, d, nBuckets)
    V.append(spark, d, rest)
    V.delete(spark, d, delIds)
    V.compact(spark, d)
    d
  }

  private lazy val store = freshLifecycle()

  private def bm25Rows(dir: String, version: Long): Seq[(Long, Long, Long, Double)] =
    V.bm25(spark, dir, terms, 20, version)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq

  private def statsOf(dir: String, version: Long): (Long, Long) = {
    val r = V.stats(spark, dir, version).first()
    (r.getLong(0), r.getLong(1))
  }

  private def countsOf(d: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val r = d.withColumn("dl", size(split(col("text"), " ")).cast("long"))
      .agg(count(lit(1)), coalesce(sum("dl"), lit(0L))).first()
    (r.getLong(0), r.getLong(1))
  }

  test("every version's stats row matches exactly the corpus its postings describe") {
    assert(statsOf(store, 0L) == countsOf(base), "v0 stats = base corpus")
    assert(statsOf(store, 1L) == countsOf(docs), "v1 stats = full corpus")
    val live = docs.filter(col("doc_id") % 9 =!= 4)
    assert(statsOf(store, 2L) == countsOf(live), "v2 stats retreated to the live corpus")
    assert(statsOf(store, 3L) == countsOf(live), "v3 stats carried forward unchanged")
  }

  test("a torn writer (postings and stats files on disk, no manifest) is invisible — the pair moves atomically or not at all") {
    val d = freshLifecycle()
    val before = bm25Rows(d, V.Latest)
    val stBefore = statsOf(d, V.Latest)
    // Simulate TextIndexStore.append's crash window: both new data
    // files land, the commit does not.
    V.postings(spark, d).limit(3)
      .write.partitionBy("t_bucket").parquet(s"$d/seg-99999999-crashed")
    import spark.implicits._
    Seq((999999L, 999999L)).toDF("n_docs", "total_dl")
      .write.parquet(s"$d/seg-99999999-crashed-stats")
    assert(bm25Rows(d, V.Latest) == before && statsOf(d, V.Latest) == stBefore,
      "uncommitted postings AND stats must both stay invisible")
  }

  test("overlapping delete batches are idempotent: the replay commits nothing and moves no number") {
    val d = freshLifecycle()
    val vBefore = V.currentVersion(spark, d)
    val stBefore = statsOf(d, V.Latest)
    // Every id in the batch is already gone (compact folded them) —
    // nothing indexed matches, so delete must be a version no-op.
    val v = V.delete(spark, d, delIds)
    assert(v == vBefore, "a fully-replayed delete must not commit a version")
    assert(statsOf(d, V.Latest) == stBefore)
  }

  test("compaction carries the stats segment forward by reference and changes no answer") {
    val preCompact = V.snapshot(spark, store, 2L)
    val postCompact = V.snapshot(spark, store, 3L)
    val statDirs = (s: V.Snapshot) =>
      s.segments.filter(_.kind == "stats").map(_.dir)
    assert(statDirs(preCompact) == statDirs(postCompact),
      "compact must reference the delete's stats segment, not rewrite it")
    assert(bm25Rows(store, 2L) == bm25Rows(store, 3L),
      "compaction must not change a single score")
    assert(V.snapshot(spark, store, 3L).segments.count(_.kind == "postings") == 1,
      "compaction folds the postings to one segment")
    assert(V.tombstones(spark, store, 3L).count() == 0)
  }

  test("latest equals a from-scratch index over the live corpus; a pinned pre-delete reader is unaffected") {
    val live = docs.filter(col("doc_id") % 9 =!= 4)
    val d2 = Files.createTempDirectory("graft_vtispec_ref").toString
    TextIndexStore.build(live, d2, nBuckets)
    val fresh = graft.operators.TextAnalysis.bm25Stored(spark, d2, terms, 20, nBuckets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(bm25Rows(store, V.Latest) == fresh,
      "the versioned lifecycle must score exactly like a fresh live-corpus index")
    // And v1 (the full-corpus index) still serves its original ranking.
    val d3 = Files.createTempDirectory("graft_vtispec_full").toString
    TextIndexStore.build(docs, d3, nBuckets)
    val full = graft.operators.TextAnalysis.bm25Stored(spark, d3, terms, 20, nBuckets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(bm25Rows(store, 1L) == full,
      "time travel to the pre-delete version must serve the full-corpus ranking")
  }

  test("upsert replaces live docs and revives deleted ones in ONE commit; latest equals a from-scratch index over the patched corpus") {
    val d = freshLifecycle()
    val v3 = V.currentVersion(spark, d)
    val before = bm25Rows(d, V.Latest)
    val patch = docs.filter(col("doc_id") % 5 === 1)
      .withColumn("text", concat(col("text"), lit(" spark spark")))
    val v4 = V.upsert(spark, d, patch)
    assert(v4 == v3 + 1, "an upsert is exactly one commit — no " +
      "delete-then-append window in the lineage")
    // The patched live corpus: (not deleted) OR upserted — the upsert
    // revives the deleted docs it touches — with upserted text patched.
    val patched = docs
      .filter(col("doc_id") % 9 =!= 4 || col("doc_id") % 5 === 1)
      .withColumn("text", when(col("doc_id") % 5 === 1,
        concat(col("text"), lit(" spark spark"))).otherwise(col("text")))
    val d2 = Files.createTempDirectory("graft_vtispec_patch").toString
    TextIndexStore.build(patched, d2, nBuckets)
    val fresh = graft.operators.TextAnalysis.bm25Stored(spark, d2, terms, 20, nBuckets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(bm25Rows(d, V.Latest) == fresh,
      "post-upsert serving must score exactly like a fresh index over the patched corpus")
    assert(statsOf(d, V.Latest) == countsOf(patched),
      "stats must move by the exact net of the replaced docs' retreat and the batch's advance")
    assert(bm25Rows(d, v3) == before,
      "a reader pinned to the pre-upsert version is untouched")
    // Revival check, explicitly: every deleted doc in the upsert set is
    // live again — and no other deleted doc came back.
    val revivedLive = V.livePostings(spark, d)
      .filter(col("doc_id") % 9 === 4).select("doc_id").distinct().count()
    val expected = docs.filter(col("doc_id") % 9 === 4 && col("doc_id") % 5 === 1).count()
    assert(revivedLive == expected && expected > 0,
      s"exactly the upserted deleted docs must revive ($revivedLive vs $expected)")
  }

  test("successive upserts of one doc: last write wins, exactly one live generation, no compaction needed") {
    val d = freshLifecycle()
    import spark.implicits._
    val gen1 = Seq((7L, "alpha join beta")).toDF("doc_id", "text")
    val gen2 = Seq((7L, "spark window gamma spark")).toDF("doc_id", "text")
    V.upsert(spark, d, gen1)
    V.upsert(spark, d, gen2)
    val live = V.livePostings(spark, d).filter(col("doc_id") === 7L)
      .select("term", "tf", "dl").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(live == Set(("spark", 2L, 4L), ("window", 1L, 4L), ("gamma", 1L, 4L)),
      s"only the LAST generation may serve, got $live")
    // And the doc can still be deleted afterwards — the liveness-based
    // delete sees through its (revival-bearing) tombstone history.
    V.delete(spark, d, Seq(7L).toDF("doc_id"))
    assert(V.livePostings(spark, d).filter(col("doc_id") === 7L).isEmpty,
      "a delete after upserts must kill the final generation")
  }

  test("change feed: content-based diff matches the brute live-set diff; physical rewrites and no-op upserts emit NOTHING") {
    val d = freshLifecycle()
    def feed(a: Long, b: Long): Map[Long, String] =
      V.changes(spark, d, a, b).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    // v0 → v1 is the append: every appended doc is an insert, nothing else.
    val appended = rest.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(feed(0L, 1L) == appended.map(_ -> "insert").toMap)
    // v1 → v2 is the delete: exactly the takedown set.
    val dead = docs.filter(col("doc_id") % 9 === 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(feed(1L, 2L) == dead.map(_ -> "delete").toMap)
    // v2 → v3 is the COMPACTION: every row physically rewrote into a
    // new segment, no content changed — the feed must be empty (the
    // dataChange=false contract, derived from fingerprints rather than
    // trusted from a flag).
    assert(feed(2L, 3L).isEmpty,
      "physical maintenance must be invisible to the change feed")
    // An upsert that rewrites IDENTICAL text commits a version but
    // changes no content — a downstream incremental consumer sees
    // nothing to re-process.
    import spark.implicits._
    val sameDoc = docs.filter(col("doc_id") === 10L).select("doc_id", "text")
    val v = V.upsert(spark, d, sameDoc)
    assert(feed(v - 1, v).isEmpty,
      "a content-identical upsert must be a change-feed no-op")
    // And a REAL upsert reports exactly its doc, as an update.
    val v2 = V.upsert(spark, d, Seq((10L, "spark gamma")).toDF("doc_id", "text"))
    assert(feed(v2 - 1, v2) == Map(10L -> "update"))
  }

  test("df table rolls forward through the feed, touching only changed docs — equal to a from-scratch rebuild at every lifecycle step") {
    val d = freshLifecycle()
    def tbl(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Through the delete commit (real deltas).
    assert(tbl(V.dfRollForward(spark, d, V.dfTable(spark, d, 1L), 1L, 2L))
      == tbl(V.dfTable(spark, d, 2L)),
      "rolling through a delete must equal the rebuild")
    // Through the compaction (empty feed → identity, no work).
    assert(tbl(V.dfRollForward(spark, d, V.dfTable(spark, d, 2L), 2L, 3L))
      == tbl(V.dfTable(spark, d, 3L)),
      "a physical-only commit must roll to the identical table")
    // Through an upsert (inserts + updates at once).
    val patch = docs.filter(col("doc_id") % 5 === 1)
      .withColumn("text", concat(col("text"), lit(" spark spark")))
    V.upsert(spark, d, patch)
    assert(tbl(V.dfRollForward(spark, d, V.dfTable(spark, d, 3L), 3L, 4L))
      == tbl(V.dfTable(spark, d, 4L)),
      "rolling through an upsert must equal the rebuild")
  }
}
