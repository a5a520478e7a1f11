package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis
import graft.sources.{Tables, TextIndexStore}

/** Operational contract of the persisted inverted index (q94): stored
  * BM25 equals the full-scan q86 ranking row-for-row, the Scala bucket
  * hash equals the SQL one the build used (so the driver-pushed bucket
  * list is sound), and a query's postings scan prunes unqueried
  * buckets at FILE level.
  */
class TextIndexStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private val nBuckets = 16
  private lazy val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
  private lazy val dir = {
    val d = Files.createTempDirectory("graft_tixspec").toString
    TextIndexStore.build(docs, d, nBuckets)
    d
  }

  test("stored BM25 equals the full-scan ranking row-for-row") {
    val terms = Seq("spark", "join", "window")
    val fromStore = TextAnalysis.bm25Stored(spark, dir, terms, 20, nBuckets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val fullScan = TextAnalysis.bm25(docs, terms, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(fromStore == fullScan,
      "the persisted postings must reproduce the full-scan scores exactly")
  }

  test("stored sparse dot product equals the full-text weighted-tf ranking, exactly") {
    val weights = Seq(("spark", 5L), ("join", 3L), ("window", 1L))
    val fromStore = TextAnalysis.sparseDotStored(spark, dir, weights, 20, nBuckets)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // The naive definition straight off the text: per-doc tf per term,
    // weighted, summed — all integers, so equality is exact.
    val wCase = weights.map { case (t, w) => s"WHEN '$t' THEN ${w}L" }
      .mkString("CASE term ", " ", " ELSE 0L END")
    val naive = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term").isin(weights.map(_._1): _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .withColumn("c", expr(s"($wCase) * tf"))
      .groupBy("doc_id").agg(sum("c").as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(fromStore == naive,
      "the stored postings must reproduce the weighted-tf ranking exactly")
    // Duplicate terms and non-positive weights are contract violations.
    intercept[IllegalArgumentException] {
      TextAnalysis.sparseDotStored(spark, dir,
        Seq(("spark", 1L), ("spark", 2L)), 5, nBuckets)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.sparseDotStored(spark, dir, Seq(("spark", 0L)), 5, nBuckets)
    }
  }

  test("Scala bucketOf equals the SQL hash the build partitioned by, on the whole vocabulary") {
    import graft.functions.PortableHash.hash48
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("term")).distinct()
      .withColumn("b_sql", pmod(expr(hash48("term")), lit(nBuckets.toLong)))
      .collect()
    assert(vocab.nonEmpty)
    vocab.foreach { r =>
      assert(TextIndexStore.bucketOf(r.getString(0), nBuckets) == r.getLong(1),
        s"bucket drift for term '${r.getString(0)}'")
    }
  }

  test("a query's postings scan prunes unqueried buckets at FILE level") {
    def filesTouched(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    val p = TextIndexStore.postings(spark, dir)
    val all = filesTouched(p)
    val b = TextIndexStore.bucketOf("spark", nBuckets)
    val pruned = filesTouched(p.filter(col("t_bucket") === b))
    assert(pruned < all, s"bucket filter must prune files: $pruned vs $all")
    // And the term's postings really live there.
    assert(p.filter(col("t_bucket") === b && col("term") === "spark").count() > 0)
  }

  test("append admits new documents: existing postings untouched, stats exact, ranking ≡ from-scratch") {
    val d = Files.createTempDirectory("graft_tixspec_app").toString
    TextIndexStore.build(docs.filter(col("doc_id") < 400), d, nBuckets)
    val before = TextIndexStore.postings(spark, d)
      .orderBy("term", "doc_id").collect().toSeq
    TextIndexStore.append(spark, d, docs.filter(col("doc_id") >= 400), nBuckets)
    val after = TextIndexStore.postings(spark, d)
      .orderBy("term", "doc_id").collect().toSeq
    assert(after.filter(_.getLong(1) < 400) == before,
      "existing posting rows must be byte-stable under append")
    val st = TextIndexStore.stats(spark, d).first()
    assert(st.getLong(0) == docs.count(), "n_docs must advance by the batch count")
    val wantDl = docs.select(size(split(col("text"), " ")).cast("long"))
      .collect().map(_.getLong(0)).sum
    assert(st.getLong(1) == wantDl, "total_dl must advance by exact integers")
    val terms = Seq("spark", "join", "window")
    val appended = TextAnalysis.bm25Stored(spark, d, terms, 20, nBuckets)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val scratch = TextAnalysis.bm25Stored(spark, dir, terms, 20, nBuckets)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(appended == scratch,
      "an append-maintained index must score exactly like a from-scratch build")
  }

  test("tombstone delete: no posting file touched, stats retreat exactly, live ranking ≡ from-scratch on the live corpus") {
    val d = Files.createTempDirectory("graft_tixspec_del").toString
    TextIndexStore.build(docs, d, nBuckets)
    val terms = Seq("spark", "join", "window")
    def postingFiles(): Set[String] = TextIndexStore.postings(spark, d).inputFiles.toSet
    val filesBefore = postingFiles()
    val before = TextAnalysis.bm25Stored(spark, d, terms, 20, nBuckets).collect().toSeq

    val dead = docs.select(col("doc_id")).filter(col("doc_id") % 9 === 4)
    TextIndexStore.delete(spark, d, dead)
    // Overlapping re-delete must not double-retreat the stats.
    TextIndexStore.delete(spark, d, dead)
    assert(postingFiles() == filesBefore, "delete must not rewrite posting files")
    val live = TextAnalysis.bm25StoredLive(spark, d, terms, 20, nBuckets).collect().toSeq
    assert(live != before, "a 1/9 deletion must reshape the ranking on the fixture")
    assert(!live.exists(_.getLong(0) % 9 == 4), "no tombstoned doc may rank")
    // The live view scores EXACTLY like an index built on the live
    // corpus — df, n_docs, avgdl all followed the deletion.
    val fresh = Files.createTempDirectory("graft_tixspec_fresh").toString
    TextIndexStore.build(docs.filter(col("doc_id") % 9 =!= 4), fresh, nBuckets)
    assert(live == TextAnalysis.bm25Stored(spark, fresh, terms, 20, nBuckets).collect().toSeq,
      "tombstone serving must equal a from-scratch live-corpus index")
    val st = TextIndexStore.stats(spark, d).first()
    val want = docs.filter(col("doc_id") % 9 =!= 4)
      .agg(count(lit(1)), sum(size(split(col("text"), " ")).cast("long"))).first()
    assert(st.getLong(0) == want.getLong(0) && st.getLong(1) == want.getLong(1),
      "stats must retreat by the deleted docs' exact counts")

    // Bucket pruning SURVIVES the tombstone anti-join: the t_bucket
    // filter pushes below the join and lands on the parquet scan as a
    // PARTITION filter — the takedown path must not un-scale serving.
    val pruned = TextIndexStore.livePostings(spark, d)
      .filter(col("t_bucket") === TextIndexStore.bucketOf("spark", nBuckets))
    val storeScans = pruned.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(s"$d/postings")) => f
    }
    assert(storeScans.nonEmpty)
    assert(storeScans.forall(_.partitionFilters.exists(
        _.references.exists(_.name == "t_bucket"))),
      s"bucket filter must reach the scan's partition filters through the anti-join: " +
        storeScans.map(_.partitionFilters).mkString(";"))

    // Physical compaction: identical answers, tombstones gone, one
    // file per bucket.
    TextIndexStore.compact(spark, d)
    assert(TextAnalysis.bm25Stored(spark, d, terms, 20, nBuckets).collect().toSeq == live,
      "compaction must not change a single answer")
    assert(TextIndexStore.tombstones(spark, d).count() == 0)
    // Compaction is IDEMPOTENT: a redundant second pass reproduces the
    // same posting rows.
    val snap = TextIndexStore.postings(spark, d).orderBy("term", "doc_id").collect().toSeq
    TextIndexStore.compact(spark, d)
    assert(TextIndexStore.postings(spark, d).orderBy("term", "doc_id").collect().toSeq == snap,
      "double compaction must be a no-op on the rows")

    // REVIVAL: re-ingesting tombstoned docs must serve them again with
    // exactly ONE generation of postings — append folds deletions
    // physically first, so the full-corpus ranking comes back.
    val d2 = Files.createTempDirectory("graft_tixspec_rev").toString
    TextIndexStore.build(docs, d2, nBuckets)
    TextIndexStore.delete(spark, d2,
      docs.select(col("doc_id")).filter(col("doc_id") % 9 === 4))
    TextIndexStore.append(spark, d2, docs.filter(col("doc_id") % 9 === 4), nBuckets)
    assert(TextIndexStore.tombstones(spark, d2).count() == 0,
      "revival must clear the revived ids' tombstones")
    val revived = TextAnalysis.bm25StoredLive(spark, d2, terms, 20, nBuckets).collect().toSeq
    assert(revived == before, "delete-then-reingest must restore the full-corpus ranking")
    val stRev = TextIndexStore.stats(spark, d2).first()
    assert(stRev.getLong(0) == docs.count(), "stats must return to the full corpus")

    val perBucket = TextIndexStore.postings(spark, d)
      .select(col("t_bucket"), org.apache.spark.sql.functions.input_file_name().as("f"))
      .distinct().groupBy("t_bucket").count().collect()
    assert(perBucket.nonEmpty && perBucket.forall(_.getLong(1) == 1L),
      "compaction must leave one file per bucket")
  }

  test("stored BM25 never scans document text — postings and stats only") {
    val q = TextAnalysis.bm25Stored(spark, dir, Seq("spark", "join"), 20, nBuckets)
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scans = q.queryExecution.sparkPlan.collectLeaves().collect {
      case f: FileSourceScanExec =>
        (f.relation.location.rootPaths.mkString(","), f.requiredSchema.fieldNames.toSet)
    }
    assert(scans.nonEmpty)
    scans.foreach { case (path, cols) =>
      assert(!path.contains("documents"), s"query-time scan of the corpus: $path")
      assert(!cols.contains("text"), s"query-time scan reads text: $cols")
    }
    // And the duplicate-term weighting matches the full-scan fold.
    val dup = TextAnalysis.bm25Stored(spark, dir, Seq("spark", "spark"), 20, nBuckets)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val want = TextAnalysis.bm25(docs, Seq("spark", "spark"), 20)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(dup == want, "a term listed twice must contribute twice, as in the per-position fold")
  }

  test("a term absent from the corpus contributes nothing and breaks nothing") {
    val got = TextAnalysis.bm25Stored(spark, dir,
      Seq("spark", "zzzznotaword"), 10, nBuckets)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val want = TextAnalysis.bm25(docs, Seq("spark", "zzzznotaword"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == want)
  }

  private lazy val posDir = {
    TextIndexStore.buildPositional(docs, dir, nBuckets)
    dir
  }
  /** 0-based (doc_id, p, w) token stream straight off the text — the
    * independent recompute the positional tests compare against. */
  private lazy val toks = docs
    .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p", "w")))

  test("positional sidecar is an exact refinement of the frequency postings") {
    val joined = TextIndexStore.positions(spark, posDir)
      .join(TextIndexStore.postings(spark, dir), Seq("term", "doc_id"))
    assert(joined.where(size(col("positions")) =!= col("tf")).isEmpty,
      "size(positions) must equal tf for every posting row")
    assert(joined.count() == TextIndexStore.postings(spark, dir).count(),
      "every frequency posting must have a positional row")
    // Offsets sorted and within [0, dl) — dl from the frequency row.
    val rangeBad = joined.where(
      expr("positions != array_sort(positions)")
        || expr("array_min(positions) < 0")
        || expr("array_max(positions) >= dl"))
    assert(rangeBad.isEmpty, "offsets must be sorted and within [0, dl)")
  }

  test("stored phrase search equals a raw-text self-join recompute, exactly") {
    val phrase = Seq("data", "line")
    val got = TextAnalysis.phraseSearchStored(spark, posDir, phrase, 20, nBuckets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // Independent recompute: consecutive-offset SELF-JOIN on the raw
    // token stream (no arrays, no store).
    val a = toks.filter(col("w") === phrase(0)).select(col("doc_id"), col("p"))
    val b = toks.filter(col("w") === phrase(1)).select(col("doc_id"), col("p").as("p2"))
    val want = a.join(b, Seq("doc_id"))
      .where(col("p2") === col("p") + 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("phrase_tf"), min(col("p").cast("long")).as("first_pos"))
      .orderBy(col("phrase_tf").desc, col("doc_id")).limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(want.nonEmpty, "fixture phrase must occur in the corpus")
    assert(got == want, "stored phrase search must equal the raw-text recompute")
    intercept[IllegalArgumentException] {
      TextAnalysis.phraseSearchStored(spark, posDir, Seq("data"), 5, nBuckets)
    }
  }

  test("stored proximity search equals a raw-text pair-join recompute, exactly") {
    val (ta, tb, w) = ("spark", "query", 3)
    val got = TextAnalysis.proximitySearchStored(spark, posDir, ta, tb, w, 20, nBuckets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val pa = toks.filter(col("w") === ta).select(col("doc_id"), col("p").cast("long").as("p1"))
    val pb = toks.filter(col("w") === tb).select(col("doc_id"), col("p").cast("long").as("p2"))
    val pairs = pa.join(pb, Seq("doc_id")).withColumn("dist", abs(col("p2") - col("p1")))
    val md = pairs.groupBy("doc_id").agg(min("dist").as("min_dist"))
    val nn = pairs.where(col("dist") <= w)
      .select("doc_id", "p1").distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_near"))
    val want = md.where(col("min_dist") <= w).join(nn, Seq("doc_id"))
      .orderBy(col("min_dist"), col("n_near").desc, col("doc_id")).limit(20)
      .select("doc_id", "min_dist", "n_near")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(want.nonEmpty, "fixture pair must co-occur within the window")
    assert(got == want, "stored proximity search must equal the pair-join recompute")
    intercept[IllegalArgumentException] {
      TextAnalysis.proximitySearchStored(spark, posDir, "spark", "spark", w, 5, nBuckets)
    }
  }

  test("positional sidecar follows the store lifecycle: delete hides, compact folds, append admits") {
    val d = Files.createTempDirectory("graft_tixspec_poslc").toString
    val base = docs.filter(col("doc_id") < 400)
    TextIndexStore.build(base, d, nBuckets)
    TextIndexStore.buildPositional(base, d, nBuckets)
    val phrase = Seq("data", "line")
    val before = TextAnalysis.phraseSearchStored(spark, d, phrase, 200, nBuckets)
      .collect().map(_.getLong(0)).toSeq
    assert(before.nonEmpty)
    // Tombstone-delete: dead docs vanish from phrase results with no
    // positional file rewritten.
    val dead = docs.select(col("doc_id")).filter(col("doc_id") % 7 === 2)
    TextIndexStore.delete(spark, d, dead)
    val afterDel = TextAnalysis.phraseSearchStored(spark, d, phrase, 200, nBuckets)
      .collect().map(_.getLong(0)).toSeq
    assert(!afterDel.exists(_ % 7 == 2), "no tombstoned doc may match a phrase")
    assert(afterDel == before.filterNot(_ % 7 == 2),
      "survivors must be exactly the live prefix of the pre-delete result")
    // Physical compaction folds the sidecar too — the tombstones are
    // gone but the dead positions went WITH them.
    TextIndexStore.compact(spark, d)
    val afterCompact = TextAnalysis.phraseSearchStored(spark, d, phrase, 200, nBuckets)
      .collect().map(_.getLong(0)).toSeq
    assert(afterCompact == afterDel,
      "compaction must not change phrase answers (dead positions must not resurrect)")
    // Append: new docs become phrase-visible.
    TextIndexStore.append(spark, d, docs.filter(col("doc_id") >= 400), nBuckets)
    val afterApp = TextAnalysis.phraseSearchStored(spark, d, phrase, 200, nBuckets)
      .collect().map(_.getLong(0)).toSeq
    assert(afterApp.exists(_ >= 400), "appended docs must match phrases")
  }

  test("a phrase query's positions scan prunes unqueried buckets at FILE level and never reads text") {
    val q = TextAnalysis.phraseSearchStored(spark, posDir, Seq("data", "line"), 20, nBuckets)
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scans = q.queryExecution.sparkPlan.collectLeaves().collect {
      case f: FileSourceScanExec =>
        (f.relation.location.rootPaths.mkString(","), f.requiredSchema.fieldNames.toSet)
    }
    assert(scans.nonEmpty)
    scans.foreach { case (path, cols) =>
      assert(!path.contains("documents"), s"query-time scan of the corpus: $path")
      assert(!cols.contains("text"), s"query-time scan reads text: $cols")
    }
    // File pruning: the two-term bucket set touches fewer files than
    // the full positional sidecar holds.
    def filesTouched(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    val p = TextIndexStore.positions(spark, posDir)
    val all = filesTouched(p)
    val bs = Seq("data", "line").map(TextIndexStore.bucketOf(_, nBuckets)).distinct
    val pruned = filesTouched(p.filter(col("t_bucket").isin(bs.map(Long.box): _*)))
    assert(pruned < all, s"bucket filter must prune positional files: $pruned vs $all")
  }
}
