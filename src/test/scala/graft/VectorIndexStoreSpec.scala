package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.sources.{Tables, VectorIndexStore}

/** Operational contract of the persisted ANN index (q89/q90 families):
  * the store is train-once / serve-many — searches over the loaded
  * artifacts equal the retrain-per-query path row-for-row; append
  * admits new vectors WITHOUT touching the trained model or existing
  * codes; and serving reads only the probed cells' code files (the
  * cid-partitioned layout prunes at file level).
  */
class VectorIndexStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private val (nCents, nSub, nCodes, iters, nQ, k, nProbe) = (8, 4, 8, 2, 4, 10, 2)
  private lazy val emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val dir = {
    val d = Files.createTempDirectory("graft_vixspec").toString
    VectorIndexStore.build(emb, d, nCents, nSub, nCodes, iters)
    d
  }

  private def queries = Similarity.withEmb(emb)
    .filter(col("vec_id") < nQ).select(col("vec_id").as("qid"), col("emb"))

  test("stored-index search equals the retrain-per-query path row-for-row") {
    val fromStore = Similarity.ivfPqSearchFrames(queries,
      VectorIndexStore.centroids(spark, dir), VectorIndexStore.codebooks(spark, dir),
      VectorIndexStore.codes(spark, dir).filter(col("vec_id") >= nQ),
      nSub, k, nProbe).collect().toSeq
    val retrained = Similarity.ivfPqSearch(emb, nCents, nSub, nCodes, iters,
      nQ, k, nProbe).collect().toSeq
    assert(fromStore == retrained,
      "a persisted index must answer exactly what the just-trained one answers")
  }

  test("append admits new vectors without retraining: model frozen, existing codes untouched") {
    val d = Files.createTempDirectory("graft_vixspec_app").toString
    val base = emb.filter(col("vec_id") < 400)
    VectorIndexStore.build(base, d, nCents, nSub, nCodes, iters)
    val centsBefore = VectorIndexStore.centroids(spark, d)
      .orderBy("cid").collect().toSeq
    val booksBefore = VectorIndexStore.codebooks(spark, d)
      .orderBy("m", "cid").collect().toSeq
    val codesBefore = VectorIndexStore.codes(spark, d)
      .orderBy("vec_id").collect().toSeq
    VectorIndexStore.append(spark, d, emb.filter(col("vec_id") >= 400))
    assert(VectorIndexStore.centroids(spark, d).orderBy("cid").collect().toSeq
      == centsBefore, "append must not touch the coarse quantizer")
    assert(VectorIndexStore.codebooks(spark, d).orderBy("m", "cid").collect().toSeq
      == booksBefore, "append must not touch the sub-codebooks")
    val after = VectorIndexStore.codes(spark, d).orderBy("vec_id").collect().toSeq
    assert(after.filter(_.getLong(0) < 400) == codesBefore,
      "existing code rows must be byte-stable under append")
    val total = emb.count()
    assert(after.length.toLong == total && after.map(_.getLong(0)).distinct.length.toLong == total,
      "every vector coded exactly once after append")
    // The appended rows are coded against the STORED model: re-encoding
    // them from the stored artifacts reproduces them.
    val coarse = VectorIndexStore.centroids(spark, d)
    val books = VectorIndexStore.codebooks(spark, d)
    val expected = Similarity.encodeResiduals(
      Similarity.residuals(Similarity.withEmb(emb.filter(col("vec_id") >= 400)), coarse),
      books, nSub).orderBy("vec_id").collect().toSeq
    assert(after.filter(_.getLong(0) >= 400).map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      == expected.map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))))
  }

  test("serving prunes unprobed cells at FILE level via the cid partitioning") {
    val codes = VectorIndexStore.codes(spark, dir)
    // Files actually touched by the scan (input_file_name executes the
    // pruned plan — df.inputFiles reports the UNfiltered relation).
    def filesTouched(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    val allFiles = filesTouched(codes)
    val cells = codes.select("cid").distinct().collect().map(_.getLong(0)).sorted
    assert(cells.length > nProbe, "fixture must have more cells than probes")
    val probedOnly = codes.filter(col("cid").isin(cells.take(nProbe).map(Long.box): _*))
    assert(filesTouched(probedOnly) < allFiles,
      s"an IN filter on the partition column must prune files: " +
        s"${filesTouched(probedOnly)} vs $allFiles")
  }

  test("tombstone delete hides rows from serving without touching code files; compact preserves answers") {
    val d = Files.createTempDirectory("graft_vixspec_del").toString
    VectorIndexStore.build(emb, d, nCents, nSub, nCodes, iters)
    def codeFiles(): Set[String] =
      VectorIndexStore.codes(spark, d).inputFiles.toSet
    val filesBefore = codeFiles()
    def search(codes: org.apache.spark.sql.DataFrame) =
      Similarity.ivfPqSearchFrames(queries,
        VectorIndexStore.centroids(spark, d), VectorIndexStore.codebooks(spark, d),
        codes.filter(col("vec_id") >= nQ), nSub, k, nProbe).collect().toSeq
    val before = search(VectorIndexStore.codes(spark, d))

    // Tombstone ~1/7 of the corpus: serving flips to the live view,
    // yet not one code file changed (deletion is metadata-only).
    val dead = emb.select(col("vec_id"))
      .filter(col("vec_id") % 7 === 3 && col("vec_id") >= nQ)
    VectorIndexStore.delete(spark, d, dead)
    val live = search(VectorIndexStore.liveCodes(spark, d))
    assert(codeFiles() == filesBefore, "delete must not rewrite code files")
    assert(live != before, "a 1/7 deletion must visibly reshape top-k on the fixture")
    assert(!live.exists(r => r.getLong(2) % 7 == 3),
      "no tombstoned id may be served")

    // Cell pruning SURVIVES the tombstone anti-join: a cid filter on
    // the live view pushes below the join and lands on the parquet
    // scan as a PARTITION filter — without this the takedown path
    // would silently un-scale serving.
    val pruned = VectorIndexStore.liveCodes(spark, d)
      .filter(col("cid").isin(0L, 1L))
    val storeScans = pruned.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(s"$d/codes")) => f
    }
    assert(storeScans.nonEmpty)
    assert(storeScans.forall(_.partitionFilters.exists(
        _.references.exists(_.name == "cid"))),
      s"cid filter must reach the scan's partition filters through the anti-join: " +
        storeScans.map(_.partitionFilters).mkString(";"))

    // Physical compaction: identical answers from the plain code
    // table, tombstones gone, exactly one file per cell.
    VectorIndexStore.compact(spark, d)
    assert(search(VectorIndexStore.codes(spark, d)) == live,
      "compaction must not change a single answer")
    assert(VectorIndexStore.tombstones(spark, d).count() == 0)
    val perCell = VectorIndexStore.codes(spark, d)
      .select(col("cid"), input_file_name().as("f"))
      .distinct()
      .groupBy("cid").count()
      .collect()
    assert(perCell.nonEmpty && perCell.forall(_.getLong(1) == 1L),
      s"compaction must leave one file per cell: ${perCell.mkString(",")}")
    // liveCodes degenerates to codes once tombstones are folded in.
    assert(VectorIndexStore.liveCodes(spark, d).count() ==
      VectorIndexStore.codes(spark, d).count())

    // Compaction is IDEMPOTENT: a second pass over an already-compacted
    // store must reproduce the same rows (a maintenance scheduler may
    // fire it redundantly).
    val snap = VectorIndexStore.codes(spark, d).orderBy("vec_id").collect().toSeq
    VectorIndexStore.compact(spark, d)
    assert(VectorIndexStore.codes(spark, d).orderBy("vec_id").collect().toSeq == snap,
      "double compaction must be a no-op on the rows")

    // REVIVAL: re-ingesting tombstoned ids must serve them again with
    // exactly ONE generation of codes — append folds deletions
    // physically first, so the full-corpus ranking comes back.
    val d2 = Files.createTempDirectory("graft_vixspec_rev").toString
    VectorIndexStore.build(emb, d2, nCents, nSub, nCodes, iters)
    val before2 = search(VectorIndexStore.codes(spark, d2))
    VectorIndexStore.delete(spark, d2,
      emb.select(col("vec_id")).filter(col("vec_id") % 7 === 3 && col("vec_id") >= nQ))
    VectorIndexStore.append(spark, d2, emb.filter(col("vec_id") % 7 === 3 && col("vec_id") >= nQ))
    assert(VectorIndexStore.tombstones(spark, d2).count() == 0,
      "revival must clear the revived ids' tombstones")
    val after2 = VectorIndexStore.codes(spark, d2)
    assert(after2.count() == after2.select("vec_id").distinct().count(),
      "exactly one code generation per id after revival")
    assert(search(VectorIndexStore.liveCodes(spark, d2)) == before2,
      "delete-then-reingest must restore the full-corpus ranking")
  }

  test("ADC serving never scans the float embedding column on the corpus side") {
    val search = Similarity.ivfPqSearchFrames(queries,
      VectorIndexStore.centroids(spark, dir), VectorIndexStore.codebooks(spark, dir),
      VectorIndexStore.codes(spark, dir).filter(col("vec_id") >= nQ),
      nSub, k, nProbe)
    import org.apache.spark.sql.execution.FileSourceScanExec
    val storeScans = search.queryExecution.sparkPlan.collectLeaves().collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(dir)) =>
        f.requiredSchema.fieldNames.toSet
    }
    assert(storeScans.nonEmpty, "the stored code table must be scanned")
    storeScans.foreach(cols =>
      assert(!cols.contains("emb") && !cols.contains("embedding"),
        s"store scans must read codes only, got $cols"))
  }
}
