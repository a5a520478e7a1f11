package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Pipeline}
import graft.sources.Tables

/** Structural invariants of the training-pipeline operators (Q42-Q47) —
  * the properties the per-query oracle hash can't state directly:
  * funnels are monotone, splits partition, history intervals tile, and
  * normalization collapses at least as much as raw-content identity.
  */
class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

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

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private lazy val events = Tables.events(spark, sf)
  private lazy val docs = Tables.table(spark, sf, "documents")

  test("funnel stage counts are monotone non-increasing and bounded by the user count") {
    val rows = Pipeline.funnel(events).orderBy("stage").collect()
    assert(rows.length == 4)
    val counts = rows.map(_.getLong(rows.head.fieldIndex("n_users")))
    assert(counts.sliding(2).forall(p => p(0) >= p(1)))
    assert(rows.head.getAs[String]("stage") == "0_all")
    assert(math.abs(rows.head.getAs[Double]("conv_rate") - 1.0) < 1e-9)
  }

  test("train/val/test split partitions the corpus exactly") {
    val split = Pipeline.trainSplit(docs, "split1")
    val agg = split.agg(sum("n_docs"), sum("id_checksum")).head()
    val base = docs.agg(count(lit(1)), sum("doc_id")).head()
    assert(agg.getLong(0) == base.getLong(0))
    assert(agg.getLong(1) == base.getLong(1))
    // All three splits are populated at this corpus size, and the split
    // is salt-sensitive (a different salt reassigns some documents).
    assert(split.select("split").distinct().count() == 3)
    val other = Pipeline.trainSplit(docs, "split2")
    assert(split.exceptAll(other).count() > 0)
  }

  test("q100: cluster-safe split is leakage-free and covers the corpus exactly once") {
    val split = Pipeline.clusterSafeSplit(docs, 0.2, "split1")
    // Exactly one row per document.
    assert(split.count() == docs.count())
    assert(split.select("doc_id").distinct().count() == docs.count())
    // The leakage contract: every near-dup cluster lies WHOLLY inside
    // one split — no cluster label maps to two split values.
    val straddling = split.groupBy("cluster_label")
      .agg(countDistinct(col("split")).as("ns"))
      .where(col("ns") > 1)
    assert(straddling.count() == 0, "a near-dup cluster straddles splits")
    // And the hole it closes is real on this corpus: the per-document
    // q43 assignment DOES place some near-dup pair across splits.
    val perDoc = Pipeline.withSplit(docs, "split1").select(col("doc_id"), col("split"))
    val pairs = graft.operators.Dedup.nearDupPairs(docs, 0.2).select("doc_a", "doc_b")
    val leaked = pairs
      .join(perDoc.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("split", "sa"), "doc_a")
      .join(perDoc.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("split", "sb"), "doc_b")
      .where(col("sa") =!= col("sb"))
    assert(leaked.count() > 0,
      "fixture should exhibit per-doc split leakage for the contrast to matter")
  }

  test("q102: stored-LM scoring matches in-query scoring in-vocab and backs off on OOV") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lmspec").toString
    graft.sources.LmStore.build(docs, dir, 16)
    // In-vocab: scoring the training corpus against its own stored
    // model must reproduce q49 exactly (and report zero OOV).
    val stored = Pipeline.lmScoreStored(spark, dir, docs)
    assert(stored.agg(sum("n_oov")).first().getLong(0) == 0L)
    val q49 = Pipeline.lmScore(docs).collect().toSeq
    assert(stored.select("doc_id", "n_tokens", "mean_nll").collect().toSeq == q49,
      "stored-model scoring of the training corpus must equal q49 row-for-row")
    // OOV: invented tokens back off to the singleton count
    // -ln(1 / n_total), and the OOV count is surfaced per doc.
    import spark.implicits._
    val nTotal = graft.sources.LmStore.stats(spark, dir).first().getLong(0)
    val batch = Seq((9001L, "zzqx1 zzqx2 zzqx3")).toDF("doc_id", "text")
    val row = Pipeline.lmScoreStored(spark, dir, batch).first()
    assert(row.getLong(1) == 3L && row.getLong(2) == 3L, s"all three tokens are OOV: $row")
    val want = BigDecimal(-math.log(1.0 / nTotal))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getDouble(3) - want) < 1e-9,
      s"OOV backoff must score -ln(1/n_total): got ${row.getDouble(3)}, want $want")
  }

  test("q104: negative-segment delete nets out exactly; compaction folds the stack") {
    import spark.implicits._
    import graft.sources.LmStore
    val dir = java.nio.file.Files.createTempDirectory("graft_lm104").toString
    val base = Seq((0L, "alpha beta beta"), (1L, "alpha gamma")).toDF("doc_id", "text")
    LmStore.build(base, dir, 4)
    LmStore.deleteDocs(spark, dir, base.filter(col("doc_id") === 1L), 4)
    // A RETRIED delete of the same doc must be swallowed by the ledger
    // — segments alone can't tell a retry from a new takedown.
    LmStore.deleteDocs(spark, dir, base.filter(col("doc_id") === 1L), 4)
    // The serving net: alpha 2-1=1, beta 2, gamma 1-1=0 → INVISIBLE.
    val v = LmStore.vocab(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("alpha" -> 1L, "beta" -> 2L), v.toString)
    assert(LmStore.stats(spark, dir).first().getLong(0) == 3L,
      "token total must retreat by the deleted docs' exact count")
    // The raw store really is a segment stack (a negative row exists) —
    // deletion wrote a segment, it didn't rewrite history.
    val raw = spark.read.parquet(s"$dir/vocab")
    assert(raw.filter(col("n_w") < 0).count() > 0)
    // A fully-netted-out word scores as OOV, not as a ghost.
    val ghost = Pipeline.lmScoreStored(spark, dir,
      Seq((7L, "gamma")).toDF("doc_id", "text")).first()
    assert(ghost.getLong(2) == 1L, s"netted-out word must be OOV: $ghost")
    // REVIVAL by count algebra: re-appending doc 1 nets its negative
    // segment back out, and the ledger forgets the id — so a FUTURE
    // takedown of the re-ingested doc is a fresh delete, not a
    // swallowed duplicate.
    LmStore.append(spark, dir, base.filter(col("doc_id") === 1L), 4)
    val revived = LmStore.vocab(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(revived == Map("alpha" -> 2L, "beta" -> 2L, "gamma" -> 1L), revived.toString)
    assert(LmStore.stats(spark, dir).first().getLong(0) == 5L)
    LmStore.deleteDocs(spark, dir, base.filter(col("doc_id") === 1L), 4)
    assert(LmStore.stats(spark, dir).first().getLong(0) == 3L,
      "a post-revival takedown must subtract again")

    // Compaction: identical serving view, no non-positive rows left,
    // segment stack folded to one net row per word.
    val before = LmStore.vocab(spark, dir).orderBy("word").collect().toSeq
    LmStore.compact(spark, dir)
    assert(LmStore.vocab(spark, dir).orderBy("word").collect().toSeq == before)
    val rawAfter = spark.read.parquet(s"$dir/vocab")
    assert(rawAfter.count() == 2 && rawAfter.filter(col("n_w") <= 0).count() == 0)
    // Compaction is IDEMPOTENT: a redundant second fold is a no-op.
    LmStore.compact(spark, dir)
    assert(LmStore.vocab(spark, dir).orderBy("word").collect().toSeq == before)
  }

  test("state history intervals tile each user's timeline with one current row") {
    val h = Pipeline.stateHistory(events)
    // Exactly one open (current) interval per user.
    val open = h.where(col("is_current")).groupBy("user_id").count()
    assert(open.where(col("count") =!= 1).isEmpty)
    // Every closed interval's valid_to equals the next version's valid_from.
    val joined = h.alias("a").join(
        h.alias("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.version") + 1 === col("b.version"))
    assert(joined.where(col("a.valid_to") =!= col("b.valid_from")).isEmpty)
    assert(h.count() == events.count())
  }

  test("normalized dedup collapses at least as much as exact dedup") {
    val nNorm = Pipeline.normalizedDedup(docs).count()
    val nExact = Dedup.exactDedup(docs).count()
    assert(nNorm <= nExact)
    // Survivor mass is conserved: group sizes sum to the corpus size.
    val total = Pipeline.normalizedDedup(docs).agg(sum("n_copies")).head().getLong(0)
    assert(total == docs.count())
  }

  test("retention offset-0 cell count equals cohort size and offsets are non-negative") {
    val r = Pipeline.retentionCohorts(events)
    assert(r.where(col("week_offset") < 0).isEmpty)
    // Every user is active in their own cohort week, so the offset-0
    // cells partition the user population.
    val atZero = r.where(col("week_offset") === 0).agg(sum("n_active")).head().getLong(0)
    assert(atZero == events.select("user_id").distinct().count())
  }

  test("association rules: canonical pair order, probability bounds, exact integer counts") {
    val r = Pipeline.typeAssociations(events, 0.0).collect()
    assert(r.nonEmpty && r.length <= 10) // C(5,2) over the 5-type vocabulary
    r.foreach { row =>
      assert(row.getAs[String]("type_a") < row.getAs[String]("type_b"))
      val support = row.getAs[Double]("support")
      assert(support > 0.0 && support <= 1.0)
      assert(row.getAs[Double]("lift") > 0.0)
    }
    // Pair count never exceeds either member's singleton count.
    val ut = events.select("user_id", "event_type").distinct()
    val singles = ut.groupBy("event_type").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    r.foreach { row =>
      val nAb = row.getAs[Long]("n_ab")
      assert(nAb <= singles(row.getAs[String]("type_a")))
      assert(nAb <= singles(row.getAs[String]("type_b")))
    }
  }

  test("LM score covers every document; duplicate texts score identically") {
    val scores = Pipeline.lmScore(docs)
    assert(scores.count() == docs.count())
    assert(scores.where(col("mean_nll") <= 0.0).isEmpty)
    // Same text => same (n_tokens, mean_nll): score is a pure function
    // of content under a fixed corpus distribution.
    val joined = docs.select(col("doc_id"), md5(col("text")).as("h"))
      .join(scores, "doc_id")
      .groupBy("h").agg(
        countDistinct("mean_nll").as("nd"), countDistinct("n_tokens").as("nt"))
    assert(joined.where(col("nd") =!= 1 || col("nt") =!= 1).isEmpty)
  }

  test("state occupancy totals equal each user's closed timeline span") {
    val occ = Pipeline.stateOccupancy(events)
    val total = occ.agg(sum("total_us")).head().getLong(0)
    // Sum of closed interval durations = sum over users of (last - first).
    val span = events.groupBy("user_id")
      .agg((max("ts_us") - min("ts_us")).as("span"))
      .agg(sum("span")).head().getLong(0)
    assert(total == span)
    // Interval counts: every event except each user's last opens a closed interval.
    val n = occ.agg(sum("n_intervals")).head().getLong(0)
    assert(n == events.count() - events.select("user_id").distinct().count())
  }

  test("length gate keeps ~90% of the corpus and every survivor is inside the band") {
    val gated = Pipeline.lengthGate(docs, 0.05, 0.95)
    val n = docs.count().toDouble
    assert(gated.count() >= 0.85 * n && gated.count() <= 0.95 * n)
    assert(gated.where(
      col("n_chars") < col("p_lo") || col("n_chars") > col("p_hi")).isEmpty)
  }

  test("incremental dedup: survivors are new to the corpus and unique within the batch") {
    val split = 250L
    val inc = Dedup.incrementalDedup(docs, split)
    // No survivor's content exists in the corpus half.
    val corpusHashes = docs.where(col("doc_id") < split)
      .select(sha2(col("text"), 256).as("content_hash")).distinct()
    assert(inc.join(corpusHashes, Seq("content_hash"), "left_semi").isEmpty)
    // One row per surviving content, and each keep_id is from the batch half.
    assert(inc.where(col("keep_id") < split).isEmpty)
    assert(inc.select("content_hash").distinct().count() == inc.count())
    // Idempotence: once the batch is absorbed into the corpus, the same
    // content re-arriving (fresh ids) yields zero survivors.
    val reArrival = docs.where(col("doc_id") >= split)
      .withColumn("doc_id", col("doc_id") + lit(500L))
    assert(Dedup.incrementalDedup(docs.union(reArrival), 500L).isEmpty)
  }

  test("transition matrix: rows are probability distributions over observed pairs") {
    val tr = Pipeline.typeTransitions(events)
    // Total transitions = events minus one per user (no predecessor).
    val n = tr.agg(sum("n")).head().getLong(0)
    assert(n == events.count() - events.select("user_id").distinct().count())
    val rowSums = tr.groupBy("from_type").agg(sum("p").as("s")).collect()
    rowSums.foreach(r =>
      assert(math.abs(r.getAs[Double]("s") - 1.0) < 1e-2, s"row sum off: $r"))
  }

  test("standardization: per-type z-scores have ~zero mean and ~unit variance") {
    val z = Pipeline.standardize(events)
    assert(z.count() == events.count())
    val stats = z.groupBy("event_type")
      .agg(avg("z").as("m"), avg(col("z") * col("z")).as("v")).collect()
    stats.foreach { r =>
      assert(math.abs(r.getAs[Double]("m")) < 1e-3, s"mean off: $r")
      assert(math.abs(r.getAs[Double]("v") - 1.0) < 1e-2, s"variance off: $r")
    }
  }

  test("group sample keeps at most k per stratum and is a subset of the corpus") {
    val k = 3
    val samp = Pipeline.groupSample(docs, k, "samp1")
    val per = samp.groupBy("lang", "source").count()
    assert(per.where(col("count") > k).isEmpty)
    assert(samp.join(docs, Seq("doc_id"), "left_anti").isEmpty)
    // Deterministic: same salt twice gives identical rows.
    assert(samp.exceptAll(Pipeline.groupSample(docs, k, "samp1")).isEmpty)
  }

  test("q82: DSIR weights upweight the target distribution") {
    // The semantic claim of importance weighting: documents drawn from
    // the target (lang = en) must average a higher log-likelihood
    // ratio than the raw corpus — if they don't, the model learned
    // nothing and selection is noise.
    val w = Pipeline.dsirWeights(docs)
    assert(w.count() == docs.count())
    val Array(enMean, allMean) = w
      .agg(
        avg(when(col("lang") === "en", col("weight"))),
        avg(col("weight")))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    assert(enMean > allMean,
      s"target-language mean weight $enMean not above corpus mean $allMean")
  }

  test("q82b: Gumbel resampling is a deterministic size-k subset that shifts mass to the target") {
    val k = 100
    val samp = Pipeline.dsirResample(docs, k)
    assert(samp.count() == k)
    assert(samp.join(docs, Seq("doc_id"), "left_anti").isEmpty)
    assert(samp.exceptAll(Pipeline.dsirResample(docs, k)).isEmpty)
    // Importance resampling must raise the target-language share
    // relative to the corpus base rate (en weights average higher).
    val enShare = samp.where(col("lang") === "en").count().toDouble / k
    val baseRate = docs.where(col("lang") === "en").count().toDouble / docs.count()
    assert(enShare > baseRate,
      s"sampled en share $enShare not above base rate $baseRate")
  }
}
