package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, DenseId, EventLog, Multimodal, Sampling, Temporal}
import graft.sources.Tables

/** Batch operator spot-checks that the DuckDB oracle gate can't express:
  * the distributed dense-id scheme against the single-task window
  * definition, and the typed multimodal decode path against its
  * declarative twin.
  */
class BatchOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("DenseId two-pass scheme equals the row_number() definition") {
    val df = Tables.events(spark, sf)
      .groupBy("user_id").agg(min("ts_us").as("first_seen"))
    val fast = DenseId.withDenseId(df, Seq(col("first_seen"), col("user_id")), "id")
      .select("user_id", "id")
    val slow = df.withColumn("id",
        row_number().over(Window.orderBy("first_seen", "user_id")).cast("long"))
      .select("user_id", "id")
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("typed per-partition multimodal decode equals the declarative metadata query") {
    val docs = Tables.table(spark, sf, "documents")
    val typed = Multimodal.decode(Multimodal.blobsFromDocuments(docs), batchSize = 7).toDF()
    val decl = Multimodal.mediaMeta(docs).select(typed.columns.map(col): _*)
    assert(typed.count() == 500L)
    assert(typed.exceptAll(decl).isEmpty && decl.exceptAll(typed).isEmpty)
  }

  test("graft_top10 UDAF registered for SQL equals the window formulation") {
    GraftSession.registerUdafs(spark)
    Tables.events(spark, sf).createOrReplaceTempView("events_v")
    val viaSql = spark.sql(
      """SELECT user_id, CAST(pos + 1 AS BIGINT) AS rnk,
                hit._2 AS event_id, hit._1 AS value
         FROM (SELECT user_id, graft_top10(value, event_id) AS hits
               FROM events_v GROUP BY user_id)
         LATERAL VIEW posexplode(hits) t AS pos, hit""")
    val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    val viaWindow = Tables.events(spark, sf)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= 10)
      .select("user_id", "rnk", "event_id", "value")
    assert(viaSql.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaSql).isEmpty)
    assert(viaSql.count() > 0)
  }

  test("as-of window pass equals the naive range-join formulation") {
    val ev = Tables.events(spark, sf)
    val fast = Temporal.asofLastView(ev)
      .select("event_id", "view_event_id")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts_us").as("p_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id"), col("ts_us").as("v_ts"))
    val naive = purchases
      .join(views, Seq("user_id"), "left")
      .where(col("v_id").isNull ||
        col("v_ts") < col("p_ts") ||
        (col("v_ts") === col("p_ts") && col("v_id") < col("p_id")))
      .groupBy("p_id")
      .agg(max_by(col("v_id"), struct(col("v_ts"), col("v_id"))).as("view_event_id"))
      .select(col("p_id").as("event_id"), col("view_event_id"))
    // The naive left join drops purchases whose only candidate rows were
    // filtered out; re-add them as null matches.
    val missing = purchases.join(naive, purchases("p_id") === naive("event_id"), "left_anti")
      .select(col("p_id").as("event_id"), lit(null).cast("long").as("view_event_id"))
    val slow = naive.union(missing)
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
    assert(fast.count() > 0)
  }

  test("banded interval join results are invariant to the band width") {
    val ev = Tables.events(spark, sf)
    val periods = Temporal.periods(
      spark, 1704067200000000L, 3L * 86400000000L, 4L * 86400000000L, 10)
    val day = 86400000000L
    val a = Temporal.periodStats(ev, periods, day)
    val b = Temporal.periodStats(ev, periods, 7L * 3600000000L) // 7 h band
    val c = Temporal.periodStats(ev, periods, 30L * day) // one giant band
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.exceptAll(c).isEmpty && c.exceptAll(a).isEmpty)
    assert(a.count() == 10)
  }

  test("daily resample forward-fills gap days with the prior close and flags them") {
    import spark.implicits._
    val DayUs = 86400000000L
    // user 1: days 10 (two events — close is the later), 13; user 2: day 5 only.
    val ev = Seq(
      (1L, 1L, 10L * DayUs + 100L, 1.0),
      (2L, 1L, 10L * DayUs + 200L, 2.0), // same day, later → the close
      (3L, 1L, 13L * DayUs, 9.0),
      (4L, 2L, 5L * DayUs, 7.0)
    ).toDF("event_id", "user_id", "ts_us", "value")
    val got = Temporal.resampleDailyFfill(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toSeq
    assert(got == Seq(
      (1L, 10L, 2L, 2.0, false), // both events counted, later one closes
      (1L, 11L, 0L, 2.0, true),  // gap: carried close, flagged
      (1L, 12L, 0L, 2.0, true),
      (1L, 13L, 1L, 9.0, false),
      (2L, 5L, 1L, 7.0, false))) // single-day span: no gaps
    val rep = Temporal.resampleGapReport(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(rep == Seq((1L, 2L, 4L, 2L, 2L), (2L, 1L, 1L, 0L, 0L)))
  }

  test("q39 core: null buckets pair up and unmatched sides survive the full outer") {
    import spark.implicits._
    // The natural corpus always carries `k`, so the defining semantics
    // (null-safe match, one-sided keys) need synthetic rows.
    val k = Seq(
      (0L, Some(1L)), (2L, Some(1L)), (1L, Some(1L)), // k=1 on both sides
      (4L, None), (6L, None), (3L, None),             // null bucket, both sides
      (8L, Some(7L)),                                 // even-only key
      (5L, Some(9L)), (7L, Some(9L))                  // odd-only key
    ).toDF("event_id", "k")
    val out = graft.operators.Relational.nullSafeReconcile(k)
      .collect().map(r => (Option(r.get(0)), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (None, 2L, 1L), (Some(1L), 2L, 1L), (Some(7L), 1L, 0L), (Some(9L), 0L, 2L)))
  }

  test("exact dedup groups carry the whole corpus exactly once") {
    val docs = Tables.table(spark, sf, "documents")
    val d = Dedup.exactDedup(docs)
    assert(d.agg(sum("n_copies")).head.getLong(0) == docs.count())
  }

  test("TopKAggregator (bounded-heap grouped top-k) equals the window formulation") {
    import spark.implicits._
    import graft.functions.TopKAggregator
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("value"), col("event_id"))
      .as[(Long, Double, Long)]
    val fast = ev
      .groupByKey(_._1)
      .mapValues { case (_, v, id) => (v, id) }
      .agg(new TopKAggregator(3).toColumn)
      .flatMap { case (u, hits) =>
        hits.zipWithIndex.map { case ((s, id), i) => (u, i + 1L, id, s) }
      }
      .toDF("user_id", "rnk", "event_id", "value")
    val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    val slow = Tables.events(spark, sf)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= 3)
      .select("user_id", "rnk", "event_id", "value")
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
    assert(fast.count() > 0)
  }

  test("delta scan composes: (a,b] ∪ (b,c] == (a,c]") {
    val ev = Tables.events(spark, sf)
    val a = 1704844800000000L; val b = 1705276800000000L; val c = 1705708800000000L
    val left = EventLog.deltaEvents(ev, a, b).unionAll(EventLog.deltaEvents(ev, b, c))
    val whole = EventLog.deltaEvents(ev, a, c)
    assert(left.exceptAll(whole).isEmpty && whole.exceptAll(left).isEmpty)
  }

  test("SQL surface parity: ANSI oracle strings run verbatim on Spark and match the DataFrame plans") {
    // The relational oracles are written in ANSI SQL that BOTH engines
    // accept — so the library's SQL surface (registerAll + spark.sql) is
    // verified three ways: DataFrame plan ≡ Spark SQL ≡ DuckDB.
    Tables.registerAll(spark, sf)
    for (q <- Seq("q57_star_join", "q03_join_agg", "q06_pricing_summary",
        "q13_set_ops", "q08_rollup")) {
      val viaSql = spark.sql(SparkEntry.oracleSql(q))
      val viaDf = SparkEntry.queries(q)(spark, sf)
      assert(viaSql.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaSql).isEmpty,
        s"$q: SQL surface diverges from the DataFrame plan")
    }
  }

  test("HLL mergeability: union of daily sketches estimates like one global sketch") {
    // The property that makes sketch pre-aggregation sound: building
    // per-slice sketches and unioning them loses nothing vs. sketching
    // the whole input at once (register-wise max is associative).
    val ev = Tables.events(spark, sf)
    val viaUnion = ev
      .withColumn("day", expr("ts_us div 86400000000"))
      .groupBy("event_type", "day")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val direct = ev.groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est"))
    assert(viaUnion.exceptAll(direct).isEmpty && direct.exceptAll(viaUnion).isEmpty)
  }

  test("contamination measures eval-shingle overlap exactly on a constructed fixture") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // evalModulus=2 → eval docs {0, 2}, training docs {1, 3}.
    val docs = Seq(
      (0L, "a b c d e"), // eval shingles {a b c, b c d, c d e}
      (2L, "x y z w"),   // eval shingles {x y z, y z w}
      (1L, "a b c d q"), // train: {a b c, b c d, c d q} → 2 of 3 leaked
      (3L, "p q r s")    // train: {p q r, q r s} → clean
    ).toDF("doc_id", "text")
    val out = TextAnalysis.contaminationSplit(docs, 2L, 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out.keySet == Set(1L, 3L), "eval docs must be excluded from scoring")
    assert(out(1L) == ((3L, 2L, 0.6667, true)))
    assert(out(3L) == ((2L, 0L, 0.0, false)))
  }

  test("two-pass heavy hitters stay exact with sketch capacity far below distinct count") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // 201 distinct words vs capacity 8: the MG decrement path fires
    // constantly in pass 1, yet pass 2's exact gate must leave the
    // answer identical to the naive full GROUP BY.
    val fillerDocs = (0 until 40).map(i =>
      (i.toLong, (0 until 5).map(j => s"f${i * 5 + j}").mkString(" ")))
    val hotDocs = (40 until 46).map(i => (i.toLong, Seq.fill(10)("hot").mkString(" ")))
    val docs = (fillerDocs ++ hotDocs).toDF("doc_id", "text")
    val out = TextAnalysis.heavyHitters(docs, capacity = 8, shareDen = 9L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // n_total = 260; only "hot" (60/260 ≈ 23%) clears share > 1/9.
    assert(out.toSeq == Seq(("hot", 60L, 0.230769)))
  }

  test("HLL estimates land inside the sketch's own 3-sigma bound (q52's contract)") {
    // q52's within_tol is only a meaningful gate if the tolerance comes
    // from the configured sketch's accuracy model, not a constant: at
    // lgK=12 the 3σ relative bound is 3·1.04/√4096 ≈ 4.9%.
    val lgK = 12
    val bound = EventLog.hllErrorBound(lgK)
    assert(math.abs(bound - 0.04875) < 1e-5)
    val rows = EventLog.mergeableDistinctEstimates(Tables.events(spark, sf), lgK)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val relErr = r.getAs[Double]("rel_err")
      assert(relErr <= bound,
        s"${r.getAs[String]("event_type")}: rel_err $relErr > 3σ bound $bound")
      assert(r.getAs[Boolean]("within_tol"))
    }
  }

  test("temperature mixture: shares sum to 1 and boost strictly upweights smaller sources") {
    val rows = Sampling.temperatureMixture(Tables.table(spark, sf, "documents"))
      .collect()
    assert(rows.length > 1, "needs multiple sources to mean anything")
    // Both share columns are per-source rounded to 1e-6, so the totals
    // sit within #sources ulps of 1.
    val tol = rows.length * 1e-6
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) <= tol)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) <= tol)
    // boost(n) = Σn / (sqrt(n)·Σsqrt) is strictly decreasing in source
    // size: temperature sampling upweights small sources, downweights
    // large ones, and brackets 1 whenever sizes differ.
    val bySize = rows.sortBy(_.getLong(2)).map(r => (r.getLong(2), r.getDouble(5)))
    bySize.sliding(2).foreach {
      case Array((n1, b1), (n2, b2)) if n1 < n2 =>
        assert(b1 > b2, s"boost not decreasing: $n1→$b1 vs $n2→$b2")
      case _ => ()
    }
    if (bySize.head._1 != bySize.last._1) {
      assert(bySize.head._2 > 1.0 && bySize.last._2 < 1.0)
    }
  }

  test("q76 incremental near-dup agrees with the batch pair operator across the split") {
    // Every cross-split near-dup pair the full nearDupPairs run finds
    // must surface in the incremental verdict, with the SAME best
    // jaccard — ties the ingest path to the independent q17c path
    // rather than to its own oracle mirror. (The two gates differ only
    // for buckets near MaxBucket — combined vs corpus-side count —
    // which this corpus never approaches.)
    val docs = Tables.table(spark, sf, "documents")
    val split = 250L
    val thr = 0.2
    val cross = Dedup.nearDupPairs(docs, thr).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .collect { case (a, b, j) if a < split && b >= split => (b, a, j) } // (batch, corpus, jac)
    assert(cross.nonEmpty, "fixture should have cross-split near-dups")
    val bestByBatch = cross.groupBy(_._1).map { case (b, ps) =>
      // q76's tie-break: highest jaccard, then lowest corpus id.
      b -> ps.map(p => (p._3, -p._2)).max
    }
    val verdicts = Dedup.incrementalNearDup(docs, split, thr).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    bestByBatch.foreach { case (b, (jac, negCid)) =>
      val (isDup, mid, vj) = verdicts(b)
      assert(isDup, s"batch doc $b near-dups corpus doc ${-negCid} but verdict is clean")
      assert(mid == -negCid && vj == jac,
        s"batch doc $b: verdict ($mid, $vj) != pair-path best (${-negCid}, $jac)")
    }
    // And no extra: batch docs the pair path never flags must be clean.
    val flagged = bestByBatch.keySet
    verdicts.foreach { case (b, (isDup, _, _)) =>
      assert(isDup == flagged.contains(b), s"batch doc $b verdict mismatch")
    }
  }

  test("q19d BPE pre-tokenizer: hand-computed segmentation on mixed text") {
    // The corpus is lowercase-words-only, so the oracle gate only
    // exercises the letter branch; this fixture drives every branch —
    // contraction, digits, punctuation runs, multi-space — against a
    // hand-segmented expectation (Java regex side; the RE2 oracle runs
    // the same bytes at gate time on the corpus).
    import spark.implicits._
    val text = "I don't have 42 apples!!  Really?"
    // Hand segmentation under BpePattern (leftmost-first alternation):
    //   "I" " don" "'t" " have" " 42" " apples" "!!" "  " "Really" "?"
    val df = Seq((1L, text, "en", "web", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = graft.operators.TextAnalysis.bpePretokenize(df).head()
    assert(r.getAs[Long]("n_bpe_tokens") == 10, r.toString)
    assert(r.getAs[Long]("n_word_toks") == 5)    // I, don, have, apples, Really
    assert(r.getAs[Long]("n_num_toks") == 1)     // " 42"
    assert(r.getAs[Long]("n_contr_toks") == 1)   // "'t"
    assert(r.getAs[Long]("n_ws_toks") == 1)      // the double space
    assert(r.getAs[Long]("n_other_toks") == 2)   // "!!", "?"
    // Exact token list via the same pattern, pinning segmentation order.
    val toks = df.select(
      regexp_extract_all(col("text"),
        lit(graft.operators.TextAnalysis.BpePattern), lit(0)).as("t"))
      .head().getSeq[String](0)
    assert(toks == Seq("I", " don", "'t", " have", " 42", " apples", "!!", "  ", "Really", "?"),
      toks.mkString("[", "|", "]"))
  }

  test("q86: BM25 returns only term-matching docs and idf orders rarer terms higher") {
    import spark.implicits._
    // Fixture: "rare" appears in 1 of 4 docs, "common" in all 4. With
    // equal tf and dl, the rare-term doc must outscore a common-only
    // doc (the idf monotonicity BM25 exists for), and docs matching no
    // term must not appear at all.
    val docs = Seq(
      (1L, "rare common pad1 pad2"),
      (2L, "common x1 x2 x3"),
      (3L, "common y1 y2 y3"),
      (4L, "z1 z2 z3 z4")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.bm25(docs, Seq("rare", "common"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(!out.contains(4L), "doc without any query term must not score")
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) > out(2L), s"rare+common must outscore common-only: $out")
    assert(out(2L) == out(3L), s"identical tf/dl must tie: $out")
  }

  test("q136: priority estimator is deterministic, its salt-ensemble mean converges on the true total, and under-sampling is rejected") {
    val ev = Tables.events(spark, sf)
    val one = Sampling.priorityEstimate(ev, 100, "s0").collect().head
    val again = Sampling.priorityEstimate(ev, 100, "s0").collect().head
    assert(one.toString == again.toString, "hash sampling must be reproducible")
    val trueTotal = one.getLong(one.fieldIndex("true_total_centi"))
    // Unbiasedness in practice: 16 independent (deterministic) salts'
    // estimates must average well inside one-draw error. Every number
    // here is a pure hash function — this never flakes.
    val ests = (0 until 16).map { i =>
      val r = Sampling.priorityEstimate(ev, 100, s"s$i").collect().head
      r.getLong(r.fieldIndex("est_total_centi"))
    }
    val meanErrPpm = math.abs(ests.sum / ests.length - trueTotal) * 1000000L / trueTotal
    assert(meanErrPpm < 80000L,
      s"ensemble mean drifted ${meanErrPpm} ppm from the true total")
    // k >= n has no (k+1)-th threshold row — loud, not a wrong answer.
    val tiny = ev.limit(50)
    intercept[IllegalArgumentException] {
      Sampling.priorityEstimate(tiny, 50, "s0").collect()
    }
  }
}
