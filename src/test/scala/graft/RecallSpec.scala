package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.sources.Tables

/** The ANN accuracy contract: approximate search (IVF, SRP-LSH) is only
  * useful if its recall against exhaustive search is known and doesn't
  * silently degrade. Determinism specs can't catch an "optimization"
  * that keeps results stable but wrong — these pin recall@k floors
  * against the brute-force oracle (q18g's bounded-buffer exhaustive
  * top-k) on the real embeddings corpus, and the structural properties
  * of the nProbe dial:
  *
  *   - IVF recall\@5 at nProbe=1 stays above a floor (measured 0.95);
  *   - recall is monotone non-decreasing in nProbe (more probed
  *     clusters can only add candidates);
  *   - nProbe = nCentroids degenerates to exhaustive search (recall 1);
  *   - nProbe = 1 reproduces ivfSearch (q18e) row-for-row;
  *   - single-table 6-plane SRP-LSH recall (measured 0.2 — the honest
  *     cost of one small hash table) stays above its floor.
  */
class RecallSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val NCentroids = 8
  private val NQueries = 4
  private val K = 5

  private lazy val emb =
    Tables.table(spark, "/root/testdata/sf0.001", "embeddings")

  /** (qid, vec_id) result set of a search frame. */
  private def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val exact: Set[(Long, Long)] = {
    val e = hits(Similarity.udafTopK(emb, NQueries)
      .where(org.apache.spark.sql.functions.col("rnk") <= K))
    assert(e.size == NQueries * K, s"ground truth should be full: ${e.size}")
    e
  }

  private def recall(approx: Set[(Long, Long)]): Double =
    (approx intersect exact).size.toDouble / exact.size

  test("IVF recall@5 at nProbe=1 meets its floor") {
    val r = recall(hits(
      Similarity.ivfSearchProbes(emb, NCentroids, NQueries, K, nProbe = 1)))
    assert(r >= 0.85, s"IVF nProbe=1 recall@$K = $r (measured 0.95; floor 0.85)")
  }

  test("IVF recall is monotone in nProbe and exact at full probe") {
    val curve = Seq(1, 2, 4, NCentroids).map { np =>
      np -> recall(hits(
        Similarity.ivfSearchProbes(emb, NCentroids, NQueries, K, np)))
    }
    curve.sliding(2).foreach { case Seq((np1, r1), (np2, r2)) =>
      assert(r2 >= r1, s"recall dropped widening nProbe $np1->$np2: $r1 -> $r2")
    }
    assert(curve.last._2 == 1.0,
      s"nProbe=$NCentroids probes every cluster; recall must be 1.0, got ${curve.last._2}")
  }

  test("ivfSearchProbes(nProbe=1) reproduces ivfSearch row-for-row") {
    val base = Similarity.ivfSearch(emb, NCentroids, NQueries, K).collect().toSeq
    val gen = Similarity.ivfSearchProbes(emb, NCentroids, NQueries, K, 1).collect().toSeq
    assert(gen == base)
  }

  test("trained-centroid IVF (q18i): inverted lists stay balanced and recall meets its floor") {
    import org.apache.spark.sql.functions.{col, count, lit}
    // On UNIFORM random embeddings cluster structure is noise, so raw
    // nProbe=1 recall is not comparable between seeds (measured: the
    // raw-vector stand-in happens to score 0.95, trained 0.75, with
    // near-identical candidate counts — both are artifacts of where
    // arbitrary Voronoi boundaries fall). The durable contracts: the
    // trained index never worsens the largest inverted list (the
    // 100 TB skew bound), covers the corpus, and keeps a recall floor;
    // structure-dependent quality is pinned on the separable fixture
    // below, and the nProbe dial's exactness in the next test.
    def occupancy(cents: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Similarity.assignTo(Similarity.withEmb(emb), cents)
        .groupBy("cid").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val standCents = Similarity.withEmb(emb)
      .where(col("vec_id") < NCentroids)
      .select(col("vec_id").as("cid"), col("emb").as("cemb"))
    val trainCents = Similarity.trainedCentroids(emb, NCentroids, iters = 3)
    val standOcc = occupancy(standCents)
    val trainOcc = occupancy(trainCents)

    val trainRecall = recall(hits(
      Similarity.ivfSearchTrained(emb, NCentroids, iters = 3, NQueries, K)))

    assert(trainOcc.values.max <= standOcc.values.max,
      s"training must not worsen the largest inverted list: " +
        s"trained ${trainOcc.values.max} vs stand-in ${standOcc.values.max}")
    assert(trainOcc.values.sum == standOcc.values.sum,
      "assignment must cover the corpus under either index")
    assert(trainRecall >= 0.6,
      s"trained nProbe=1 recall@$K = $trainRecall (measured 0.75; floor 0.6)")
  }

  test("trained IVF recall is monotone in nProbe and exact at full probe") {
    // The nProbe dial must behave identically on the trained index:
    // wider probes only add candidates, and probing every cluster is
    // exhaustive search regardless of where training put the centroids.
    val curve = Seq(1, 2, 4, NCentroids).map { np =>
      np -> recall(hits(Similarity.ivfSearchTrainedProbes(
        emb, NCentroids, iters = 3, NQueries, K, np)))
    }
    curve.sliding(2).foreach { case Seq((np1, r1), (np2, r2)) =>
      assert(r2 >= r1, s"trained recall dropped widening nProbe $np1->$np2: $r1 -> $r2")
    }
    assert(curve.last._2 == 1.0,
      s"full probe of the trained index must be exhaustive, got ${curve.last._2}")
  }

  test("kmeansTrain converges on separable data and early-exit equals the full unroll") {
    import spark.implicits._
    // Three well-separated direction clusters (orthogonal axes with a
    // small deterministic wobble): Lloyd must settle in a couple of
    // rounds, after which every extra round is a no-op — so a converged
    // run at iters=3 must equal iters=8 exactly (the early-exit
    // soundness claim behind the oracle's fixed unroll), and each true
    // cluster must land in one trained centroid.
    val vecs = (0L until 60L).map { i =>
      val axis = (i % 3).toInt
      val emb = Array.tabulate(16) { d =>
        val base = if (d == axis * 5) 10.0 else 0.0
        base + 0.01 * ((i * 31 + d * 7) % 11)
      }
      (i, s"c$axis", emb)
    }.toDF("vec_id", "label", "embedding")
    def rows(iters: Int): Set[Seq[Any]] =
      Similarity.kmeansTrain(vecs, 3, iters).collect().map(_.toSeq).toSet
    val at3 = rows(3)
    assert(at3 == rows(8), "converged training must be invariant to extra capped rounds")
    // Every vector of a true cluster shares its trained centroid.
    val asg = Similarity
      .assignTo(Similarity.withEmb(vecs), Similarity.trainedCentroids(vecs, 3, 3))
      .select("label", "cid").distinct().collect()
    assert(asg.length == 3, s"three separable clusters must map 1:1 to centroids, got ${asg.length}")
  }

  test("SRP-LSH recall@5 meets its floor") {
    val r = recall(hits(Similarity.lshSearch(emb, NQueries, K)))
    assert(r >= 0.15, s"LSH recall@$K = $r (measured 0.2 for one 6-plane table; floor 0.15)")
  }

  test("multi-table LSH recall is monotone in nTables and beats one table") {
    val curve = Seq(1, 2, 4, 8).map { nt =>
      nt -> recall(hits(Similarity.multiTableLshSearch(emb, NQueries, K, nt)))
    }
    curve.sliding(2).foreach { case Seq((n1, r1), (n2, r2)) =>
      assert(r2 >= r1, s"recall dropped widening tables $n1->$n2: $r1 -> $r2")
    }
    // Measured curve 0.2 / 0.25 / 0.3 / 0.45: unioning independent
    // tables must not lose the single table's hits, and by 8 tables the
    // gain must be real (floors leave regeneration headroom).
    val byN = curve.toMap
    assert(byN(4) >= 0.25, s"4-table recall@$K = ${byN(4)} (measured 0.3; floor 0.25)")
    assert(byN(8) >= 0.35, s"8-table recall@$K = ${byN(8)} (measured 0.45; floor 0.35)")
  }

  test("multiTableLshSearch(nTables=1) reproduces lshSearch row-for-row") {
    val base = Similarity.lshSearch(emb, NQueries, K).collect().toSeq
    val gen = Similarity.multiTableLshSearch(emb, NQueries, K, 1).collect().toSeq
    assert(gen == base)
  }

  // ---- PQ family: the metric is squared L2, so the ground truth is the
  // exact L2 top-k (not the cosine `exact` above).

  private lazy val exactL2: Set[(Long, Long)] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val e = emb.withColumn("e", col("embedding").cast("array<double>"))
    val q = e.where(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val res = e.where(col("vec_id") >= NQueries)
      .crossJoin(broadcast(q))
      .withColumn("dd", expr(
        """aggregate(sequence(0, 63), CAST(0.0 AS DOUBLE),
             (acc, i) -> acc + (e[i] - qe[i]) * (e[i] - qe[i]))"""))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("dd"), col("vec_id"))))
      .where(col("rnk") <= K)
    hits(res)
  }

  private def recallL2(approx: Set[(Long, Long)]): Double =
    (approx intersect exactL2).size.toDouble / exactL2.size

  test("PQ rerank recall@5 meets its floor at the registered config") {
    // 4 subspaces × 8 codes, shortlist 50 (~10% of the corpus), exact
    // re-rank: the re-rank is exact on the shortlist, so recall equals
    // the shortlist's capture of the true top-5.
    val r = recallL2(hits(Similarity.pqRerankSearch(emb, 4, 8, NQueries, 50, K)))
    assert(r >= 0.6, s"PQ rerank recall@$K = $r (measured 0.65; floor 0.6)")
  }

  test("PQ rerank recall is monotone in shortlist size") {
    val curve = Seq(10, 25, 50).map { s =>
      s -> recallL2(hits(Similarity.pqRerankSearch(emb, 4, 8, NQueries, s, K)))
    }
    curve.sliding(2).foreach { case Seq((s1, r1), (s2, r2)) =>
      assert(r2 >= r1, s"recall dropped widening shortlist $s1->$s2: $r1 -> $r2")
    }
  }

  test("finer quantization improves the shortlist: 8 subspaces beat 4") {
    // Measured 0.9 vs 0.65 at shortlist=50 — more subspaces preserve
    // more of the vector, the accuracy/bytes dial PQ exists to expose.
    val r4 = recallL2(hits(Similarity.pqRerankSearch(emb, 4, 8, NQueries, 50, K)))
    val r8 = recallL2(hits(Similarity.pqRerankSearch(emb, 8, 8, NQueries, 50, K)))
    assert(r8 >= r4, s"8-subspace recall $r8 below 4-subspace $r4")
    assert(r8 >= 0.85, s"8-subspace recall@$K = $r8 (measured 0.9; floor 0.85)")
  }

  test("ADC bare top-k is strictly coarser than its reranked pipeline") {
    // The ADC-only ranking (q73b) is the cheap scan; re-ranking the
    // shortlist must not do worse than trusting ADC order outright.
    val bare = recallL2(hits(Similarity.pqAdcSearch(emb, 4, 8, NQueries, K)))
    val rr = recallL2(hits(Similarity.pqRerankSearch(emb, 4, 8, NQueries, 50, K)))
    assert(rr >= bare, s"rerank $rr worse than bare ADC $bare")
  }

  test("IVF-PQ residual search (q85/q85b): probes monotone, raw-ADC floor, rerank recovers") {
    // Raw residual-ADC at the registered tiny config (8 cells, 4×8
    // codes) is honestly coarse — measured 0.2 — and widening probes
    // must never lose candidates. The production tail (q85b: ADC
    // shortlist + exact re-rank) recovers to 0.75 measured: the
    // two-tier shape is what makes the coarse cheap tier acceptable.
    val raw = Seq(1, 2, NCentroids).map { np =>
      np -> recallL2(hits(Similarity.ivfPqSearch(
        emb, NCentroids, 4, 8, 3, NQueries, K, np)))
    }
    raw.sliding(2).foreach { case Seq((np1, r1), (np2, r2)) =>
      assert(r2 >= r1, s"q85 recall dropped widening nProbe $np1->$np2: $r1 -> $r2")
    }
    assert(raw.head._2 >= 0.15,
      s"raw residual-ADC recall@$K = ${raw.head._2} (measured 0.2; floor 0.15)")
    val rr = recallL2(hits(Similarity.ivfPqRerankSearch(
      emb, NCentroids, 4, 8, 3, NQueries, 50, K, 2)))
    assert(rr >= 0.6, s"IVF-PQ rerank recall@$K = $rr (measured 0.75; floor 0.6)")
    assert(rr >= raw(1)._2, s"rerank $rr worse than raw ADC ${raw(1)._2} at the same probes")
  }

  test("PCA (q88/q88b): normalized component, λ within trace, projection variance matches λ") {
    val comp = Similarity.pcaPower(emb, 6).orderBy("dim").collect()
    val v = comp.map(_.getLong(1))
    assert(v.map(math.abs).max == 10000L, "eigenvector must be max-normalized to the 1e-4 grid")
    val lam = comp.head.getLong(3)
    val trace = comp.head.getLong(4)
    assert(lam > 0L && lam <= trace, s"Rayleigh λ $lam outside (0, trace $trace]")
    // Var(x·v) = vᵀCv = λ·‖v‖² — the projection's variance must
    // reproduce the eigenvalue (grid effects allowed 5%): the check
    // that the power iteration converged onto a real component, not
    // just any normalized vector.
    val ps = Similarity.pcaProject(emb, 6).select("p").collect().map(_.getDouble(0))
    val n = ps.length.toDouble
    val mean = ps.sum / n
    val varp = ps.map(x => (x - mean) * (x - mean)).sum / n
    val expect = (lam / 1e6) * (v.map(x => x * x).sum / 1e8)
    assert(math.abs(varp - expect) / expect < 0.05,
      s"projection variance $varp vs λ·‖v‖² $expect")
    // Deflation (q88c) on the natural corpus: the synthetic embeddings
    // are near-isotropic (λ₂ within 3% of λ₁ — a flat spectrum), so
    // power iteration's gap-driven convergence is slow and near-equal
    // "components" are only approximately separated; the loose bound
    // here pins that deflation still roughly de-correlates, while the
    // separable-fixture test below pins the real convergence contract
    // (and the oracle pins cross-engine exactness regardless).
    val c2 = Similarity.pcaDeflate(emb, 6).orderBy("dim").collect()
    val v2 = c2.map(_.getLong(1))
    val lam2 = c2.head.getLong(3)
    val dot = c2.head.getLong(4)
    val cos = math.abs(dot.toDouble) /
      (math.sqrt(v.map(x => x.toDouble * x).sum) * math.sqrt(v2.map(x => x.toDouble * x).sum))
    assert(cos < 0.15, s"deflated component not de-correlated: |cos| = $cos")
    assert(lam2 > 0L && lam2 <= trace, s"λ₂ $lam2 outside (0, trace $trace]")
  }

  test("PCA on separable data: dominant direction recovered, deflated second orthogonal") {
    import spark.implicits._
    // Variance concentrated on dim 0 (range ~20), a secondary signal
    // on dim 1 (~4), then 0.01-scale wobble: a real eigen-gap, so six
    // rounds converge — v₁ snaps to the dominant axis, deflation
    // yields the secondary axis, and the two are orthogonal.
    val vecs = (0L until 200L).map { i =>
      val a = (i * 37 % 21).toDouble - 10.0
      val b = ((i * 53 % 13).toDouble - 6.0) * 0.3
      val e = Array.tabulate(64) { d =>
        (if (d == 0) a else 0.0) + (if (d == 1) b else 0.0) +
          0.01 * ((i * 31 + d * 7) % 11)
      }
      (i, i.toInt % 3, e)
    }.toDF("vec_id", "label", "embedding")
    val c1 = Similarity.pcaPower(vecs, 6).orderBy("dim").collect()
    val v1 = c1.map(_.getLong(1))
    val lam1 = c1.head.getLong(3)
    assert(math.abs(v1(0)) == 10000L, s"dominant axis must carry the max component: ${v1.toSeq}")
    val c2 = Similarity.pcaDeflate(vecs, 6).orderBy("dim").collect()
    val v2 = c2.map(_.getLong(1))
    val lam2 = c2.head.getLong(3)
    val dot = c2.head.getLong(4)
    assert(math.abs(v2(1)) == 10000L, s"second axis must dominate after deflation: ${v2.toSeq}")
    val cos = math.abs(dot.toDouble) /
      (math.sqrt(v1.map(x => x.toDouble * x).sum) * math.sqrt(v2.map(x => x.toDouble * x).sum))
    assert(cos < 0.02, s"separable components must be orthogonal: |cos| = $cos")
    assert(lam2 < lam1, s"secondary eigenvalue $lam2 must be below dominant $lam1")
  }

  test("int8 quantization (q84): every vector's MSE is bounded by the worst grid step") {
    import org.apache.spark.sql.functions._
    // An affine [0,255] grid can be off by at most step/2 per
    // dimension, so per-vector MSE ≤ max_dim (span/255)²/4 (plus the
    // 1e-9 error-quantization grain). Measured worst 8.9e-7 against
    // bound 2.7e-6 — the 4×-compression fidelity claim, pinned.
    val e = emb.withColumn("emb", col("embedding").cast("array<double>"))
    val bound = e.select(posexplode(col("emb")))
      .groupBy("pos").agg((max("col") - min("col")).as("span"))
      .agg(max(pow(col("span") / 255.0, 2) / 4.0)).head.getDouble(0)
    val worst = Similarity.int8Quantize(emb).agg(max("mse")).head.getDouble(0)
    assert(worst <= bound + 1e-9,
      s"quantization MSE $worst exceeds the grid bound $bound")
  }

  test("q103 retrievalEval edges: perfect hit, miss, and zero-label queries") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // qid 0: relevant doc at rank 1 of 2 labels; qid 1: no relevant in
    // top-k; qid 2: NO labels at all (the n_rel = 0 guard).
    val ranking = Seq(
      (0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L),
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 10L, 1L), (2L, 11L, 2L), (2L, 12L, 3L)
    ).toDF("qid", "vec_id", "rnk")
    val labels = Seq((0L, 10L), (0L, 99L), (1L, 98L)).toDF("qid", "vec_id")
    val rows = Similarity.retrievalEval(ranking, labels, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toList
    // qid 0: 2 labels, 1 hit at rank 1 -> recall 1/2, RR 1.0,
    // nDCG = round(1.0 / round(1 + 1/log2(3), 4), 4) = 0.6132.
    assert(rows(0) == (0L, 2L, 1L, 500000L, 1000000L, 0.6132), rows(0).toString)
    // qid 1: 1 label, zero hits -> everything zero.
    assert(rows(1) == (1L, 1L, 0L, 0L, 0L, 0.0), rows(1).toString)
    // qid 2: zero labels -> guarded zeros, no division blowup.
    assert(rows(2) == (2L, 0L, 0L, 0L, 0L, 0.0), rows(2).toString)
  }
}
