package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curation
import graft.sources.Tables

/** Semantic contracts of the curation operators (Q68–Q72) that the
  * row-hash oracle can't articulate: the scrubber's planted-PII
  * accounting and zero-residual guarantee, the source cap's agreement
  * with the windowed formulation it replaces, span-dedup's
  * first-occurrence-wins rule on crafted duplicates, the shuffle's
  * determinism/density, and the classifier's integer-exactness against
  * an independent explode-based formulation.
  */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftSession.registerUdafs(s)
    s
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private lazy val docs =
    Tables.table(spark, "/root/testdata/sf0.001", "documents")

  test("q68: planted PII is found exactly and nothing survives redaction") {
    val rows = Curation.piiScrub(docs)
      .select("doc_id", "n_emails", "n_ips", "n_phones", "n_residual")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, e, ip, ph, res) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // The corpus text is letters-only words, so the only matches are
      // the salt's: one email, one IP, a phone iff doc_id % 3 == 0.
      assert(e == 1, s"doc $id emails $e")
      assert(ip == 1, s"doc $id ips $ip")
      assert(ph == (if (id % 3 == 0) 1 else 0), s"doc $id phones $ph")
      assert(res == 0, s"doc $id residual $res")
    }
  }

  test("q69: the bounded-buffer cap agrees with the windowed top-k it replaces") {
    import org.apache.spark.sql.expressions.Window
    val got = Curation.sourceCap(docs)
      .select("source", "rnk", "doc_id", "quality").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val want = graft.operators.TextAnalysis.qualityCore(docs)
      .withColumn("rnk", row_number().over(
        Window.partitionBy("source").orderBy(col("quality").desc, col("doc_id"))).cast("long"))
      .where(col("rnk") <= 10)
      .select("source", "rnk", "doc_id", "quality").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == want)
    // Ranks are dense 1..k per source and quality is non-increasing.
    got.groupBy(_._1).foreach { case (src, rs) =>
      val byRank = rs.toSeq.sortBy(_._2)
      assert(byRank.map(_._2) == (1L to byRank.size).toSeq, s"ranks not dense in $src")
      assert(byRank.map(_._4).zip(byRank.map(_._4).tail).forall { case (a, b) => a >= b },
        s"quality not sorted in $src")
    }
  }

  test("q70: first occurrence wins — across documents, and within one") {
    import spark.implicits._
    val a = (1 to 20).map(i => s"a$i").mkString(" ")     // chunks A0, A1
    val shared = (1 to 10).map(i => s"a$i").mkString(" ") // == A0
    val b = shared + " " + (1 to 10).map(i => s"b$i").mkString(" ")
    val selfDup = shared + " " + shared                   // A0 twice more
    val tiny = Seq((1L, a), (2L, b), (3L, selfDup)).toDF("doc_id", "text")
    val out = Curation.spanDedup(tiny, 10).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(out(1L) == ((2L, 2L, 20L)), s"doc1 ${out(1L)}") // first sighting keeps all
    assert(out(2L) == ((2L, 1L, 10L)), s"doc2 ${out(2L)}") // shared chunk dropped
    assert(out(3L) == ((2L, 0L, 0L)), s"doc3 ${out(3L)}")  // both copies dropped
  }

  test("q70b: a duplicate span OFFSET from the chunk grid is invisible to q70 and caught here") {
    import spark.implicits._
    // Doc 1 carries span S = s1..s10 grid-ALIGNED (positions 0-9).
    // Doc 2 carries the same S at positions 5-14 — misaligned with the
    // span-10 grid, so every grid-0 chunk of doc 2 digests differently
    // and plain spanDedup keeps all of doc 2 (the Lee-et-al. exact-
    // substring blind spot). The offset grid (start 5) slices doc 2's
    // S exactly, and first-seen ACROSS grids matches it against doc
    // 1's aligned copy.
    val s = (1 to 10).map(i => s"s$i").mkString(" ")
    val doc1 = s + " " + (1 to 10).map(i => s"x$i").mkString(" ")
    val doc2 = (1 to 5).map(i => s"y$i").mkString(" ") + " " + s + " " +
      (1 to 5).map(i => s"z$i").mkString(" ")
    val tiny = Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")

    // Plain q70 misses it: doc 2 keeps every chunk.
    val plain = Curation.spanDedup(tiny, 10).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(plain(2L) == ((2L, 2L)), s"fixture must defeat the fixed grid, got ${plain(2L)}")

    // q70b catches exactly S's 10 tokens in doc 2 and nothing in doc 1.
    val offs = Curation.spanDedupOffsets(tiny, 10).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(offs(1L) == ((20L, 0L)), s"doc1 is the first sighting, got ${offs(1L)}")
    assert(offs(2L) == ((20L, 10L)), s"doc2's offset copy of S must be flagged, got ${offs(2L)}")
  }

  test("q70b: dup coverage is a superset of q70's dropped-chunk mass on the natural corpus") {
    // Every token q70 drops sits in a non-first grid-0 instance, which
    // is also a non-first instance (same digest, same order rule) in
    // the dual-grid pass — so per doc, n_dup_tokens >= q70's
    // (n_tokens - n_tokens_kept). The offset grid can only ADD mass.
    val plain = Curation.spanDedup(docs, 10)
      .select(col("doc_id"), (col("n_tokens") - col("n_tokens_kept")).as("dropped"))
    val offs = Curation.spanDedupOffsets(docs, 10)
      .select(col("doc_id"), col("n_dup_tokens"), col("n_tokens"))
    val joined = plain.join(offs, "doc_id")
    assert(joined.where(col("n_dup_tokens") < col("dropped")).count() == 0)
    val bounds = joined.where(col("n_dup_tokens") > col("n_tokens")).count()
    assert(bounds == 0, "dup coverage can never exceed the doc's tokens")
  }

  test("q70c: a duplicate at a phase BOTH fixed grids miss is caught by the content-defined grid") {
    import spark.implicits._
    // The portable 48-bit hash, replicated locally to classify tokens
    // as anchors (hash % 8 == 0) the same way the operator does.
    def h48(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 12), 16)
    }
    val pool = (1 to 400).map(i => s"t$i")
    val anchorToks = pool.filter(h48(_) % 8 == 0)
    val plainToks = pool.filter(h48(_) % 8 != 0)
    assert(anchorToks.size >= 2 && plainToks.size >= 30)
    val p = plainToks.iterator
    def plains(n: Int) = Seq.fill(n)(p.next())
    // S: 12 tokens with two interior anchors — the chunk [A0 .. A1) (5
    // tokens) is bounded by CONTENT on both sides, so it digests
    // identically wherever S lands.
    val sTok = plains(3) ++ Seq(anchorToks(0)) ++ plains(4) ++
      Seq(anchorToks(1)) ++ plains(3)
    val s = sTok.mkString(" ")
    val doc1 = s + " " + plains(8).mkString(" ")
    // Doc 2 repeats S at offset 3 — ≢ 0 and ≢ 5 (mod 10), so NO
    // span-10 fixed-grid chunk of doc 2 aligns with doc 1's.
    val doc2 = plains(3).mkString(" ") + " " + s + " " + plains(9).mkString(" ")
    val tiny = Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")

    val offs = Curation.spanDedupOffsets(tiny, 10).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(offs(2L) == 0L,
      s"fixture must defeat both fixed grids, got ${offs(2L)} dup tokens")

    val anch = Curation.spanDedupAnchored(tiny, 10, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(anch(1L) == 0L, s"doc1 is the first sighting, got ${anch(1L)}")
    assert(anch(2L) == 5L,
      s"the interior content-defined chunk (5 tokens) must be flagged, got ${anch(2L)}")
  }

  test("q70c: coverage is a superset of q70b on the natural corpus") {
    // All fixed-grid instances are retained and extra instances can
    // only demote first-sightings — never promote a dup back.
    val offs = Curation.spanDedupOffsets(docs, 10)
      .select(col("doc_id"), col("n_dup_tokens").as("d2"))
    val anch = Curation.spanDedupAnchored(docs, 10, 8)
      .select(col("doc_id"), col("n_dup_tokens").as("d3"), col("n_tokens"))
    val joined = offs.join(anch, "doc_id")
    assert(joined.where(col("d3") < col("d2")).count() == 0,
      "anchored coverage regressed below the dual-grid coverage")
    assert(joined.where(col("d3") > col("n_tokens")).count() == 0)
  }

  test("q70: kept chunk instances equal distinct chunk contents corpus-wide") {
    val out = Curation.spanDedup(docs, 10)
    val kept = out.agg(sum("n_kept")).collect()(0).getLong(0)
    val distinctChunks = docs
      .withColumn("words", split(col("text"), " "))
      .select(explode(expr(
        """transform(sequence(0, CAST(ceil(size(words) / 10.0) AS INT) - 1),
             i -> array_join(slice(words, i * 10 + 1, 10), ' '))""")).as("c"))
      .agg(countDistinct("c")).collect()(0).getLong(0)
    assert(kept == distinctChunks, s"$kept kept vs $distinctChunks distinct")
  }

  test("q71: shuffle is deterministic, shards bounded, positions dense, nothing lost") {
    val out = Curation.globalShuffle(docs, 16, "g5").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val again = Curation.globalShuffle(docs, 16, "g5").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == again.toSeq, "shuffle not deterministic")
    assert(out.forall(r => r._1 >= 0 && r._1 < 16))
    out.groupBy(_._1).foreach { case (shard, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.size).toSeq,
        s"positions not dense in shard $shard")
    }
    assert(out.map(_._3).toSet == docs.select("doc_id").collect().map(_.getLong(0)).toSet)
    // A different salt produces a different permutation (sanity that the
    // salt actually feeds the hash).
    val salted = Curation.globalShuffle(docs, 16, "other").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(salted.toSeq != out.toSeq, "salt has no effect")
  }

  test("q74: manifest docs pass every gate, respect the cap, and shard deterministically") {
    import graft.operators.TextAnalysis
    val out = Curation.corpusPipeline(docs, 20L, 90L, 0.37, 0.12, 16, "g5")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // Independent pure-Scala recompute of gates + cap on the raw corpus.
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    val raw = docs.select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val firstOfText = raw.groupBy(_._2).map { case (t, rs) => t -> rs.map(_._1).min }
    val kept = raw.flatMap { case (id, text, src) =>
      val ws = text.split(" ")
      val n = ws.length
      val ttr = r4(ws.distinct.length.toDouble / n)
      val stop = r4(ws.count(TextAnalysis.Stopwords.contains).toDouble / n)
      val q = r4(0.3 * math.min(1.0, n / 100.0) + 0.4 * ttr + 0.3 * stop)
      val top = r4(ws.groupBy(identity).values.map(_.size).max.toDouble / n)
      if (n >= 20 && n <= 90 && q >= 0.37 && top <= 0.12 && firstOfText(text) == id)
        Some((src, q, id))
      else None
    }
    val expected = kept.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      rs.sortBy(r => (-r._2, r._3)).take(10).toSeq
    }.map(_._3).toSet
    assert(out.map(_._3).toSet == expected,
      s"manifest ids ${out.map(_._3).toSet} != expected $expected")
    out.groupBy(_._4).foreach { case (src, rows) =>
      assert(rows.size <= 10, s"source $src over cap: ${rows.size}")
    }
    // Shard placement is exactly the q71 rule for the surviving id set.
    val shardOf = Curation.globalShuffle(docs, 16, "g5").collect()
      .map(r => r.getLong(2) -> r.getLong(0)).toMap
    out.foreach { case (shard, _, id, _) =>
      assert(shard == shardOf(id), s"doc $id shard $shard != ${shardOf(id)}")
    }
    // Positions dense per shard.
    out.groupBy(_._1).foreach { case (shard, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.size).toSeq,
        s"positions not dense in shard $shard")
    }
  }

  test("q72: the per-row fold matches an independent explode-sum formulation exactly") {
    val got = Curation.hashedClassifier(docs)
      .select("doc_id", "score_raw").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = "CAST(conv(substring(md5(concat('w:', tok)), 1, 12), 16, 10) AS BIGINT) % 2001 - 1000"
    val want = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id").agg(sum(expr(w)).as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    val margins = Curation.hashedClassifier(docs).select("margin").collect().map(_.getDouble(0))
    assert(margins.forall(m => m >= -1.0 && m <= 1.0))
  }

  test("q83: dup n-gram coverage counts exactly the cross-document shared positions") {
    import spark.implicits._
    // Doc 1: 10 unique tokens (3 8-grams, none shared). Doc 2 repeats
    // doc 1's first 8 tokens then diverges; doc 3 is fully unique.
    // The shared 8-token run is ONE 8-gram — position 0 in both docs.
    val d1 = (1 to 10).map(i => s"a$i").mkString(" ")
    val d2 = (1 to 8).map(i => s"a$i").mkString(" ") + " q1 q2"
    val d3 = (1 to 10).map(i => s"c$i").mkString(" ")
    val tiny = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val out = Curation.dupNgramCoverage(tiny, 8, 0.2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    assert(out(1L) == ((3L, 1L, true)), s"doc1 ${out(1L)}")
    assert(out(2L) == ((3L, 1L, true)), s"doc2 ${out(2L)}")
    assert(out(3L) == ((3L, 0L, false)), s"doc3 ${out(3L)}")
  }

  test("q83: coverage is symmetric-aware and bounded on the natural corpus") {
    val out = Curation.dupNgramCoverage(docs, 8, 0.2)
    // n_dup ≤ n_grams always; flagged ⇔ dup_frac ≥ threshold.
    assert(out.where(col("n_dup_grams") > col("n_grams")).isEmpty)
    assert(out.where(col("flagged") && col("dup_frac") < 0.2).isEmpty)
    assert(out.where(!col("flagged") && col("dup_frac") >= 0.2).isEmpty)
    // A duplicated n-gram needs ≥2 docs, so the number of docs with
    // nonzero coverage is 0 or ≥2 — never exactly one.
    val nonzero = out.where(col("n_dup_grams") > 0).count()
    assert(nonzero != 1, "exactly one doc with shared n-grams is impossible")
  }
}
