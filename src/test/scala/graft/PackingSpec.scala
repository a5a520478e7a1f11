package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Packing
import graft.sources.Tables

/** Structural contracts of the sequence packers (Q59/Q59b) that the
  * row-hash oracle can't articulate: chunk packing must tile the token
  * stream with zero waste, greedy packing must respect the budget
  * except for oversized singletons and must be locally tight (no doc
  * could have stayed in the previous bin).
  */
class PackingSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private val Budget = 256L

  private lazy val docs =
    Tables.table(spark, "/root/testdata/sf0.001", "documents")

  private case class Chunked(
      docId: Long, shard: Long, nTokens: Long, tokStart: Long,
      seqFirst: Long, seqLast: Long, nSeqs: Long, seqOffset: Long)

  private lazy val chunked: Seq[Chunked] =
    Packing.chunkPack(docs, Budget).collect().toSeq.map(r => Chunked(
      r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))

  test("chunk packing: per-shard offsets are the exact cumulative token stream") {
    chunked.groupBy(_.shard).foreach { case (shard, rows) =>
      val ordered = rows.sortBy(_.docId)
      var cum = 0L
      ordered.foreach { r =>
        assert(r.tokStart == cum, s"shard $shard doc ${r.docId}: start ${r.tokStart} != $cum")
        assert(r.seqFirst == r.tokStart / Budget)
        assert(r.seqLast == (r.tokStart + r.nTokens - 1) / Budget)
        assert(r.nSeqs == r.seqLast - r.seqFirst + 1)
        assert(r.seqOffset == r.tokStart % Budget)
        cum += r.nTokens
      }
    }
  }

  test("chunk packing tiles with zero waste: every interior sequence holds exactly `budget` tokens") {
    chunked.groupBy(_.shard).foreach { case (shard, rows) =>
      val total = rows.map(_.nTokens).sum
      val lastSeq = (total - 1) / Budget
      // Coverage of sequence s = sum over docs of overlap between the
      // doc's token span and [s·B, (s+1)·B).
      val coverage = new scala.collection.mutable.HashMap[Long, Long]().withDefaultValue(0L)
      rows.foreach { r =>
        (r.seqFirst to r.seqLast).foreach { s =>
          val lo = math.max(r.tokStart, s * Budget)
          val hi = math.min(r.tokStart + r.nTokens, (s + 1) * Budget)
          coverage(s) += hi - lo
        }
      }
      (0L until lastSeq).foreach { s =>
        assert(coverage(s) == Budget, s"shard $shard seq $s covered ${coverage(s)} != $Budget")
      }
      assert(coverage(lastSeq) == total - lastSeq * Budget, s"shard $shard tail seq")
      assert(coverage.keySet == (0L to lastSeq).toSet, s"shard $shard skipped a sequence")
    }
  }

  private case class Greedy(docId: Long, shard: Long, bin: Long, fill: Long)

  private lazy val greedy: Seq[Greedy] =
    Packing.greedyPackDf(docs, Budget).collect().toSeq
      .map(r => Greedy(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  private lazy val tokensOf: Map[Long, Long] =
    chunked.map(r => r.docId -> r.nTokens).toMap

  test("greedy packing: fills respect the budget, bins are contiguous and tight") {
    greedy.groupBy(_.shard).foreach { case (shard, rows) =>
      val ordered = rows.sortBy(_.docId)
      // Bins start at 0 and advance by at most 1 per doc.
      assert(ordered.head.bin == 0L)
      ordered.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b.bin == a.bin || b.bin == a.bin + 1,
            s"shard $shard: bin jump ${a.bin} -> ${b.bin}")
          if (b.bin == a.bin) {
            assert(b.fill == a.fill + tokensOf(b.docId), "fill must accumulate within a bin")
            assert(b.fill <= Budget, s"shard $shard doc ${b.docId}: joined bin but fill ${b.fill} > $Budget")
          } else {
            assert(b.fill == tokensOf(b.docId), "a new bin starts at the doc's own size")
            // Tightness: the doc that opened bin b+1 would have
            // overflowed bin b — greedy never opens a bin early.
            assert(a.fill + tokensOf(b.docId) > Budget,
              s"shard $shard doc ${b.docId} opened a new bin but would have fit (${a.fill} + ${tokensOf(b.docId)})")
          }
        case _ => ()
      }
      // Per-bin fill of the last member equals the bin's token sum.
      ordered.groupBy(_.bin).foreach { case (bin, members) =>
        val sum = members.map(m => tokensOf(m.docId)).sum
        assert(members.maxBy(_.docId).fill == sum, s"shard $shard bin $bin final fill != token sum")
      }
    }
  }

  test("greedy packing: an oversized document occupies a bin alone, unsplit") {
    import spark.implicits._
    // Budget 10; doc 1 (shard 1) has 25 tokens — larger than the whole
    // budget — flanked by small docs in the same shard.
    val fixture = Seq(
      (1L, Seq.fill(25)("w").mkString(" ")),
      (9L, "a b c"),
      (17L, "d e f g")
    ).toDF("doc_id", "text")
    val out = Packing.greedyPackDf(fixture, budget = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // doc 1 opens bin 0 alone with fill 25 (> budget, never split);
    // doc 9 cannot join (25 + 3 > 10) → bin 1; doc 17 fits with doc 9.
    assert(out.toSeq == Seq((1L, 0L, 25L), (9L, 1L, 3L), (17L, 1L, 7L)))
  }

  test("sequence manifest: interior sequences carry exactly `budget` tokens, ids bracket correctly") {
    val manifest = Packing.sequenceManifest(docs, Budget).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    val byShard = manifest.groupBy(_._1._1)
    chunked.groupBy(_.shard).foreach { case (shard, rows) =>
      val total = rows.map(_.nTokens).sum
      val lastSeq = (total - 1) / Budget
      val seqs = byShard(shard).map { case ((_, s), v) => s -> v }.toMap
      assert(seqs.keySet == (0L to lastSeq).toSet, s"shard $shard manifest skipped a sequence")
      (0L until lastSeq).foreach { s =>
        assert(seqs(s)._2 == Budget, s"shard $shard seq $s tokens ${seqs(s)._2} != $Budget")
      }
      assert(seqs(lastSeq)._2 == total - lastSeq * Budget)
      // Doc-id ranges: first/last doc of each sequence are consistent
      // with the per-doc spans from chunkPack.
      rows.foreach { r =>
        (r.seqFirst to r.seqLast).foreach { s =>
          assert(seqs(s)._3 <= r.docId && r.docId <= seqs(s)._4,
            s"shard $shard seq $s does not bracket doc ${r.docId}")
        }
      }
      // n_docs per sequence equals the number of per-doc spans touching it.
      val touch = rows.flatMap(r => (r.seqFirst to r.seqLast).map(s => s -> r.docId))
        .groupBy(_._1).view.mapValues(_.size).toMap
      seqs.foreach { case (s, (nDocs, _, _, _)) =>
        assert(nDocs == touch(s), s"shard $shard seq $s n_docs $nDocs != ${touch(s)}")
      }
    }
  }

  test("sliding chunks: full coverage, exact overlap, no trailing duplicate") {
    val size = 64; val stride = 32
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val chunks = Packing.slidingChunks(docs, size, stride)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val lens = docs.selectExpr("doc_id", "CAST(size(split(text, ' ')) AS LONG) AS n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.keySet == lens.keySet)
    chunks.foreach { case (doc, cs) =>
      val n = lens(doc)
      val sorted = cs.sortBy(_._2)
      // Contiguous indices from 0; starts on the stride grid.
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong))
      sorted.foreach { case (_, idx, start, cTok) =>
        assert(start == idx * stride)
        assert(cTok == math.min(n - start, size.toLong) && cTok > 0)
      }
      // Full coverage: the last chunk reaches the end of the doc...
      val (_, _, lastStart, lastTok) = sorted.last
      assert(lastStart + lastTok == n)
      // ...and is the FIRST window that does (no trailing duplicate
      // window fully contained in its predecessor).
      if (sorted.length > 1) assert(sorted.dropRight(1).last._3 + size < n || n <= size)
      // Exact chunk count.
      assert(sorted.length == 1 + math.ceil(math.max(n - size, 0).toDouble / stride).toLong)
    }
  }

  test("pack stats agree with a driver-side replay of the greedy assignment") {
    val stats = Packing.packStats(docs, Budget).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    greedy.groupBy(_.shard).foreach { case (shard, rows) =>
      val (nBins, nDocs, totalTokens, maxBin, util) = stats(shard)
      val binTotals = rows.groupBy(_.bin).map { case (_, ms) => ms.map(m => tokensOf(m.docId)).sum }
      assert(nBins == rows.map(_.bin).distinct.size)
      assert(nDocs == rows.size)
      assert(totalTokens == rows.map(r => tokensOf(r.docId)).sum)
      assert(maxBin == binTotals.max)
      val expected = math.floor(totalTokens.toDouble / (nBins * Budget) * 1e4 + 0.5) / 1e4
      assert(util == expected, s"shard $shard utilization $util != $expected")
      assert(util > 0.5 && util <= 1.0, s"shard $shard utilization $util out of sane range")
    }
  }
}
