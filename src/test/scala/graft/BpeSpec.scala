package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis
import graft.sources.Tables

/** The BPE induction contracts the row-hash oracle can't articulate:
  * greedy left-to-right merge application on run-heavy words, the
  * round-1 decision's agreement with q78, pass-count sufficiency
  * (MergePasses reaches the merge fixpoint on the real corpus), and
  * fertility's monotone response to learning more merges.
  */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private lazy val docs =
    Tables.table(spark, "/root/testdata/sf0.001", "documents")

  test("merge application pairs runs correctly (replace-chain contract)") {
    import spark.implicits._
    // "aaaa" x2: round 1 must merge (a,a) -> "aa aa" (NOT "a aa a" or
    // three overlapping merges), so round 2's best pair is over the
    // merged symbols. This is the exact case single-pass replace gets
    // wrong without the iterated-pass scheme.
    val tiny = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrain(tiny, 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(m(0) == ((1L, "a", "a", "aa", 6L)), s"round 1: ${m(0)}")
    assert(m(1) == ((2L, "aa", "aa", "aaaa", 2L)), s"round 2: ${m(1)}")
    val seg = TextAnalysis.bpeSegmentation(tiny, 2)
      .select("syms").as[String].collect().toSeq
    assert(seg == Seq("aaaa"), s"after both merges the word is one symbol, got $seg")

    // Odd-length identical-symbol run: the DOCUMENTED deviation (see
    // MergePasses scaladoc). The iterated replace-chain merges the
    // same NUMBER of pairs as canonical BPE (floor(n/2)) but may leave
    // the unpaired singleton mid-run ("aa a aa") where canonical
    // leaves it trailing ("aa aa a"). Both engines run the identical
    // chain, so the contract is cross-engine exact; token counts are
    // canonical either way.
    val odd = Seq((1L, "aaaaa")).toDF("doc_id", "text")
    val seg1 = TextAnalysis.bpeSegmentation(odd, 1)
      .select("syms").as[String].collect().head
    assert(seg1 == "aa a aa", s"replace-chain on 5 a's, got '$seg1'")
    assert(seg1.split(" ").length == 3, "merge count must equal canonical floor(5/2) pairs + 1")
    val seg7 = TextAnalysis.bpeSegmentation(Seq((1L, "aaaaaaa")).toDF("doc_id", "text"), 1)
      .select("syms").as[String].collect().head
    assert(seg7.split(" ").count(_ == "aa") == 3 && seg7.split(" ").count(_ == "a") == 1,
      s"7-run: three pairs + one singleton like canonical, got '$seg7'")
  }

  test("round 1 reproduces the q78 merge decision on the corpus") {
    val top = TextAnalysis.bpePairCounts(docs, 1).collect().head
    val m1 = TextAnalysis.bpeTrain(docs, 1).collect().head
    assert(m1.getString(1) + m1.getString(2) == top.getString(0),
      s"round-1 pair ${m1.getString(1)}+${m1.getString(2)} vs q78 ${top.getString(0)}")
    assert(m1.getLong(4) == top.getLong(1), "counts must agree")
  }

  test("MergePasses reaches the fixpoint: re-applying any learned merge is a no-op") {
    // If a learned pair still occurred adjacently in the final
    // segmentation, the pass count was too small (or the apply order
    // broke) — one more literal replace with ANY merge must change
    // nothing, corpus-wide.
    val merges = TextAnalysis.bpeTrain(docs, 8).collect()
    val seg = TextAnalysis.bpeSegmentation(docs, 8)
    var probe = concat(lit(" "), col("syms"), lit(" "))
    merges.foreach { m =>
      probe = call_function("replace", probe,
        lit(s" ${m.getString(1)} ${m.getString(2)} "), lit("  "))
    }
    val disturbed = seg.where(trim(probe) =!= col("syms")).count()
    assert(disturbed == 0, s"$disturbed vocab words still contain a learned pair")
  }

  test("fertility is monotone: more merges never increase the subword count") {
    val f0 = TextAnalysis.bpeTokenize(docs, 1)
      .agg(sum("n_subwords")).collect()(0).getLong(0)
    val f8 = TextAnalysis.bpeTokenize(docs, 8)
      .agg(sum("n_subwords")).collect()(0).getLong(0)
    assert(f8 < f0, s"8 merges must compress below 1 merge: $f8 vs $f0")
    // And every doc's subword count is bounded by its character count
    // and bounded below by its word count.
    val viol = TextAnalysis.bpeTokenize(docs, 8)
      .where(col("n_subwords") < col("n_words")).count()
    assert(viol == 0, "a word is at least one subword")
  }
}
