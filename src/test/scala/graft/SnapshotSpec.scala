package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.lit
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Snapshot, TextAnalysis}

/** Fixture contracts for the snapshot diff (Q60) and repetition metrics
  * (Q61) that the corpus row-hash oracle states only in aggregate:
  * every diff status on a hand-built pair of snapshots, the
  * repetition extremes (all-same vs all-distinct documents), and the
  * scale property that neither operator moves document text through a
  * shuffle.
  */
class SnapshotSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("diff classifies all four statuses on a hand-built snapshot pair") {
    import spark.implicits._
    val oldV = Seq(
      (1L, "alpha beta"),   // unchanged
      (2L, "gamma delta"),  // changed in new
      (3L, "epsilon")       // removed in new
    ).toDF("doc_id", "text")
    val newV = Seq(
      (1L, "alpha beta"),
      (2L, "gamma delta REVISED"),
      (4L, "zeta eta")      // added in new
    ).toDF("doc_id", "text")

    val rows = Snapshot.diff(oldV, newV).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(rows == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))

    val summary = Snapshot.diffSummary(oldV, newV).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary == Map("added" -> 1L, "changed" -> 1L, "removed" -> 1L, "unchanged" -> 1L))
  }

  test("diff never shuffles document text — only digests cross the exchange") {
    import spark.implicits._
    val docs = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val plan = Snapshot.diff(docs, docs)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // The hash is projected before the join, so no Exchange carries the
    // raw text column (scan-level references are fine).
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty, "expected a shuffle for the full-outer join")
    assert(!exchanges.exists(_.contains("text")),
      s"document text crossed a shuffle:\n$plan")
  }

  test("repetition metrics on hand-built extremes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x x x"),          // one token repeated: top_tok 4, 1 type
      (2L, "a b c d"),          // all distinct: top_tok 1
      (3L, "a b a b a"),        // alternating: top bigram "a b" ×2
      (4L, "solo")              // single token: no bigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(docs).collect()
      .map(r => r.getLong(0) -> r).toMap

    val d1 = out(1L)
    assert(d1.getLong(1) == 4 && d1.getLong(2) == 1 && d1.getLong(3) == 4)
    assert(d1.getDouble(4) == 1.0)              // top_tok_frac
    assert(d1.getLong(6) == 1 && d1.getLong(7) == 3) // "x x" ×3
    assert(d1.getDouble(8) == 1.0)              // top_bigram_frac 3/3

    val d2 = out(2L)
    assert(d2.getLong(3) == 1 && d2.getDouble(4) == 0.25)
    assert(d2.getDouble(9) == 1.0)              // distinct_bigram_ratio 3/3

    val d3 = out(3L)
    assert(d3.getLong(3) == 3)                  // "a" ×3
    assert(d3.getLong(7) == 2)                  // "a b" ×2 of 4 bigrams
    assert(d3.getDouble(8) == 0.5)

    val d4 = out(4L)
    assert(d4.getLong(5) == 0)                  // n_bigrams
    assert(d4.isNullAt(8) && d4.isNullAt(9))    // fracs undefined
  }

  test("curation funnel: every gate fires on a hand-built corpus, counts are cumulative") {
    import spark.implicits._
    val good = "the data of and to in pipeline filters documents cleanly across stages" // 12 toks, stopword-rich
    val docs = Seq(
      (1L, good),                         // survives everything
      (2L, good),                         // exact dup of 1 → killed at dedup
      (3L, "short text"),                 // killed at length (2 < 5)
      // quality 0.41 (passes) but "the" is 5/8 of tokens → repetition kill
      (4L, "the the the the the data x y"),
      // ttr 0.5, no stopwords → quality 0.224 < 0.3 (top token only 1/4)
      (5L, "z1 z1 z2 z2 z3 z3 z4 z4")
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")) // qualityCore's language-ID check needs it
    val out = TextAnalysis.curationFunnel(docs,
      minTok = 5L, maxTok = 50L, minQuality = 0.3, maxTopTokFrac = 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a0_ingested") == 5)
    assert(out("a1_length") == 4)     // doc 3 out
    assert(out("a2_quality") == 3)    // doc 5 out
    assert(out("a3_repetition") == 2) // doc 4 out
    assert(out("a4_dedup") == 1)      // doc 2 out (dup of 1)
    // Monotone by construction.
    val ordered = Seq("a0_ingested", "a1_length", "a2_quality", "a3_repetition", "a4_dedup").map(out)
    assert(ordered == ordered.sorted.reverse)
  }

  test("repetition is a single map-only scan — no shuffle except the output sort") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = TextAnalysis.repetition(docs)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // The only exchange allowed is the rangepartitioning for the final
    // ORDER BY — no hashpartitioning (i.e. no aggregate/join shuffle).
    assert(!plan.contains("hashpartitioning"),
      s"per-document metric shuffled row data:\n$plan")
  }
}
