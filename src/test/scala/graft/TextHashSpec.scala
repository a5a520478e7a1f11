package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.sources.Tables

/** The native text-hash expressions (`minhash_sig`, `simhash48`) must be
  * bit-identical to the declarative higher-order-function folds they
  * replace — the folds are the specification (and the form the DuckDB
  * oracles mirror); the natives are only allowed to be faster.
  */
class TextHashSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("minhash_sig equals the declarative transform/array_min fold on the corpus") {
    val docs = Tables.table(spark, sf, "documents")
    val both = Dedup.withShingles(docs)
      .withColumn("native", expr(s"minhash_sig(shingles, ${Dedup.NumHashes})"))
      .withColumn("decl", expr(Dedup.declarativeSignatureSql))
    assert(both.where(not(col("native") === col("decl"))).isEmpty)
    assert(both.count() == 500)
  }

  test("minhash_sig handles adversarial inputs like the fold") {
    import spark.implicits._
    // Single-word docs (whole-text fallback), repeated shingles, unicode,
    // and strings that collide on prefixes.
    val rows = Seq(
      Seq("x"), Seq("a b c", "a b c"), Seq("é ü 漢", "0:", "1:"),
      Seq("", " ", "  "), (1 to 50).map(i => s"sh $i ngle").toSeq)
    val df = rows.toDF("shingles")
    val both = df
      .withColumn("native", expr("minhash_sig(shingles, 8)"))
      .withColumn("decl", expr(Dedup.declarativeSignatureSql))
    assert(both.where(not(col("native") === col("decl"))).isEmpty)
  }

  test("shingle3 equals the declarative 3-gram/array_distinct fold") {
    import spark.implicits._
    val docs = Tables.table(spark, sf, "documents")
    val corpus = docs.select(split(col("text"), " ").as("words"))
    // Adversarial: short inputs (fallback path), repeats (distinct path),
    // empty strings, unicode.
    val edge = Seq(
      Seq.empty[String], Seq("one"), Seq("a", "b"), Seq("a", "b", "c"),
      Seq("a", "b", "c", "a", "b", "c", "a", "b", "c"),
      Seq("", "", "", ""), Seq("é", "ü", "漢", "é", "ü", "漢"),
      // Null words: triples containing a null yield a null shingle
      // (concat semantics); the fallback path skips nulls (concat_ws).
      Seq("a", null, "b", "c", "d"), Seq(null, "x"))
      .toDF("words")
    for (df <- Seq(corpus, edge)) {
      val both = df
        .withColumn("native", expr("shingle3(words)"))
        .withColumn("decl", expr(Dedup.declarativeShinglesSql))
      assert(both.where(not(col("native") === col("decl"))).isEmpty)
    }
  }

  test("simhash48 equals the declarative majority-vote fold on the corpus") {
    val docs = Tables.table(spark, sf, "documents")
    val native = Dedup.simhash(docs)
    val decl = Dedup.declarativeSimhash(docs)
    assert(native.exceptAll(decl).isEmpty && decl.exceptAll(native).isEmpty)
    assert(native.count() == 500)
  }

  test("rolling_hash48 equals the declarative position-mixed fold on the corpus") {
    val docs = Tables.table(spark, sf, "documents")
    val native = graft.operators.TextAnalysis.fingerprints(docs)
    val decl = graft.operators.TextAnalysis.declarativeFingerprints(docs)
    assert(native.exceptAll(decl).isEmpty && decl.exceptAll(native).isEmpty)
    assert(native.count() == 500)
  }

  test("srp_bucket equals the declarative plane-literal fold on the corpus") {
    val emb = Tables.table(spark, sf, "embeddings")
    val native = Tables.table(spark, sf, "embeddings")
      .withColumn("emb", col("embedding").cast("array<double>"))
      .select(col("vec_id"), expr("srp_bucket(emb, 6)").as("bucket"))
    val decl = graft.operators.Similarity.declarativeSrpBuckets(emb, 6)
      .select(col("vec_id"), col("bucket"))
    assert(native.exceptAll(decl).isEmpty && decl.exceptAll(native).isEmpty)
    assert(native.count() > 0)
  }

  test("minhash_sig null and empty-array behavior") {
    import spark.implicits._
    val df = Seq[Option[Seq[String]]](None, Some(Seq.empty), Some(Seq("w")))
      .toDF("shingles")
    val out = df.select(expr("minhash_sig(shingles, 4)").as("sig"))
      .collect().toSeq.map(r => Option(r.get(0)).map(_.asInstanceOf[scala.collection.Seq[_]].size))
    assert(out == Seq(None, Some(0), Some(4)))
  }
}
