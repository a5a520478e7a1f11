package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Html
import graft.sources.Tables
import org.apache.spark.sql.functions.col

/** HTML extraction contract (q91 family): the declarative parse chain
  * recovers exactly the generator's closed form from REAL markup bytes
  * (entities decoded, script/comment data excluded, chrome dropped by
  * link density), degrades to empty fields on markup-free input, and
  * stays UDF-free (whole-stage-codegen'd regexp/string expressions).
  */
class HtmlSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private lazy val docs =
    Tables.table(spark, "/root/testdata/sf0.001", "documents").limit(8)

  test("q91: extraction recovers the closed form — entities decoded, script/comment excluded") {
    val byId = docs.select("doc_id", "text", "lang").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val got = Html.extractText(docs).collect()
    assert(got.length == byId.size)
    got.foreach { r =>
      val id = r.getLong(0)
      val (text, lang) = byId(id)
      assert(r.getString(1) == s"doc $id", "title must come from <title> content")
      val expectedBody = s"home about contact $text q&a $lang " +
        s"© site${id % 5}.example — terms · privacy"
      assert(r.getString(2) == expectedBody,
        s"doc $id: body text drift\n got: ${r.getString(2)}\nwant: $expectedBody")
      assert(r.getLong(3) == 5L, "5 anchors per page")
      val nParas = math.ceil(text.split(" ").length / 8.0).toLong + 1
      assert(r.getLong(4) == nParas,
        "paragraph count must ignore the <p> inside the script string")
    }
  }

  test("q91b: link-density boilerplate removal keeps prose, drops nav/footer chrome") {
    val byId = docs.select("doc_id", "text", "lang").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    Html.mainContent(docs).collect().foreach { r =>
      val id = r.getLong(0)
      val (text, lang) = byId(id)
      assert(r.getString(1) == s"$text q&a $lang",
        s"doc $id: main content must be the paragraphs + tags line only")
      val nParas = math.ceil(text.split(" ").length / 8.0).toLong
      assert(r.getLong(2) == nParas + 3, "blocks = paras + tags + nav + footer")
      assert(r.getLong(3) == nParas + 1, "kept = paras + tags")
    }
  }

  test("q91c: anchors extracted in document order with hrefs and decoded text") {
    val rows = Html.links(docs.limit(1)).collect()
    assert(rows.length == 5)
    val id = rows.head.getLong(0)
    val site = s"site${id % 5}.example"
    assert(rows.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(rows.map(_.getString(2)).toSeq == Seq(
      s"https://$site/home", s"https://$site/about", s"https://$site/contact",
      "/terms", "/privacy"))
    assert(rows.map(_.getString(3)).toSeq ==
      Seq("home", "about", "contact", "terms", "privacy"))
  }

  test("malformed / markup-free input yields empty fields, never a throw") {
    import spark.implicits._
    val pages = Seq(
      (1L, "just plain text, no markup at all"),
      (2L, "<html><head><title>only a title"),  // unterminated
      (3L, ""),
      (4L, "<body><p>loose <b>bold</b> tail</p>")  // no </body>
    ).toDF("doc_id", "html")
    val got = Html.extractFromPages(pages).collect()
    assert(got.length == 4)
    val byId = got.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getString(1) == "" && byId(1L).getString(2) == "")
    assert(byId(1L).getLong(3) == 0L && byId(1L).getLong(4) == 0L)
    assert(byId(2L).getString(1) == "", "unterminated <title> must not match")
    assert(byId(3L).getString(2) == "")
    assert(byId(4L).getString(2) == "", "no </body> → no body match")
    // The block/link extractors share the fallback contract.
    assert(Html.mainContentFromPages(pages).count() == 4)
    assert(Html.linksFromPages(pages).count() == 0)
  }

  test("q92: URL canonicalization handles ports, case, slashes, fragments, params") {
    import spark.implicits._
    val urls = Seq(
      (1L, "HTTPS://Host.Example:443/A/B/?z=1&a=2#f"),   // default port + trailing slash + frag
      (2L, "http://host.example:80/"),                    // default http port, root path
      (3L, "http://host.example:8080/x"),                 // NON-default port kept
      (4L, "https://host.example"),                       // no path → '/'
      (5L, "https://host.example/CaseKept/Path"),         // path case preserved
      (6L, "not a url at all"),                           // unparseable → NULL
      (7L, "https://host.example/p?single=1")             // one param, no sort change
    ).toDF("doc_id", "url")
    val got = Html.urlNormalizeCol(urls).collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), r.getString(2), r.getLong(3))).toMap
    assert(got(1L) == (Some("https://host.example/A/B?a=2&z=1"), "host.example", 2L))
    assert(got(2L) == (Some("http://host.example/"), "host.example", 0L))
    assert(got(3L) == (Some("http://host.example:8080/x"), "host.example", 0L))
    assert(got(4L) == (Some("https://host.example/"), "host.example", 0L))
    assert(got(5L)._1.get.endsWith("/CaseKept/Path"), "path case must be preserved")
    assert(got(6L)._1.isEmpty, "garbage input normalizes to NULL, never throws")
    assert(got(7L) == (Some("https://host.example/p?single=1"), "host.example", 1L))
  }

  test("q92: canonicalization is IDEMPOTENT — normalizing a normalized URL is a fixpoint") {
    import spark.implicits._
    // The canonical-form contract every URL-dedup key needs: a second
    // pass must change nothing, or two crawls of the same page can
    // disagree on the key depending on how many normalizations each
    // went through. Salted corpus + handcrafted edges.
    val edges = Seq(
      (9001L, "HTTP://Host.EX:80/A//"),
      (9002L, "https://h.ex"),
      (9003L, "https://h.ex:8443/Keep/Case?z=1&a=2"),
      (9004L, "http://h.ex:443/p"),
      (9005L, "not a url at all")).toDF("doc_id", "url")
    val corpus = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .selectExpr("doc_id", s"${Html.urlSaltSql} AS url")
    val once = Html.urlNormalizeCol(corpus.unionAll(edges))
    val normed = once.where(col("url_norm").isNotNull)
      .select(col("doc_id"), col("url_norm").as("url"))
    val twice = Html.urlNormalizeCol(normed)
    assert(normed.count() > 0)
    assert(once.where(col("url_norm").isNotNull).select("doc_id", "url_norm", "host", "n_params")
      .collect().toSeq ==
      twice.select("doc_id", "url_norm", "host", "n_params").collect().toSeq,
      "normalize(normalize(u)) must equal normalize(u) on every parseable URL")
    // And the unparseable row stayed NULL rather than leaking through.
    assert(once.where(col("doc_id") === 9005L).first().isNullAt(1))
  }

  test("plan audit: the parse chain is UDF-free (codegen-eligible expressions only)") {
    val plan = Html.extractText(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"extraction must be built-in expressions only:\n$plan")
  }
}
