package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTML/markup text extraction — the first stage of a web-scale
  * training pipeline (every crawl corpus starts as markup, not text;
  * north-star surface, no reference anchor). Three operators over a
  * deterministic in-engine HTML rendering of the documents table (the
  * q21d/f fixture pattern: generate REAL markup with known closed
  * form, then parse the actual bytes back, so the oracle catches a
  * tag misparse, an entity left undecoded, or script text leaking
  * into content):
  *
  *   - [[extractText]] (q91): strip comments/script/style, strip
  *     tags, decode entities, collapse whitespace — title + full body
  *     text + link/paragraph counts.
  *   - [[mainContent]] (q91b): boilerplate removal — segment the body
  *     into blocks and keep low-link-density ones (the text-to-tag
  *     density heuristic of jusText/trafilatura-class extractors);
  *     nav/footer chrome drops, content paragraphs survive.
  *   - [[links]] (q91c): anchor extraction — (href, anchor text) per
  *     document in document order.
  *
  * Scale shape: the parse is a per-row chain of codegen'd regexp/
  * string expressions — map-only, no shuffle, no UDF, no driver work;
  * the only exchange in any of the three queries is the final
  * presentation sort. The generator is imperative Scala (fixture
  * code, the y4mBlob precedent); the operators under test are pure
  * Spark SQL expressions and never see the generator.
  */
object Html {

  /** Deterministic page for a document: real-world chrome the
    * extractor must defeat — a comment, a style block, a script whose
    * BODY contains markup-looking text (`<p>` inside a string) and
    * unescaped `<`/`&&` (legal in script data, lethal to a naive
    * tag-stripper), a link-heavy nav, content paragraphs with
    * `&nbsp;` entities mid-sentence, an entity-bearing tags line
    * (`q&amp;a`), and a link-heavy footer with `&copy;`/`&mdash;`/
    * `&middot;`.
    */
  def pageFor(id: Long, text: String, lang: String): String = {
    val site = s"site${id % 5}.example"
    val paras = text.split(" ").grouped(8).map { g =>
      val inner =
        if (g.length >= 2) g.head + "&nbsp;" + g.tail.mkString(" ")
        else g.mkString(" ")
      s"<p>$inner</p>"
    }.mkString("\n")
    s"""<!DOCTYPE html>
<html>
<head>
<title>doc $id</title>
<style>
body { color: #333; font-size: 14px; }
</style>
<script type="text/javascript">
var x = 1 < 2 && $id > 0; var s = "<p>not content</p>";
</script>
</head>
<body>
<!-- chrome: not content -->
<nav><a href="https://$site/home">home</a> <a href="https://$site/about">about</a> <a href="https://$site/contact">contact</a></nav>
<main>
$paras
<p class="tags">q&amp;a $lang</p>
</main>
<footer>&copy; $site &mdash; <a href="/terms">terms</a> &middot; <a href="/privacy">privacy</a></footer>
</body>
</html>"""
  }

  /** (doc_id, html): the rendered corpus. Fixture-side imperative
    * Scala (like Multimodal.y4mBlob); everything downstream is
    * declarative.
    */
  def htmlDocs(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    graft.sources.Tables.widen(docs)
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .map { case (id, text, lang) => (id, pageFor(id, text, lang)) }
      .toDF("doc_id", "html")
  }

  /** Strip comments, then script/style ELEMENTS (content included —
    * before tag-stripping, so `1 < 2` inside script data can't be
    * misread as a tag), on a column. `(?is)`: case-insensitive,
    * dot-matches-newline.
    */
  // NOTE on escaping: these fragments are normal-quoted Scala strings
  // (compile-time escapes, "\\\\" = 2 chars) because Spark's SQL
  // literal parser consumes one more backslash level ('\\b' → \b; a
  // bare '\b' would be a BACKSPACE char inside the regex).
  private def dropNonContent(c: String): String =
    "regexp_replace(regexp_replace(regexp_replace(" + c +
      ", '(?s)<!--.*?-->', ' '), '(?is)<script\\\\b.*?</script>', ' '), " +
      "'(?is)<style\\\\b.*?</style>', ' ')"

  /** HTML entity decode (the named entities the generator emits plus
    * the numeric apostrophe); `&amp;` LAST, per the standard decode
    * order — decoding it first would corrupt double-escaped text.
    */
  private def decodeEntities(c: String): String =
    Seq("&nbsp;" -> " ", "&copy;" -> "©", "&mdash;" -> "—",
        "&middot;" -> "·", "&lt;" -> "<", "&gt;" -> ">",
        "&quot;" -> "\"", "&#39;" -> "\\'", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (from, to)) => s"replace($acc, '$from', '$to')" }

  /** Tags → spaces, entities decoded, whitespace collapsed, trimmed. */
  private def textOf(c: String): String =
    "trim(regexp_replace(" +
      decodeEntities("regexp_replace(" + c + ", '<[^>]*>', ' ')") +
      ", '\\\\s+', ' '))"

  /** Q91 — full-page text extraction: per document, the <title>
    * content, the tag-stripped entity-decoded whitespace-collapsed
    * body text, and link/paragraph counts (counted AFTER comment/
    * script/style removal, so markup inside script strings doesn't
    * inflate them).
    */
  def extractText(docs: DataFrame): DataFrame =
    extractFromPages(htmlDocs(docs))

  /** [[extractText]] over an explicit (doc_id, html) frame — the
    * entry point for markup that did NOT come from the generator
    * (robustness contract: malformed or markup-free input yields
    * empty fields, never a throw — the decodeImage fallback
    * convention).
    */
  def extractFromPages(pages: DataFrame): DataFrame =
    pages
      .withColumn("clean", expr(dropNonContent("html")))
      .select(
        col("doc_id"),
        expr(textOf("regexp_extract(clean, '(?is)<title>(.*?)</title>', 1)")).as("title"),
        expr(textOf("regexp_extract(clean, '(?is)<body\\\\b[^>]*>(.*)</body>', 1)"))
          .as("body_text"),
        expr("regexp_count(clean, '(?i)<a\\\\s')").cast("long").as("n_links"),
        expr("regexp_count(clean, '(?i)<p\\\\b')").cast("long").as("n_paras"))
      .orderBy("doc_id")

  /** Q91b — boilerplate removal by link density: segment the body
    * into top-level blocks (nav/p/footer elements), score each as
    * (words, links), and keep blocks where links × 3 < words — chrome
    * (link-dense, text-poor) drops, prose survives. Emits the joined
    * main text plus the block accounting. Map-only like [[extractText]]
    * (the block explosion is per-row, bounded by the page's own block
    * count).
    */
  def mainContent(docs: DataFrame): DataFrame =
    mainContentFromPages(htmlDocs(docs))

  /** pages + `scored` (per-block text/link structs) + `main_text` —
    * the ONE copy of the block-segmentation and link-density chain
    * (q91b and q93 share it, so an escaping or boundary fix — like
    * this round's `<p` word-boundary patch — cannot land in one
    * consumer and miss the other).
    */
  private def withMainText(pages: DataFrame): DataFrame =
    pages
      .withColumn("clean", expr(dropNonContent("html")))
      .withColumn("blocks", expr(
        """regexp_extract_all(clean, '(?is)<(nav|p|footer)\\b[^>]*>.*?</\\1>', 0)"""))
      .withColumn("scored", expr(
        // The decode chain runs ONCE per block (no CSE inside higher-
        // order-function lambdas); word counts derive from the decoded
        // text where needed. `keep` — the link-density verdict — is
        // computed HERE, in the struct, so main_text and the n_kept
        // accounting read the SAME decision (a threshold fix cannot
        // land in one consumer and miss the other).
        "transform(blocks, b -> named_struct(" +
          "'txt', " + textOf("b") + ", " +
          "'n_links', regexp_count(b, '(?i)<a\\\\s')))"))
      .withColumn("scored", expr(
        """transform(scored, s -> named_struct(
             'txt', s.txt, 'n_links', s.n_links,
             'keep', s.n_links * 3 < size(split(s.txt, ' '))))"""))
      .withColumn("main_text", expr(
        "array_join(transform(filter(scored, s -> s.keep), s -> s.txt), ' ')"))

  /** [[mainContent]] over an explicit (doc_id, html) frame. */
  def mainContentFromPages(pages: DataFrame): DataFrame =
    withMainText(pages)
      .select(
        col("doc_id"),
        col("main_text"),
        expr("size(scored)").cast("long").as("n_blocks"),
        expr("size(filter(scored, s -> s.keep))").cast("long").as("n_kept"))
      .orderBy("doc_id")

  /** Q91c — anchor extraction: every <a> in document order with its
    * href and decoded anchor text.
    */
  def links(docs: DataFrame): DataFrame =
    linksFromPages(htmlDocs(docs))

  /** SQL fragment: deterministically salt each document with a messy
    * URL (the piiScrub fixture convention — the corpus has no URL
    * column, and the same expression runs in DuckDB so the oracle
    * plants the exact bytes): uppercase scheme+host, an explicit
    * default port, mixed-case path, optional trailing slash, unsorted
    * query params, optional fragment.
    */
  private[graft] val urlSaltSql: String =
    "concat('HTTPS://WWW.Site', CAST(doc_id % 7 AS STRING), " +
      "'.Example:443/Path/', CAST(doc_id % 10 AS STRING), " +
      "CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END, " +
      "'?b=2&a=1', " +
      "CASE WHEN doc_id % 3 = 0 THEN '#frag' ELSE '' END)"

  /** Canonicalization fragments over a URL column `u` — the crawl
    * pipeline's URL-dedup/frontier key: scheme+host lowercased (they
    * are case-insensitive; the path is NOT and keeps its case),
    * default port stripped (443/https, 80/http; non-default ports
    * kept), trailing path slashes trimmed (empty path → '/'),
    * fragment dropped, query params sorted. Pure codegen'd
    * regexp/string expressions, map-only.
    */
  private def urlParts(u: String): (String, String, String, String, String) = {
    val scheme = s"lower(regexp_extract($u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    val hostport = s"regexp_extract($u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)"
    val rest = s"regexp_replace($u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')"
    val nofrag = s"regexp_replace($rest, '#.*$$', '')"
    val query = s"regexp_extract($nofrag, '[?](.*)$$', 1)"
    (scheme, hostport, rest, nofrag, query)
  }

  /** Lowercased host of URL column `u` — the one spelling shared by
    * [[urlNormalizeCol]] and [[webFunnel]]. */
  private def hostSql(u: String): String =
    s"lower(regexp_extract(${urlParts(u)._2}, '^([^:]*)', 1))"

  /** Q92 — URL normalization over the salted corpus: emits the
    * canonical form, the lowercased host, and the param count. Rows
    * whose URL has no parseable scheme://host normalize to NULL (the
    * untrusted-input fallback convention).
    */
  def urlNormalize(docs: DataFrame): DataFrame =
    urlNormalizeCol(
      graft.sources.Tables.widen(docs).withColumn("url", expr(urlSaltSql)))

  /** [[urlNormalize]] over an explicit (doc_id, url) frame. */
  def urlNormalizeCol(withUrl: DataFrame): DataFrame = {
    val (scheme, hostport, _, nofrag, query) = urlParts("url")
    withUrl
      .withColumn("scheme", expr(scheme))
      .withColumn("host", expr(hostSql("url")))
      .withColumn("port", expr(s"regexp_extract($hostport, ':([0-9]+)$$', 1)"))
      .withColumn("path0", expr(s"regexp_extract($nofrag, '^([^?]*)', 1)"))
      .withColumn("path", expr(
        "CASE WHEN regexp_replace(path0, '/+$', '') = '' THEN '/' " +
          "ELSE regexp_replace(path0, '/+$', '') END"))
      .withColumn("q", expr(query))
      .withColumn("n_params",
        expr("CASE WHEN q = '' THEN 0 ELSE size(split(q, '&')) END").cast("long"))
      .withColumn("url_norm", expr(
        """CASE WHEN scheme = '' OR host = '' THEN CAST(NULL AS STRING)
             ELSE concat(scheme, '://', host,
               CASE WHEN port = '' OR (scheme = 'https' AND port = '443')
                         OR (scheme = 'http' AND port = '80')
                    THEN '' ELSE concat(':', port) END,
               path,
               CASE WHEN q = '' THEN ''
                    ELSE concat('?', array_join(array_sort(split(q, '&')), '&')) END)
           END"""))
      .select("doc_id", "url_norm", "host", "n_params")
      .orderBy("doc_id")
  }

  /** Q92b — per-host document counts over the normalized URLs: the
    * crawl-frontier / domain-cap statistic. One bounded-key
    * aggregation (hosts, not documents) with map-side combine.
    */
  def hostStats(docs: DataFrame): DataFrame =
    urlNormalize(docs)
      .groupBy("host")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("host")

  /** Q93 — the web-corpus funnel, composed as ONE plan: raw markup →
    * main-content extraction (the q91b block/link-density pass) →
    * token-length gate → per-host cap (the q69 domain-cap rule keyed
    * on the q92 host). This is the crawl→training-corpus path end to
    * end: the page text is scanned ONCE (every stage derives from the
    * same rendered frame — no self-joins between the content and URL
    * legs), the gate is a map-side filter, and the only corpus
    * exchanges are the per-host cap window and the presentation sort.
    * Scale note: at a million-host crawl the cap window inherits q69's
    * hot-domain caveat — swap in the bounded top-k Aggregator form if
    * one host owns a significant corpus fraction.
    */
  def webFunnel(docs: DataFrame, minTok: Long, maxTok: Long, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("host")
      .orderBy(col("n_tokens").desc, col("doc_id"))
    withMainText(htmlDocs(docs))
      .withColumn("url", expr(urlSaltSql))
      .withColumn("host", expr(hostSql("url")))
      .withColumn("n_tokens", size(split(col("main_text"), " ")).cast("long"))
      .where(col("n_tokens").between(minTok, maxTok))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= cap)
      .select("doc_id", "host", "n_tokens", "rnk")
      .orderBy("host", "rnk")
  }

  /** [[links]] over an explicit (doc_id, html) frame. */
  def linksFromPages(pages: DataFrame): DataFrame =
    pages
      .withColumn("clean", expr(dropNonContent("html")))
      .select(col("doc_id"), posexplode(expr(
        """regexp_extract_all(clean, '(?is)<a\\s[^>]*>.*?</a>', 0)""")))
      .select(
        col("doc_id"),
        (col("pos") + 1).cast("long").as("rnk"),
        expr("""regexp_extract(col, 'href="([^"]*)"', 1)""").as("href"),
        expr(textOf("col")).as("anchor"))
      .orderBy("doc_id", "rnk")
}
