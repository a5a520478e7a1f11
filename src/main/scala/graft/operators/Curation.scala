package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Deterministic.roundTo
import graft.functions.PortableHash.hash48

/** Corpus-curation operators for the LLM-training-data surface
  * (SURVEY.md §2D): PII detection/redaction, per-source quota capping,
  * span-level (C4-style) cross-document dedup, deterministic global
  * shuffle/sharding, and a hashed-feature linear quality classifier.
  *
  * All five are map-dominant: the only shuffles are a bounded top-k
  * aggregation (source cap), a hash-keyed min aggregation over chunk
  * digests (span dedup), and a single shard exchange (global shuffle).
  * Nothing is driver-side, nothing all-pairs, nothing buffers an
  * unbounded group — each survives a 100 TB corpus by construction.
  */
object Curation {

  /** Shared Java-regex/RE2 subset (no lookaround, no backreferences, no
    * alternation) so Spark and the DuckDB oracle match byte-for-byte.
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
  val Ipv4Re = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
  val PhoneRe = "[+][0-9][0-9 ]{5,}[0-9]"

  /** SQL fragment: deterministically salt a document with synthetic PII
    * (the test corpus is clean, so the scrubber needs planted targets —
    * the same expression runs in DuckDB, so the oracle plants the exact
    * same bytes). Every doc gets an email + an IP; docs with
    * `doc_id % 3 = 0` get a phone number too.
    */
  private[graft] val piiSaltSql: String =
    "concat(text, ' contact user', CAST(doc_id AS STRING), " +
      "'@mail.example.com at 10.', CAST(doc_id % 200 AS STRING), '.0.', " +
      "CAST(doc_id % 250 AS STRING), " +
      "CASE WHEN doc_id % 3 = 0 THEN concat(' call +1 555 01', " +
      "lpad(CAST(doc_id % 100 AS STRING), 2, '0')) ELSE '' END, ' end')"

  /** Q68 — PII scrub: count and redact emails, IPv4 addresses and
    * phone numbers. Pure per-row regex work (codegen'd `RegExpReplace`/
    * `RegExpExtractAll`) — map-only, no shuffle; at 100 TB this is an
    * embarrassingly parallel scan whose cost is the regex engine, not
    * the plan. Redaction order is fixed (email → ip → phone) so later
    * patterns cannot re-match the `<TAG>` placeholders; `n_residual`
    * re-runs all three counters over the redacted text and must be 0 —
    * the scrubber's own acceptance check, shipped in-band.
    */
  def piiScrub(docs: DataFrame): DataFrame =
    graft.sources.Tables.widen(docs)
      .withColumn("pii_text", expr(piiSaltSql))
      .withColumn("n_emails",
        size(expr(s"regexp_extract_all(pii_text, '$EmailRe', 0)")).cast("long"))
      .withColumn("n_ips",
        size(expr(s"regexp_extract_all(pii_text, '$Ipv4Re', 0)")).cast("long"))
      .withColumn("n_phones",
        size(expr(s"regexp_extract_all(pii_text, '$PhoneRe', 0)")).cast("long"))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(col("pii_text"), EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          PhoneRe, "<PHONE>"))
      .withColumn("n_residual",
        (size(expr(s"regexp_extract_all(redacted, '$EmailRe', 0)"))
          + size(expr(s"regexp_extract_all(redacted, '$Ipv4Re', 0)"))
          + size(expr(s"regexp_extract_all(redacted, '$PhoneRe', 0)"))).cast("long"))
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
        col("n_residual"), md5(col("redacted")).as("redacted_md5"))
      .orderBy("doc_id")

  /** Q69 — per-source quota cap (RefinedWeb-style domain capping): keep
    * the `cap` highest-quality documents per source. Uses the bounded
    * top-k Aggregator (`graft_top10`), NOT a window: a window must sort
    * every source's full candidate set, while the Aggregator's
    * partial-merge reduces each map task's slice to k rows before the
    * shuffle — O(sources·k) exchanged rows even when one source holds
    * half the corpus (the hot-domain case that makes windowed capping
    * fall over at scale). Tie contract: quality desc, doc_id asc,
    * mirrored by the oracle's ORDER BY.
    */
  /** Q105 — canonical selection under near-dup collapse: per near-dup
    * cluster keep the HIGHEST-QUALITY member (q19b's quality score;
    * ties to the lowest doc_id), not an arbitrary one — the curation
    * rule real pipelines use when collapsing fuzzy duplicates, since
    * the duplicates differ in boilerplate, truncation, and OCR noise
    * and the kept copy is the one that trains. Singletons (no near
    * dup) are their own cluster and survive unchanged.
    *
    * Scale shape: q40's pointer-jumping cluster pass + one map-only
    * quality pass over the corpus, then a per-cluster window (the
    * cluster id is the partition key — dup clusters are small, so no
    * skewed partition) — no exchange beyond q40's plus the window.
    */
  def canonicalDedup(docs: DataFrame, threshold: Double): DataFrame = {
    val labels = graft.operators.Dedup.nearDupClusters(docs, threshold)
      .select(col("doc_id"), col("cluster_id"))
    val quality = graft.operators.TextAnalysis.qualityCore(docs)
      .select(col("doc_id"), col("quality"))
    val w = Window.partitionBy("cluster_label")
    docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("cluster_label", coalesce(col("cluster_id"), col("doc_id")))
      .join(quality, Seq("doc_id"))
      .withColumn("rn", row_number().over(
        w.orderBy(col("quality").desc, col("doc_id"))))
      .withColumn("n_members", count(lit(1)).over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("cluster_label"), col("quality"), col("n_members"))
      .orderBy("cluster_label")
  }

  def sourceCap(docs: DataFrame): DataFrame =
    TextAnalysis.qualityCore(docs)
      .select(col("source"), col("quality"), col("doc_id"))
      .groupBy("source")
      .agg(expr("graft_top10(quality, doc_id)").as("top"))
      .select(col("source"), posexplode(col("top")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rnk"),
        col("col._2").as("doc_id"), col("col._1").as("quality"))
      .orderBy("source", "rnk")

  /** Q70 — span-level cross-document exact dedup (the C4 recipe, which
    * drops any three-sentence span seen before, restated over
    * fixed-`span`-token chunks because the corpus has no sentence
    * boundaries): a chunk instance survives iff it is the first
    * occurrence of its content corpus-wide, "first" = lowest
    * (doc_id, chunk_idx).
    *
    * Scale shape: explode to chunk instances, shuffle ONLY the 32-byte
    * md5 digest + coordinates (never the chunk text) to a min-
    * aggregation keyed by digest, then join the winners back on the
    * digest. Both the aggregation and the join key on the hash, so
    * skew is bounded by duplicate-set size, the same contract as the
    * q17 dedup family; per-doc reassembly is a groupBy on doc_id.
    */
  /** Chunk instances of a docs frame: (doc_id, chunk_idx, digest,
    * token count) — the shared explode for batch [[spanDedup]] and
    * [[graft.streaming.StreamingSpanDedup]]. */
  private[graft] def spanChunks(docs: DataFrame, span: Int): DataFrame =
    docs
      .withColumn("words", split(col("text"), " "))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, CAST(ceil(size(words) / $span.0) AS INT) - 1),
              i -> struct(array_join(slice(words, i * $span + 1, $span), ' ') AS txt,
                          size(slice(words, i * $span + 1, $span)) AS c_tokens))""")))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        md5(col("col.txt")).as("h"), col("col.c_tokens").cast("long").as("c_tokens"))

  def spanDedup(docs: DataFrame, span: Int): DataFrame = {
    val chunks = spanChunks(graft.sources.Tables.widen(docs), span)
    val keepers = chunks
      .groupBy("h")
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("kp"))
    chunks.join(keepers, "h")
      .withColumn("kept",
        col("doc_id") === col("kp.doc_id") && col("chunk_idx") === col("kp.chunk_idx"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum("c_tokens").as("n_tokens"),
        sum(when(col("kept"), col("c_tokens")).otherwise(0L)).as("n_tokens_kept"))
      .withColumn("kept_ratio",
        roundTo(col("n_tokens_kept").cast("double") / col("n_tokens"), 4))
      .orderBy("doc_id")
  }

  /** Q70b — boundary-free span dedup: [[spanDedup]]'s fixed grid misses
    * any duplicate span offset from the chunk boundaries (a duplicate
    * shifted by <span tokens digests differently on every chunk — the
    * exact-substring blind spot of grid-aligned C4 dedup). This variant
    * digests chunks on TWO stride grids — offsets 0 and span/2 — and
    * computes first-seen per digest ACROSS grids, so a span aligned in
    * one document and shifted by span/2 in another still collides. The
    * report is token-level: per doc, how many token positions are
    * covered by at least one non-first chunk instance (the union of the
    * dup instances' intervals), i.e. the duplicated-text mass a
    * curation pass would cut.
    *
    * Grid-1 keeps only FULL span-length chunks: grid 0 already covers
    * every token exhaustively (including tails); the offset grid exists
    * solely to catch misaligned full spans, and its sub-span tails
    * would only add noise collisions.
    *
    * Scale shape: identical to [[spanDedup]] — one corpus scan, the
    * shuffle carries digests + coordinates (never text; ~2× the grid-0
    * volume), first-seen is a min-aggregation keyed by digest, and only
    * DUP instances explode to positions (span-bounded fan-out on the
    * duplicate mass, not the corpus).
    */
  def spanDedupOffsets(docs: DataFrame, span: Int): DataFrame = {
    // span < 2 degenerates: half = 0 collapses the grids into identical
    // duplicates of every instance, which the engine's value-based
    // first-seen filter and the oracle's row_number rank then disagree
    // on. The operator is only meaningful with a real offset grid.
    require(span >= 2, s"spanDedupOffsets needs span >= 2, got $span")
    val base = spanBase(docs)
    // Chunk instances of both grids in ONE pass over the scan.
    val inst = base.select(
        col("doc_id"), col("n_tokens"),
        explode(expr(fixedGridExpr(span))).as("c"))
      .select(col("doc_id"), col("c.start").as("start"),
        col("c.clen").as("clen"), col("c.h").as("h"))
    spanDupReport(base, inst)
  }

  private def spanBase(docs: DataFrame): DataFrame =
    graft.sources.Tables.widen(docs)
      .withColumn("words", split(col("text"), " "))
      .select(col("doc_id"), col("words"),
        size(col("words")).cast("long").as("n_tokens"))

  /** The two fixed stride grids (offsets 0 and span/2) as one array
    * expression over `words`: starts are sequence(o, n-1, span); the
    * greatest() guard keeps the sequence bounds legal for docs shorter
    * than the offset (the filter then drops the stray start). */
  private def fixedGridExpr(span: Int): String = {
    val half = span / 2
    s"""flatten(transform(array(0, $half), o ->
          filter(
            transform(sequence(o, greatest(size(words) - 1, o), $span),
              st -> named_struct(
                'start', CAST(st AS BIGINT),
                'clen', CAST(least(size(words) - st, $span) AS BIGINT),
                'h', md5(array_join(slice(words, st + 1, $span), ' ')))),
            c -> c.start < size(words)
              AND (o = 0 OR c.clen = CAST($span AS BIGINT)))))"""
  }

  /** Shared report tail: first sighting per digest (value-based), dup
    * instances explode to token positions, per-doc dup mass.
    * `dedupInstances`: the anchored grid can emit the SAME
    * (doc, start, h) instance as a fixed grid, so those instances are
    * de-duplicated first and the winner comparison is by value, which
    * the oracle's row_number rank then agrees with; the two fixed
    * grids alone have disjoint starts, so q70b skips the extra
    * exchange. */
  private def spanDupReport(base: DataFrame, inst0: DataFrame,
                            dedupInstances: Boolean = false): DataFrame = {
    val inst = if (dedupInstances) inst0.distinct() else inst0
    val first = inst.groupBy("h")
      .agg(min(struct(col("doc_id"), col("start"))).as("kp"))
    val dupPositions = inst.join(first, "h")
      .where(!(col("doc_id") === col("kp.doc_id") && col("start") === col("kp.start")))
      .select(col("doc_id"),
        explode(expr("sequence(start, start + clen - 1)")).as("p"))
    val perDoc = dupPositions
      .groupBy("doc_id")
      .agg(countDistinct(col("p")).as("n_dup_tokens"))
    base.select("doc_id", "n_tokens")
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("n_dup_tokens", coalesce(col("n_dup_tokens"), lit(0L)))
      .withColumn("dup_ratio",
        roundTo(col("n_dup_tokens").cast("double") / col("n_tokens"), 4))
      .orderBy("doc_id")
  }

  /** Q70c — span dedup with a CONTENT-DEFINED third grid: the two
    * fixed stride grids catch grid-aligned and half-offset duplicates,
    * but a repeated substring at ANY OTHER phase (offset ≢ 0, span/2
    * mod span) digests differently on every fixed chunk — the Lee et
    * al. "exact substring" gap. The anchored grid closes it the way
    * content-defined chunking (CDC) backup/dedup systems do: a chunk
    * boundary falls at every token whose portable 48-bit hash ≡ 0
    * (mod `anchorMod`), plus the document start. Boundaries depend
    * only on CONTENT, so a duplicated region reproduces the same
    * interior boundaries AT ANY OFFSET in any document — its interior
    * chunks digest identically and collide corpus-wide (only the
    * partial chunks at the region's two edges can escape).
    *
    * Expected anchored-chunk length is `anchorMod` tokens; a run with
    * no anchor token produces one long chunk (bounded by the doc
    * length — the digest is computed per doc partition and only the
    * 32-byte md5 + coordinates ever shuffle, so a long chunk costs
    * local CPU, not memory or network).
    *
    * Coverage is a SUPERSET of [[spanDedupOffsets]] by construction:
    * all fixed-grid instances are retained and adding instances can
    * only demote first-sightings to duplicates, never the reverse.
    * Scale shape unchanged: digests + coordinates shuffle, never text.
    */
  def spanDedupAnchored(docs: DataFrame, span: Int, anchorMod: Int): DataFrame = {
    require(span >= 2, s"spanDedupAnchored needs span >= 2, got $span")
    require(anchorMod >= 2, s"spanDedupAnchored needs anchorMod >= 2, got $anchorMod")
    val base = spanBase(docs)
      // Content-defined starts: doc start + every anchor-token position,
      // sorted (array_distinct in case position 0 is itself an anchor).
      .withColumn("astarts", expr(
        s"""array_sort(array_distinct(concat(array(0),
              filter(sequence(0, size(words) - 1),
                i -> ${hash48("element_at(words, i + 1)")} % $anchorMod = 0))))"""))
    val anchoredExpr =
      s"""transform(sequence(1, size(astarts)),
            j -> named_struct(
              'start', CAST(element_at(astarts, j) AS BIGINT),
              'clen', CAST(coalesce(try_element_at(astarts, j + 1), size(words))
                           - element_at(astarts, j) AS BIGINT),
              'h', md5(array_join(slice(words, element_at(astarts, j) + 1,
                     coalesce(try_element_at(astarts, j + 1), size(words))
                       - element_at(astarts, j)), ' '))))"""
    val inst = base.select(
        col("doc_id"), col("n_tokens"),
        explode(expr(
          s"concat(${fixedGridExpr(span)}, $anchoredExpr)")).as("c"))
      .select(col("doc_id"), col("c.start").as("start"),
        col("c.clen").as("clen"), col("c.h").as("h"))
    spanDupReport(base, inst, dedupInstances = true)
  }

  /** Q71 — deterministic global shuffle + shard manifest (the "mix the
    * corpus before training" step): shard = portable-hash(salt, doc_id)
    * mod `numShards`, position = rank of the hash within the shard.
    * One exchange on the shard key, then a per-shard sort — there is no
    * global sort in the plan (PlanAuditSpec pins this): shards are the
    * unit of training-reader parallelism, so order across shards is
    * meaningless and a total order would serialize the write. Shard
    * sizes concentrate around n/numShards (hash uniformity), so the
    * per-shard sort is the balanced-partition case windows are good at.
    */
  def globalShuffle(docs: DataFrame, numShards: Int, salt: String): DataFrame =
    docs
      .select(col("doc_id"), col("n_chars"))
      .withColumn("h", expr(hash48(s"concat('$salt:', CAST(doc_id AS STRING))")))
      .withColumn("shard", pmod(col("h"), lit(numShards.toLong)))
      .repartition(col("shard"))
      .withColumn("pos",
        row_number().over(Window.partitionBy("shard").orderBy("h", "doc_id")).cast("long"))
      .select("shard", "pos", "doc_id", "n_chars")
      .orderBy("shard", "pos")

  /** Q74 — the end-to-end corpus pipeline, composed as ONE declarative
    * plan: quality/length/repetition gates and exact dedup (the q65
    * gate metrics), per-source quota capping (the q69 semantics), and
    * deterministic shard assignment (the q71 manifest). Output is the
    * training-shard manifest a reader fleet would consume:
    * (shard, pos, doc_id, source, n_tokens, quality).
    *
    * Plan shape (PlanAuditSpec pins it): the text is scanned and
    * tokenized exactly ONCE — every gate metric comes from that single
    * pass, dedup survivorship is a min-over-digest window (partition =
    * one duplicate set), the cap is a per-source rank window over
    * already-gated survivors, and the only corpus-wide exchange is the
    * shard placement. Composing via windows instead of the standalone
    * operators' agg+join shapes is deliberate: the self-join
    * formulations would each rescan and retokenize the corpus (the
    * dominant cost at 100 TB), while a window exchanges the same rows
    * once. The trade is the cap window's per-source partition size —
    * data-controlled where q69's bounded-buffer Aggregator is O(k); a
    * deployment capping millions of hot domains should run q69's form
    * on the gated survivors instead (one extra pass, skew-proof cap).
    */
  def corpusPipeline(
      docs: DataFrame,
      minTok: Long, maxTok: Long,
      minQuality: Double, maxTopTokFrac: Double,
      numShards: Int, salt: String): DataFrame = {
    val scored = TextAnalysis.qualityCore(docs)
      .withColumn("top_tok_frac", roundTo(
        expr(TextAnalysis.maxRunExpr("array_sort(words)")).cast("double")
          / col("n_tokens"), 4))
      .withColumn("content_hash", md5(col("text")))
      .select("doc_id", "source", "content_hash", "n_tokens", "quality", "top_tok_frac")
    val kept = scored
      .withColumn("keep_id",
        min("doc_id").over(Window.partitionBy("content_hash")))
      .where(col("n_tokens").between(minTok, maxTok)
        && col("quality") >= minQuality
        && col("top_tok_frac") <= maxTopTokFrac
        && col("doc_id") === col("keep_id"))
    kept
      .withColumn("rnk", row_number().over(
        Window.partitionBy("source").orderBy(col("quality").desc, col("doc_id"))))
      .where(col("rnk") <= 10)
      .withColumn("h", expr(hash48(s"concat('$salt:', CAST(doc_id AS STRING))")))
      .withColumn("shard", pmod(col("h"), lit(numShards.toLong)))
      .repartition(col("shard"))
      .withColumn("pos",
        row_number().over(Window.partitionBy("shard").orderBy("h", "doc_id")).cast("long"))
      .select("shard", "pos", "doc_id", "source", "n_tokens", "quality")
      .orderBy("shard", "pos")
  }

  /** Q72 — hashed-feature linear classifier (the fastText-style quality
    * gate, with hash-derived weights standing in for trained ones —
    * the serving plan is identical, only the weight source differs):
    * each token hashes to an integer weight in [-1000, 1000], the raw
    * score is the exact BIGINT sum over the token stream, the margin
    * normalizes by 1000·n_tokens into [-1, 1]. Per-row lambda fold —
    * map-only, zero shuffle, and the score is integer-exact across
    * engines (the cross-engine float rule: sum integers, divide once,
    * round once). No sigmoid: exp() is not ulp-stable across engines
    * and the decision rule only needs the margin's sign.
    */
  def hashedClassifier(docs: DataFrame): DataFrame = {
    val w = "CAST(conv(substring(md5(concat('w:', t)), 1, 12), 16, 10) AS BIGINT) % 2001 - 1000"
    graft.sources.Tables.widen(docs)
      .withColumn("words", split(col("text"), " "))
      .withColumn("n_tokens", size(col("words")).cast("long"))
      .withColumn("score_raw",
        expr(s"aggregate(words, CAST(0 AS BIGINT), (acc, t) -> acc + ($w))"))
      .withColumn("margin",
        roundTo(col("score_raw").cast("double") / (col("n_tokens") * 1000.0), 4))
      .withColumn("label",
        when(col("margin") >= 0, lit("keep")).otherwise(lit("drop")))
      .select("doc_id", "n_tokens", "score_raw", "margin", "label")
      .orderBy("doc_id")
  }

  /** Q83 — duplicate n-gram coverage (the corpus-overlap diagnostic of
    * Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better"): for each document, the fraction of its
    * overlapping word n-gram positions whose n-gram also occurs in at
    * least one OTHER document. Unlike [[spanDedup]] (which picks
    * keepers), this is the measurement pass — the per-doc score a
    * curation policy thresholds on, and the corpus-level duplication
    * estimate its sum yields.
    *
    * Scale shape: one corpus scan explodes n-gram positions to 48-bit
    * digests (8-byte keys — text never shuffles); the distinct-doc
    * count per digest is a two-level aggregation with map-side partial
    * distinct; the dup set flows back through a semi join keyed on the
    * digest. Skew is bounded by the duplicate mass itself (a digest's
    * row count = its occurrence count), the same contract as q17/q70.
    *
    * Collision regime (the repo-wide hash48 convention): keying on
    * 48-bit digests means birthday collisions appear around ~2^24
    * distinct n-grams and are material at billions — and a collision
    * marks a UNIQUE n-gram as duplicated, so at production scale
    * `dup_frac` is an over-estimate, never an under-estimate. That
    * one-sided bias is the safe direction for a drop-threshold
    * diagnostic (it can only flag more docs for review); widen the
    * digest (hash48 → two-lane 96-bit, q17's escalation path) if the
    * corpus approaches that regime.
    */
  def dupNgramCoverage(docs: DataFrame, n: Int, flagAt: Double): DataFrame = {
    val d = graft.sources.Tables.widen(docs)
      .withColumn("words", split(col("text"), " "))
    val grams = d
      .where(size(col("words")) >= n)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, size(words) - $n),
              i -> ${hash48(s"array_join(slice(words, i + 1, $n), ' ')")})""")).as("g"))
    // Round 14 (guide §2.3/§2.4): one corpus explode instead of two.
    // The former shape aggregated count_distinct(doc_id) per digest and
    // then SEMI-JOINED the (re-exploded, re-hashed) gram instances back
    // against the duplicated-digest set — the md5-per-position pass ran
    // twice and the join added a fourth exchange. Equivalent one-pass
    // form: collapse instances to (g, doc_id, k) — map-side partial agg
    // shrinks within-doc repeats before the exchange — count distinct
    // docs per digest as a window over that collapsed frame (same g
    // partitioning the agg already established), and sum the kept
    // instance counts per doc. n_dup_grams(doc) = Σ_{g: nd(g)≥2} k(g,doc)
    // — identical by definition to "instances whose digest appears in
    // ≥2 docs".
    val perDocGram = grams
      .groupBy("g", "doc_id")
      .agg(count(lit(1)).as("k"))
    val dupPerDoc = perDocGram
      .withColumn("nd", count(lit(1)).over(Window.partitionBy("g")))
      .where(col("nd") >= 2)
      .groupBy("doc_id")
      .agg(sum("k").as("n_dup_grams"))
    d.select(col("doc_id"),
        greatest(size(col("words")) - n + 1, lit(0)).cast("long").as("n_grams"))
      .join(dupPerDoc, Seq("doc_id"), "left")
      .withColumn("n_dup_grams", coalesce(col("n_dup_grams"), lit(0L)))
      .withColumn("dup_frac", when(col("n_grams") > 0,
        roundTo(col("n_dup_grams").cast("double") / col("n_grams"), 4)))
      .withColumn("flagged", col("dup_frac") >= flagAt)
      .select("doc_id", "n_grams", "n_dup_grams", "dup_frac", "flagged")
      .orderBy("doc_id")
  }
}
