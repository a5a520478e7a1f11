package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Deterministic.roundTo
import graft.functions.PortableHash.hash48

/** Document deduplication operators (north-star LLM-pipeline surface;
  * SURVEY.md §2C Q17). All designs are the bucketed, not all-pairs,
  * formulations the 100 TB framing demands:
  *
  *   - exact dedup groups on a fixed-width content hash, so the shuffle
  *     key is 32 bytes regardless of document size and the shuffle
  *     carries (hash, doc_id), never the text;
  *   - MinHash+LSH generates candidate pairs by equi-joining on band
  *     signatures (each doc appears in B buckets) — candidates are
  *     O(colliding pairs), not O(n²); exact Jaccard runs only on
  *     candidates;
  *   - SimHash reduces each document to one 48-bit integer that can be
  *     grouped/joined/Hamming-compared at any scale.
  *
  * Every hash is the portable MD5 formulation from
  * [[graft.functions.PortableHash]], so DuckDB oracles reproduce results
  * bit-for-bit. All expressions are Catalyst built-ins (array lambdas),
  * i.e. fully codegen'd, no UDFs.
  */
object Dedup {

  /** Q17 — exact dedup: one row per distinct content, keyed by
    * sha256(text). `keep_id` = the canonical survivor (min doc_id);
    * `n_copies` = how many duplicates share the content.
    */
  def exactDedup(docs: DataFrame): DataFrame =
    docs
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keep_id"))
      .orderBy("content_hash")

  /** Q55 — incremental ingest dedup: which documents of an arriving
    * batch survive against an existing corpus. Survivors are the
    * batch's first occurrence per content (within-batch dedup, the
    * [[exactDedup]] rule) that also have no content-hash match in the
    * corpus (anti join). Both sides meet on the fixed-width hash, so
    * the anti join co-partitions like any keyed join and the corpus
    * side ships only its hash column — at 100 TB that column IS the
    * dedup index (bucketed/bloom-fronted), never the text. Here the
    * corpus/batch split is by doc id so the oracle can reproduce it.
    */
  def incrementalDedup(docs: DataFrame, splitId: Long): DataFrame = {
    val corpus = docs.where(col("doc_id") < splitId)
      .select(sha2(col("text"), 256).as("content_hash"))
      .distinct()
    docs.where(col("doc_id") >= splitId)
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_batch_copies"))
      .join(corpus, Seq("content_hash"), "left_anti")
      .orderBy("content_hash")
  }

  /** Number of MinHash hash functions (signature length). */
  val NumHashes = 8
  /** LSH bands (NumHashes / Bands = 2 rows per band). */
  val NumBands = 4

  /** Word 3-gram shingles, distinct (first-occurrence order), with a
    * whole-text fallback for documents shorter than one shingle.
    * Computed via the native [[graft.functions.Shingle3]] expression;
    * [[declarativeShinglesSql]] is the built-ins-only twin it must
    * equal bit-for-bit (TextHashSpec).
    */
  private val shinglesSql = "shingle3(words)"

  private[graft] val declarativeShinglesSql =
    """CASE WHEN size(words) >= 3 THEN
         array_distinct(transform(sequence(0, size(words) - 3),
           i -> concat(words[i], ' ', words[i + 1], ' ', words[i + 2])))
       ELSE array(concat_ws(' ', words)) END"""

  /** MinHash signature: lane h is the (h % 4)-th 8-hex-char (32-bit)
    * slice of md5((h div 4) || ':' || s), minimized over shingles —
    * one MD5 call feeds four lanes, so an 8-lane signature costs TWO
    * digests per shingle, not eight. Lexicographic min over fixed-width
    * lowercase hex ≡ unsigned numeric min — portable, no permutation
    * tables to ship. Computed per-row, no shuffle, via the native
    * [[graft.functions.MinHashSig]] expression (one JVM loop per doc);
    * [[declarativeSignatureSql]] is the built-ins-only twin it must
    * equal bit-for-bit (TextHashSpec) and the form the DuckDB oracle
    * mirrors.
    */
  private val signatureSql = s"minhash_sig(shingles, $NumHashes)"

  private[graft] val declarativeSignatureSql =
    s"""transform(sequence(0, ${NumHashes - 1}),
        h -> array_min(transform(shingles,
          s -> substr(md5(concat(CAST(h div 4 AS STRING), ':', s)), 8 * (h % 4) + 1, 8))))"""

  private[graft] def withShingles(docs: DataFrame): DataFrame =
    graft.sources.Tables.widen(docs)
      .withColumn("words", split(col("text"), " "))
      .withColumn("shingles", expr(shinglesSql))

  /** (doc_id, band, band_sig, shingles) — one row per LSH band per doc,
    * shingles carried for downstream exact Jaccard. `widen` is skipped
    * when the input is a streaming Dataset (repartition decisions need
    * `df.rdd`, which streaming forbids; microbatch sources set their
    * own parallelism).
    */
  private[graft] def bandedWithShingles(docs: DataFrame): DataFrame = {
    val base = if (docs.isStreaming) docs else graft.sources.Tables.widen(docs)
    base
      .withColumn("words", split(col("text"), " "))
      .withColumn("shingles", expr(shinglesSql))
      .withColumn("sig", expr(signatureSql))
      .select(
        col("doc_id"), col("shingles"),
        posexplode(expr(
          s"""transform(sequence(0, ${NumBands - 1}),
              b -> md5(concat(sig[2 * b], '|', sig[2 * b + 1])))""")))
      .toDF("doc_id", "shingles", "band", "band_sig")
  }

  /** Q17b — per-document MinHash signature (joined with '|' into one
    * string column so the oracle compare is a plain string equality).
    */
  def minhashSignatures(docs: DataFrame): DataFrame =
    withShingles(docs)
      .withColumn("sig", expr(signatureSql))
      .select(col("doc_id"), array_join(col("sig"), "|").as("signature"))
      .orderBy("doc_id")

  /** LSH bucket-size cap: buckets with more than this many docs are
    * excluded from candidate generation. A bucket of k docs yields
    * O(k²) candidate pairs, so one boilerplate cluster (cookie banners,
    * license headers) can dominate the whole job at corpus scale; such
    * content is exactly what [[exactDedup]] already collapses. The cap
    * bounds per-bucket work, making worst-case cost O(n · cap) instead
    * of O(n²).
    */
  val MaxBucket = 1000

  /** Q17c — near-duplicate pairs via LSH banding + exact Jaccard.
    *
    * 1. one pass computes shingles + MinHash signature per doc and
    *    explodes into [[NumBands]] *narrow* rows (doc_id, band,
    *    band_sig) keyed by the band signature
    *    b = md5(sig[2b] || '|' || sig[2b+1]) — docs agreeing on both
    *    minhashes of any band collide. The narrow table is persisted:
    *    it is the materialized signature index every later step reads,
    *    so the expensive md5-per-shingle pass runs exactly once (an
    *    un-persisted plan recomputes it per join branch — AQE's
    *    broadcast conversion defeats exchange reuse). At 100 TB this
    *    intermediate would be written to storage; rows are 3 small
    *    fixed-width columns, NumBands per doc, so it is a tiny fraction
    *    of corpus size either way;
    * 2. bucket-size gate: only buckets with 2..[[MaxBucket]] members
    *    survive. Dropping singletons (the vast majority of buckets)
    *    prunes almost everything; dropping oversized buckets bounds
    *    skew (see [[MaxBucket]]). Gating BEFORE any per-bucket
    *    collection means no aggregation buffer ever exceeds maxBucket
    *    entries;
    * 3. candidate pairs are generated map-side inside each kept bucket
    *    (sorted member list → ordered pairs) — no self-join of the
    *    corpus-sized table at all — then de-duplicated, a shuffle that
    *    scales with the candidate count, not n;
    * 4. exact shingle Jaccard per candidate: a semi-join keeps only
    *    docs that appear in some candidate pair BEFORE the
    *    (string-heavy, hash-free) shingle projection runs, so the
    *    Jaccard pass re-shingles the candidate set, never the corpus.
    */
  def nearDupPairs(docs: DataFrame, threshold: Double, maxBucket: Int = MaxBucket): DataFrame = {
    val bands = withShingles(docs)
      .withColumn("sig", expr(signatureSql))
      .select(
        col("doc_id"),
        posexplode(expr(
          s"""transform(sequence(0, ${NumBands - 1}),
              b -> md5(concat(sig[2 * b], '|', sig[2 * b + 1])))""")))
      .toDF("doc_id", "band", "band_sig")
      .persist()

    val keep = bands
      .groupBy("band", "band_sig").agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n") >= 2 && col("bucket_n") <= maxBucket)
      .select("band", "band_sig")

    // Ordered pairs from each bucket's sorted member list: element i
    // pairs with every later element, so doc_a < doc_b by construction.
    val cand = bands
      .join(keep, Seq("band", "band_sig"))
      .groupBy("band", "band_sig")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .select(explode(expr(
        """flatten(transform(ids, (a, i) ->
             transform(slice(ids, i + 2, size(ids) - i - 1),
               b -> named_struct('doc_a', a, 'doc_b', b))))""")).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()
      // Tiny (bounded by collision count) but read three times below —
      // as candIds and by both sides of the shingle join.
      .persist()

    // Shingles for the Jaccard pass are recomputed ONLY for docs that
    // appear in some candidate pair: the semi-join filter runs before
    // the (string-heavy) shingle projection, so the full corpus is
    // never re-shingled.
    val candIds = cand
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    val sh = docs
      .join(candIds, "doc_id", "left_semi")
      .withColumn("words", split(col("text"), " "))
      .withColumn("shingles", expr(shinglesSql))
      .select(col("doc_id"), col("shingles"))
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
      .withColumn("jac", expr(
        "size(array_intersect(sh_a, sh_b)) / size(array_union(sh_a, sh_b))"))
      .where(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), roundTo(col("jac"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Q76 — incremental near-dup ingest: an arriving batch admitted
    * against the EXISTING corpus's LSH signature index — the online
    * companion to [[nearDupPairs]] the way [[incrementalDedup]] is to
    * [[exactDedup]]. Per batch doc: does it near-duplicate anything
    * already in the corpus, and what is its best match?
    *
    * Scale shape:
    *   - the corpus side is only its banded signature rows (doc_id,
    *     band, band_sig) — the same narrow index [[nearDupPairs]]
    *     materializes; at 100 TB it is stored and INCREMENTALLY grown
    *     (append the admitted batch's bands each cycle), never
    *     recomputed. Here it is derived from the id split so the
    *     oracle can reproduce it;
    *   - candidate generation is a keyed equi join of batch bands
    *     against index bands — cost O(batch · collisions), independent
    *     of corpus size; corpus buckets over [[MaxBucket]] are gated
    *     out exactly as in [[nearDupPairs]] (boilerplate clusters);
    *   - exact Jaccard re-shingles ONLY candidate docs (semi-join
    *     first), and the batch verdict is a left join back — clean
    *     docs never enter the expensive path;
    *   - best-match argmax is a struct max over (jaccard, -match_id),
    *     both sides rounded to the 1e-4 grid BEFORE comparison so the
    *     tie-break (lowest corpus id) is cross-engine deterministic.
    *
    * Within-batch duplicates are deliberately out of scope here
    * ([[incrementalDedup]] / [[nearDupPairs]] own that); production
    * runs this after the batch's own dedup pass.
    */
  def incrementalNearDup(docs: DataFrame, splitId: Long, threshold: Double,
                         maxBucket: Int = MaxBucket): DataFrame =
    nearDupAdmit(
      docs.where(col("doc_id") < splitId),
      docs.where(col("doc_id") >= splitId),
      threshold, maxBucket)

  /** [[incrementalNearDup]]'s core with the corpus and batch as
    * separate frames — the form the STREAMING ingest path drives per
    * microbatch (`foreachBatch`, StreamingSpec S16): each arriving
    * microbatch is admitted against the same static corpus, so the
    * union of per-batch verdicts equals one batch run over the union —
    * split-invariant by construction because admission never consults
    * other stream docs.
    */
  def nearDupAdmit(corpusDocs: DataFrame, batchDocs: DataFrame, threshold: Double,
                   maxBucket: Int = MaxBucket): DataFrame = {
    def banded(side: DataFrame): DataFrame = side
      .withColumn("words", split(col("text"), " "))
      .withColumn("shingles", expr(shinglesSql))
      .withColumn("sig", expr(signatureSql))
      .select(
        col("doc_id"),
        posexplode(expr(
          s"""transform(sequence(0, ${NumBands - 1}),
              b -> md5(concat(sig[2 * b], '|', sig[2 * b + 1])))""")))
      .toDF("doc_id", "band", "band_sig")

    val index = banded(graft.sources.Tables.widen(corpusDocs)).persist()
    val keep = index
      .groupBy("band", "band_sig").agg(count(lit(1)).as("n"))
      .where(col("n") <= maxBucket)
      .select("band", "band_sig")
    val cand = banded(graft.sources.Tables.widen(batchDocs))
      .join(index.join(keep, Seq("band", "band_sig"))
          .select(col("band"), col("band_sig"), col("doc_id").as("match_id")),
        Seq("band", "band_sig"))
      .select("doc_id", "match_id")
      .distinct()
      .persist()

    def candShingles(side: DataFrame, ids: DataFrame): DataFrame = side
      .join(ids, Seq("doc_id"), "left_semi")
      .withColumn("words", split(col("text"), " "))
      .withColumn("shingles", expr(shinglesSql))
      .select("doc_id", "shingles")

    val scored = cand
      .join(candShingles(batchDocs, cand.select("doc_id"))
        .withColumnRenamed("shingles", "sh_a"), "doc_id")
      .join(candShingles(corpusDocs, cand.select(col("match_id").as("doc_id")))
        .select(col("doc_id").as("match_id"), col("shingles").as("sh_b")), "match_id")
      .withColumn("jac", roundTo(
        expr("size(array_intersect(sh_a, sh_b)) / size(array_union(sh_a, sh_b))"), 4))
      .where(col("jac") >= threshold)
    val best = scored
      .groupBy("doc_id")
      .agg(max(struct(col("jac").as("j"), (-col("match_id")).as("nid"))).as("m"))
      .select(col("doc_id"), (-col("m.nid")).as("match_id"), col("m.j").as("jaccard"))

    val out = batchDocs.select("doc_id")
      .join(best, Seq("doc_id"), "left")
      .withColumn("is_neardup", col("match_id").isNotNull)
      .select("doc_id", "is_neardup", "match_id", "jaccard")
      .orderBy("doc_id")
      .localCheckpoint()
    // The checkpoint materialized every path through index/cand, so the
    // caches can be dropped eagerly — a per-microbatch driver
    // (foreachBatch, StreamingSpec S16) would otherwise accumulate one
    // cached pair per admitted batch for the session lifetime.
    index.unpersist()
    cand.unpersist()
    out
  }

  /** Q40 — near-duplicate clusters: connected components over the
    * [[nearDupPairs]] graph, because a production dedup keeps ONE
    * survivor per duplicate *group*, and pair lists alone over-delete
    * (A~B, B~C must not drop both B and C if C is kept for B).
    *
    * Iterative min-label propagation (Pregel-style small-step): each
    * round every node takes the min label among itself and its
    * neighbors; converges in O(component diameter) rounds. The loop
    * runs over the PAIR graph only — orders of magnitude smaller than
    * the corpus (LSH already pruned it), so per-round cost is a join on
    * a tiny relation; `localCheckpoint` truncates lineage so plan size
    * stays constant across rounds. The convergence probe (one count per
    * round) is the standard driver-side fixpoint test — it moves no
    * data. Spark SQL has no recursive CTE; the DuckDB oracle uses one,
    * which is exactly why this is an engine operator, not a query
    * rewrite.
    */
  def nearDupClusters(docs: DataFrame, threshold: Double): DataFrame = {
    val pairs = nearDupPairs(docs, threshold).select("doc_a", "doc_b")
    val edges = pairs
      .union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")
      .persist()

    var labels = edges.select(col("src").as("doc")).distinct()
      .withColumn("lbl", col("doc"))
      .localCheckpoint(false)
    var changed = true
    var prevSum: java.math.BigDecimal = null
    var rounds = 0
    // Neighbor-min alone needs O(diameter) rounds; the extra
    // label-of-label hop (pointer jumping — every label value is itself
    // a node, so the lookup always resolves) halves remaining distance
    // per round, so even a path-graph component converges in O(log n).
    // The cap is a runaway guard: 64 rounds covers any component that
    // fits in an exabyte, and overrunning it raises — this operator
    // must never silently emit unconverged (wrong) cluster labels.
    // Each round is ONE job, and (round 14, guide §2.4) the convergence
    // probe is label-sum MONOTONICITY instead of a join against the
    // previous labels: every round takes a min over a set containing
    // the node's own old label, so per-node labels never increase and
    // the label sum strictly decreases iff ANY label changed. That
    // drops the probe's third join (and its exchange) from every
    // round's plan; the sum is exact (decimal(38,0) — no long overflow
    // at any corpus size) and the job count per round is unchanged
    // (the agg's collect materializes the lazy checkpoint).
    while (changed) {
      if (rounds >= 64)
        throw new IllegalStateException(
          s"nearDupClusters failed to converge after $rounds rounds")
      val neighborMin = edges.join(labels, edges("src") === labels("doc"))
        .select(col("dst").as("doc"), col("lbl"))
        .union(labels.select("doc", "lbl"))
        .groupBy("doc").agg(min("lbl").as("lbl"))
      val next = neighborMin
        .join(
          labels.select(col("doc").as("l_doc"), col("lbl").as("l_lbl")),
          neighborMin("lbl") === col("l_doc"))
        .select(col("doc"), least(col("lbl"), col("l_lbl")).as("lbl"))
        .localCheckpoint(false)
      val s = next.agg(sum(col("lbl").cast("decimal(38,0)")))
        .collect()(0).getDecimal(0)
      // Empty pair graph → empty labels → null sum → already converged.
      changed = s != null && (prevSum == null || s.compareTo(prevSum) < 0)
      prevSum = s
      // Stale rounds' checkpoint RDDs are dropped by the ContextCleaner
      // once this reference moves on; edges we free explicitly below.
      labels = next
      rounds += 1
    }
    edges.unpersist()

    val sizes = labels.groupBy(col("lbl").as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"))
    labels.select(col("doc").as("doc_id"), col("lbl").as("cluster_id"))
      .join(sizes, "cluster_id")
      .select(
        col("doc_id"), col("cluster_id"), col("n_docs"),
        (col("doc_id") === col("cluster_id")).as("is_canonical"))
      .orderBy("doc_id")
  }

  /** Q17e — ensemble near-dup confirmation: the lexical LSH candidates
    * from [[nearDupPairs]] re-scored with embedding cosine (documents
    * and embeddings share the id domain). This is the production
    * two-stage shape: a cheap lexical pass proposes candidate pairs,
    * the semantic score confirms or refutes them — and only candidates
    * ever touch the embedding table. The candidate set is tiny relative
    * to the corpus, so AQE broadcasts it against the (100 TB-side)
    * embedding table; the big side is never shuffled.
    */
  def ensembleNearDups(docs: DataFrame, emb: DataFrame, threshold: Double): DataFrame = {
    val pairs = nearDupPairs(docs, threshold)
    val e = emb
      .withColumn("e", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("e"))
    pairs
      .join(e.select(col("vec_id").as("doc_a"), col("e").as("emb_a")), "doc_a")
      .join(e.select(col("vec_id").as("doc_b"), col("e").as("emb_b")), "doc_b")
      .withColumn("cosine", roundTo(expr("cosine_sim(emb_a, emb_b)"), 4))
      .select("doc_a", "doc_b", "jaccard", "cosine")
      .orderBy("doc_a", "doc_b")
  }

  /** Q17d — 48-bit SimHash per document: per-bit majority vote over the
    * 48-bit hashes of every token (duplicates weighted by occurrence).
    * One integer per doc; near-dup detection at scale = grouping on
    * rotated/high-bit prefixes + Hamming distance, all on 8-byte keys.
    * Computed per-row, no shuffle, via the native
    * [[graft.functions.SimHash48]] expression;
    * [[declarativeSimhash]] is the built-ins-only twin (TextHashSpec).
    */
  def simhash(docs: DataFrame): DataFrame =
    graft.sources.Tables.widen(docs)
      .withColumn("words", split(col("text"), " "))
      .withColumn("simhash", expr("simhash48(words)"))
      .select("doc_id", "simhash")
      .orderBy("doc_id")

  /** Q128 — blocked fuzzy entity matching (record linkage): the
    * catalog-dedup step that precedes any entity-level join. Rows
    * first collapse to DISTINCT entities (one hash agg, map-side
    * combined — the shuffle carries (name, count), never the rows),
    * then candidate pairs come from an equi-join on a blocking key
    * (the name's head noun) so the comparison count is
    * sum-of-block-squares, never corpus². Within a block, edit
    * distance on the variant token decides the match.
    *
    * Scale shape: the entity table is orders of magnitude smaller
    * than the fact table (64 entities for 200k parts here; the same
    * ratio holds for product catalogs at 100 TB), so the pair join
    * runs on the collapsed side only. Blocking bounds each block's
    * pair count; a skewed block is capped the same way MinHash bands
    * are (MaxBucket) if one ever dominates. `levenshtein` is a
    * codegen'd built-in on both engines.
    */
  def fuzzyEntityMatch(parts: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"need maxDist >= 1, got $maxDist")
    val ents = parts.groupBy("p_name").agg(count(lit(1)).as("n_parts"))
      .withColumn("block", substring_index(col("p_name"), " ", -1))
      .withColumn("variant", substring_index(col("p_name"), " ", 1))
    val a = ents.select(col("block"), col("p_name").as("name_a"),
      col("variant").as("var_a"), col("n_parts").as("n_a"))
    val b = ents.select(col("block"), col("p_name").as("name_b"),
      col("variant").as("var_b"), col("n_parts").as("n_b"))
    a.join(b, "block")
      .filter(col("name_a") < col("name_b"))
      .withColumn("lev", levenshtein(col("var_a"), col("var_b")).cast("long"))
      .filter(col("lev") <= maxDist)
      .select("block", "name_a", "name_b", "lev", "n_a", "n_b")
      .orderBy("block", "name_a", "name_b")
  }

  /** The built-ins-only SimHash fold [[simhash]] must equal. */
  private[graft] def declarativeSimhash(docs: DataFrame): DataFrame =
    graft.sources.Tables.widen(docs)
      .withColumn("words", split(col("text"), " "))
      .withColumn("votes", expr(
        s"""aggregate(words, array_repeat(CAST(0 AS BIGINT), 48),
              (acc, w) -> zip_with(acc,
                transform(sequence(0, 47),
                  b -> shiftright(${hash48("w")}, b) & CAST(1 AS BIGINT)),
                (a, bit) -> a + 2 * bit - 1))"""))
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 47), CAST(0 AS BIGINT),
             (acc, b) -> acc + CASE WHEN votes[b] > 0
               THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END)"""))
      .select("doc_id", "simhash")
      .orderBy("doc_id")
}
