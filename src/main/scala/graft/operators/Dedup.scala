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

  /** Number of MinHash hash functions (signature length). */
  val NumHashes = 8
  /** LSH bands (NumHashes / Bands = 2 rows per band). */
  val NumBands = 4

  /** Word 3-gram shingles, distinct, with a whole-text fallback for
    * documents shorter than one shingle.
    */
  private val shinglesSql =
    """CASE WHEN size(words) >= 3 THEN
         array_distinct(transform(sequence(0, size(words) - 3),
           i -> concat(words[i], ' ', words[i + 1], ' ', words[i + 2])))
       ELSE array(concat_ws(' ', words)) END"""

  /** MinHash signature: sig[h] = min over shingles of md5(h || ':' || s).
    * Lexicographic min over hex strings — portable, no permutation
    * tables to ship. Computed per-row, no shuffle, via the native
    * [[graft.functions.MinHashSig]] expression (one JVM loop per doc);
    * [[declarativeSignatureSql]] is the built-ins-only twin it must
    * equal bit-for-bit (TextHashSpec) and the form the DuckDB oracle
    * mirrors.
    */
  private val signatureSql = s"minhash_sig(shingles, $NumHashes)"

  private[graft] val declarativeSignatureSql =
    s"""transform(sequence(0, ${NumHashes - 1}),
        h -> array_min(transform(shingles, s -> md5(concat(CAST(h AS STRING), ':', s)))))"""

  private[graft] def withShingles(docs: DataFrame): DataFrame =
    graft.sources.Tables.widen(docs)
      .withColumn("words", split(col("text"), " "))
      .withColumn("shingles", expr(shinglesSql))

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
    * 1. one pass computes shingles + MinHash signature per doc, then
    *    explodes into [[NumBands]] rows keyed by the band signature
    *    b = md5(sig[2b] || '|' || sig[2b+1]) — docs agreeing on both
    *    minhashes of any band collide;
    * 2. bucket-size gate: only buckets with 2..[[MaxBucket]] members
    *    enter the join. Dropping singletons (the vast majority of
    *    buckets) prunes most of the join input; dropping oversized
    *    buckets bounds skew (see [[MaxBucket]]). The size aggregation
    *    shuffles on the same (band, band_sig) key as the join, so the
    *    exchange is computed once and reused;
    * 3. self-equi-join on (band, band_sig) → candidate collisions (the
    *    only shuffle that scales with n; shingle arrays ride through it
    *    so the expensive signature pass runs once, not once per join
    *    branch — at 100 TB the signature table would be a materialized
    *    intermediate for the same reason);
    * 4. exact shingle Jaccard per collision, thresholded, then distinct —
    *    a pair colliding in k ≤ NumBands bands computes its Jaccard k
    *    times, a bounded constant that's far cheaper than re-joining a
    *    recomputed signature table per side.
    */
  def nearDupPairs(docs: DataFrame, threshold: Double, maxBucket: Int = MaxBucket): DataFrame = {
    val bands = withShingles(docs)
      .withColumn("sig", expr(signatureSql))
      .select(
        col("doc_id"), col("shingles"),
        posexplode(expr(
          s"""transform(sequence(0, ${NumBands - 1}),
              b -> md5(concat(sig[2 * b], '|', sig[2 * b + 1])))""")))
      .toDF("doc_id", "shingles", "band", "band_sig")

    // Window count over the join key itself: the expensive signature
    // pass is computed once, shuffled once on (band, band_sig), and the
    // downstream self-join reuses that exchange — a separate size
    // aggregation would force a second signature pass.
    val bucketW = org.apache.spark.sql.expressions.Window.partitionBy("band", "band_sig")
    val gated = bands
      .withColumn("bucket_n", count(lit(1)).over(bucketW))
      .where(col("bucket_n") >= 2 && col("bucket_n") <= maxBucket)
      .drop("bucket_n")

    gated.as("a")
      .join(gated.as("b"), Seq("band", "band_sig"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .withColumn("jac", expr(
        "size(array_intersect(a.shingles, b.shingles)) / size(array_union(a.shingles, b.shingles))"))
      .where(col("jac") >= threshold)
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        roundTo(col("jac"), 4).as("jaccard"))
      .distinct()
      .orderBy("doc_a", "doc_b")
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
