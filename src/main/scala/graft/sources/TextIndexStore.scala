package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash.hash48

/** Persisted inverted (lexical) index — [[VectorIndexStore]]'s
  * train-once / serve-many closure, for BM25: `build` scans the corpus
  * once and materializes the postings as parquet; every later query
  * reads ONLY its own terms' posting buckets and the one-row corpus
  * stats, never the text. q86's per-query path recomputes df/avgdl
  * with a full corpus scan per query batch; against the store the
  * same ranking (bit-identical — the oracle is shared verbatim) costs
  * a file-pruned postings read of the query terms.
  *
  * Layout under `dir`:
  *   - `postings/` — (term, doc_id, tf, dl) PARTITIONED BY
  *     `t_bucket = hash48(term) mod nBuckets`: a query's terms map to
  *     a bounded bucket set, so the scan prunes every other bucket at
  *     FILE-listing time, and the `term IN (...)` predicate pushes to
  *     parquet for row-group pruning within the bucket. `dl` is
  *     denormalized into the posting row (classic search-index norm
  *     storage) so scoring never joins a corpus-sized doc-length
  *     table.
  *   - `stats/` — ONE row (n_docs, total_dl): the corpus constants of
  *     the BM25 length norm.
  *
  * Per-term document frequency is NOT stored: df(term) = the term's
  * own posting-row count, computable exactly from the already-pruned
  * read (an extra stored column would just be another thing to keep
  * consistent under append).
  *
  * At 100 TB of text the postings store is the token-type × doc
  * incidence — large, but bucket-partitioned so serving I/O is
  * O(query terms' postings); the expensive text bytes are never read
  * at query time.
  */
object TextIndexStore {

  /** One corpus scan → postings + stats (overwrite). The two artifacts
    * live in disjoint subdirs and share no mutable state — their write
    * jobs run concurrently (guide §2.6). */
  def build(docs: DataFrame, dir: String, nBuckets: Int): Unit = {
    ParallelSteps.run(
      () => writePostings(docs, dir, nBuckets, "overwrite"),
      () => docLengths(docs)
        .agg(count(lit(1)).as("n_docs"), sum("dl").as("total_dl"))
        .write.mode("overwrite").parquet(s"$dir/stats"))
    // A rebuild is a new index: tombstones against the old postings
    // must not shadow fresh rows (the VectorIndexStore.build contract)
    // — and an old corpus's positional sidecar must not serve next to
    // the new postings ([[buildPositional]] recreates it on demand).
    val conf = docs.sparkSession.sparkContext.hadoopConfiguration
    val ts = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    ts.getFileSystem(conf).delete(ts, true)
    val pos = new org.apache.hadoop.fs.Path(s"$dir/positions")
    pos.getFileSystem(conf).delete(pos, true)
  }

  /** Admit new documents to an EXISTING index: their postings append
    * (same bucketing — `nBuckets` must match the build's, the caller's
    * contract exactly as VectorIndexStore.append's artifact frames),
    * and the one-row corpus stats advance by the batch's exact integer
    * counts. Existing posting files are untouched; df needs no
    * maintenance because it is derived from the postings at query
    * time — so a stored-BM25 query after append scores EXACTLY as a
    * from-scratch build over the full corpus (TextIndexStoreSpec pins
    * this).
    *
    * Durability contract: the object lock makes appends single-writer
    * within a JVM, but the postings-then-stats sequence is NOT a
    * transaction — a crash between the two writes leaves postings
    * ahead of stats, and a concurrent reader can hit the stats
    * overwrite window. The recovery rule is `build` (a full overwrite
    * restores consistency); a production deployment stages both writes
    * under one manifest/table-format commit (the Delta/Iceberg shape)
    * instead of raw parquet directories.
    */
  def append(spark: SparkSession, dir: String, newDocs: DataFrame,
             nBuckets: Int): Unit = synchronized {
    val batch = docLengths(newDocs)
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("total_dl")).first()
    // Empty batch: a no-op tick of the ingest loop (sum over zero rows
    // is null — nothing to write, nothing to advance).
    if (batch.getLong(0) == 0L) return
    // Read-then-overwrite on the one-row stats: collect the single row
    // BEFORE the write clears the path.
    // Re-ingest REVIVES a tombstoned doc — but the store still holds
    // its OLD posting rows hidden behind the anti-join, and merely
    // dropping the tombstone would serve BOTH generations (double tf —
    // the resurrection gap). A revival therefore folds deletions
    // physically first: [[compact]] drops every dead row and clears
    // the tombstones, then the new postings land as the doc's only
    // generation. Amortized: revivals are rare, and the rewrite is the
    // same one the maintenance schedule owes anyway.
    val newIds = newDocs.select(col("doc_id").cast("long").as("doc_id")).distinct()
    if (!tombstones(spark, dir).join(broadcast(newIds), Seq("doc_id"), "left_semi").isEmpty)
      compact(spark, dir)
    val old = stats(spark, dir).select(col("n_docs"), col("total_dl")).first()
    writePostings(newDocs, dir, nBuckets, "append")
    // If the positional sidecar exists it admits the batch too —
    // phrase results must never lag the frequency index's corpus.
    val posPath = new org.apache.hadoop.fs.Path(s"$dir/positions")
    if (posPath.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(posPath))
      positionsFrame(newDocs, nBuckets)
        .repartition(col("t_bucket"))
        .sortWithinPartitions("term", "doc_id")
        .write.partitionBy("t_bucket").mode("append").parquet(posPath.toString)
    import spark.implicits._
    Seq((old.getLong(0) + batch.getLong(0), old.getLong(1) + batch.getLong(1)))
      .toDF("n_docs", "total_dl")
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Tombstone-delete documents from the index WITHOUT touching a
    * posting file (the VectorIndexStore.delete takedown contract, for
    * the lexical store): the ids append to a tombstone frame, and the
    * one-row corpus stats retreat by the deleted docs' exact (count,
    * Σdl) — recovered from the postings themselves (one distinct
    * (doc_id, dl) pass over the dead ids' rows), so the caller needs no
    * text. df needs no maintenance either direction: it is derived
    * from the (live) postings at query time. Ids already tombstoned
    * are excluded from the decrement, so overlapping delete batches
    * are idempotent. Serving reads [[livePostings]]; after that,
    * stored-BM25 scores EXACTLY as a from-scratch build over the live
    * corpus (TextIndexStoreSpec pins this).
    */
  def delete(spark: SparkSession, dir: String, docIds: DataFrame): Unit = synchronized {
    val ids = docIds.select(col("doc_id").cast("long").as("doc_id"))
    val newDead = ids.join(tombstones(spark, dir), Seq("doc_id"), "left_anti")
    val gone = postings(spark, dir)
      .join(broadcast(newDead), "doc_id")
      .select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n"), sum("dl").as("s")).first()
    if (gone.getLong(0) == 0L) return // nothing indexed to delete
    val old = stats(spark, dir).select(col("n_docs"), col("total_dl")).first()
    newDead.write.mode("append").parquet(s"$dir/tombstones")
    import spark.implicits._
    Seq((old.getLong(0) - gone.getLong(0), old.getLong(1) - gone.getLong(1)))
      .toDF("n_docs", "total_dl")
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** The current tombstone set — empty when no delete has ever run.
    * Existence via the Hadoop FileSystem API (the
    * VectorIndexStore.tombstones portability contract).
    */
  def tombstones(spark: SparkSession, dir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      spark.read.parquet(s"$dir/tombstones")
    else {
      import spark.implicits._
      spark.emptyDataset[Long].toDF("doc_id")
    }
  }

  /** The serving view: postings minus tombstoned documents. Bucket and
    * term pruning stay effective — the filters sit on the postings
    * side and push below the anti-join, so the tombstone pass touches
    * only the query terms' already-pruned rows.
    */
  def livePostings(spark: SparkSession, dir: String): DataFrame =
    postings(spark, dir)
      .join(broadcast(tombstones(spark, dir)), Seq("doc_id"), "left_anti")

  /** Physical compaction: rewrite the postings without tombstoned
    * docs (one file per bucket — append-accumulated small files
    * merge), scratch-dir + rename swap, tombstones dropped. Stats were
    * already adjusted at delete time, so compaction changes no number
    * (the VectorIndexStore.compact contract — including its durability
    * caveat: a crash between the delete and the rename leaves only the
    * scratch dir, whose contents are the complete new table; recovery
    * = finish the rename).
    */
  def compact(spark: SparkSession, dir: String): Unit = synchronized {
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(s"$dir/postings_compacting")
    fs.delete(tmp, true)
    livePostings(spark, dir)
      .repartition(col("t_bucket"))
      .sortWithinPartitions("term", "doc_id")
      .write.partitionBy("t_bucket").mode("overwrite").parquet(tmp.toString)
    // The positional sidecar folds its dead rows in the SAME compaction
    // — dropping the tombstones with stale positions on disk would
    // resurrect deleted docs in phrase/proximity results.
    val posPath = new Path(s"$dir/positions")
    val hasPositions = fs.exists(posPath)
    val posTmp = new Path(s"$dir/positions_compacting")
    if (hasPositions) {
      fs.delete(posTmp, true)
      livePositions(spark, dir)
        .repartition(col("t_bucket"))
        .sortWithinPartitions("term", "doc_id")
        .write.partitionBy("t_bucket").mode("overwrite").parquet(posTmp.toString)
    }
    val live = new Path(s"$dir/postings")
    fs.delete(live, true)
    require(fs.rename(tmp, live), s"compaction swap failed for $dir")
    if (hasPositions) {
      fs.delete(posPath, true)
      require(fs.rename(posTmp, posPath), s"positional compaction swap failed for $dir")
    }
    fs.delete(new Path(s"$dir/tombstones"), true)
  }

  /** (doc_id, text …, words, dl) — shared with [[VersionedTextIndex]]
    * so the length/tokenization convention has ONE definition.
    */
  private[sources] def docLengths(docs: DataFrame): DataFrame =
    Tables.widen(docs)
      .withColumn("words", split(col("text"), " "))
      .withColumn("dl", size(col("words")).cast("long"))

  /** The postings frame (term, doc_id, dl, tf, t_bucket) — the ONE
    * definition of the bucketing formula both stores write and
    * [[bucketOf]]'s Scala twin must keep matching; a second copy
    * drifting would silently prune the wrong buckets at serve time.
    */
  private[sources] def postingsFrame(docs: DataFrame, nBuckets: Int): DataFrame =
    docLengths(docs)
      .select(col("doc_id"), col("dl"), explode(col("words")).as("term"))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))
      .withColumn("t_bucket", pmod(expr(hash48("term")), lit(nBuckets.toLong)))

  private def writePostings(docs: DataFrame, dir: String, nBuckets: Int,
                            mode: String): Unit =
    postingsFrame(docs, nBuckets)
      .repartition(col("t_bucket"))
      .sortWithinPartitions("term", "doc_id")
      .write.partitionBy("t_bucket").mode(mode).parquet(s"$dir/postings")

  /** The stored postings (term, doc_id, tf, dl, t_bucket). */
  def postings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/postings")
      .select(col("term"), col("doc_id"), col("tf"), col("dl"),
        col("t_bucket").cast("long").as("t_bucket"))

  /** The one-row corpus stats (n_docs, total_dl). */
  def stats(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/stats")

  /** The bucket a term's postings live in — the Scala twin of the
    * build's `hash48(term) mod nBuckets` (TextIndexStoreSpec pins the
    * Scala and SQL hash48 bit-equal on the corpus vocabulary), used to
    * push the bounded bucket list into the scan as a partition filter.
    */
  def bucketOf(term: String, nBuckets: Int): Long =
    java.lang.Math.floorMod(graft.streaming.SyncCore.hash48(term), nBuckets.toLong)

  /** [[build]] once per (dir, nBuckets) per JVM (the
    * [[VectorIndexStore.buildOnce]] idempotence contract; whole
    * check-and-build under the lock).
    */
  def buildOnce(docs: DataFrame, dir: String, nBuckets: Int): Unit = synchronized {
    val key = (dir, nBuckets)
    if (!built.contains(key)) {
      StoreProvenance.built(dir)
      build(docs, dir, nBuckets)
      built += key
    } else StoreProvenance.reused(dir)
  }

  private val built = scala.collection.mutable.Set.empty[(String, Int)]

  /** Build-on-base + append-the-rest, once per JVM (the
    * [[VectorIndexStore.buildAppendedOnce]] contract: build overwrites,
    * so a fresh JVM redoes both steps and an append never applies
    * twice).
    */
  def buildAppendedOnce(spark: SparkSession, dir: String, baseDocs: DataFrame,
                        newDocs: DataFrame, nBuckets: Int): Unit = synchronized {
    val key = (dir, nBuckets)
    if (!appended.contains(key)) {
      build(baseDocs, dir, nBuckets)
      append(spark, dir, newDocs, nBuckets)
      appended += key
    }
  }

  private val appended = scala.collection.mutable.Set.empty[(String, Int)]

  /** Build + tombstone-delete, once per JVM (the
    * [[VectorIndexStore.buildDeletedOnce]] contract).
    */
  def buildDeletedOnce(spark: SparkSession, dir: String, docs: DataFrame,
                       delIds: DataFrame, nBuckets: Int): Unit = synchronized {
    val key = (dir, nBuckets)
    if (!deletedBuilt.contains(key)) {
      build(docs, dir, nBuckets)
      delete(spark, dir, delIds)
      deletedBuilt += key
    }
  }

  /** Build + delete + physical [[compact]], once per JVM (the
    * [[VectorIndexStore.buildCompactedOnce]] contract).
    */
  def buildCompactedOnce(spark: SparkSession, dir: String, docs: DataFrame,
                         delIds: DataFrame, nBuckets: Int): Unit = synchronized {
    val key = (dir, nBuckets)
    if (!compacted.contains(key)) {
      build(docs, dir, nBuckets)
      delete(spark, dir, delIds)
      compact(spark, dir)
      compacted += key
    }
  }

  private val deletedBuilt = scala.collection.mutable.Set.empty[(String, Int)]
  private val compacted = scala.collection.mutable.Set.empty[(String, Int)]

  /** Positional postings (term, doc_id, positions, t_bucket) — the
    * classic proximity-index sidecar next to `postings/`: per
    * (term, doc) the SORTED 0-based token offsets of every occurrence,
    * bucketed by the SAME `hash48(term) mod nBuckets` formula so a
    * phrase query's terms file-prune to a bounded bucket set exactly
    * as BM25's do. Stored separately (not a column on the frequency
    * postings) because positions are the index's heavy payload
    * (Σtf offsets vs one tf long per row) and frequency-only queries
    * must not pay to scan past them.
    *
    * `size(positions) == tf` by construction — the positional sidecar
    * is an exact refinement of the frequency postings, never a second
    * tokenization (both derive from [[docLengths]]'s split).
    */
  private[sources] def positionsFrame(docs: DataFrame, nBuckets: Int): DataFrame =
    docLengths(docs)
      .select(col("doc_id"), posexplode(col("words")).as(Seq("pos", "term")))
      .groupBy("term", "doc_id")
      .agg(sort_array(collect_list(col("pos").cast("long"))).as("positions"))
      .withColumn("t_bucket", pmod(expr(hash48("term")), lit(nBuckets.toLong)))

  /** One corpus scan → the positional sidecar (overwrite). `nBuckets`
    * must match the frequency build's — the caller's contract, as with
    * [[append]].
    */
  def buildPositional(docs: DataFrame, dir: String, nBuckets: Int): Unit =
    positionsFrame(docs, nBuckets)
      .repartition(col("t_bucket"))
      .sortWithinPartitions("term", "doc_id")
      .write.partitionBy("t_bucket").mode("overwrite")
      .parquet(s"$dir/positions")

  /** The stored positional postings. */
  def positions(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/positions")
      .select(col("term"), col("doc_id"), col("positions"),
        col("t_bucket").cast("long").as("t_bucket"))

  /** The positional SERVING view: positions minus tombstoned docs —
    * the [[livePostings]] contract for the sidecar, so phrase and
    * proximity queries honor takedowns exactly as BM25 does (bucket
    * pruning pushes below the anti-join the same way).
    */
  def livePositions(spark: SparkSession, dir: String): DataFrame =
    positions(spark, dir)
      .join(broadcast(tombstones(spark, dir)), Seq("doc_id"), "left_anti")

  /** [[buildPositional]] once per (dir, nBuckets) per JVM (the
    * [[buildOnce]] idempotence contract).
    */
  def buildPositionalOnce(docs: DataFrame, dir: String,
                          nBuckets: Int): Unit = synchronized {
    val key = (dir, nBuckets)
    if (!positionalBuilt.contains(key)) {
      buildPositional(docs, dir, nBuckets)
      positionalBuilt += key
    }
  }

  private val positionalBuilt = scala.collection.mutable.Set.empty[(String, Int)]
}
