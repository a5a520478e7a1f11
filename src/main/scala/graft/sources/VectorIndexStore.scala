package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Persisted IVF-PQ index — the train-once / serve-many artifact the
  * per-query trainers (q18i/q80/q85) deliberately lack. `build` runs
  * the in-engine training pipeline ([[Similarity.ivfPqArtifacts]]:
  * coarse k-means, residual PQ sub-codebooks, corpus encode) exactly
  * once and materializes the three artifacts as parquet; every later
  * search loads them and pays only LUT construction plus a pruned
  * code-table scan. The model precedent is [[DocStore]] (persisted
  * layout + incremental refresh) and the exported perceptron weights
  * (Classifier.trainedWeights) — this closes the same loop for ANN.
  *
  * Layout under `dir`:
  *   - `centroids/` — (cid, cemb double[64]): the coarse quantizer.
  *     nCentroids rows; a broadcast-sized model table.
  *   - `codebooks/` — (m, cid, cemb double[subLen]): residual-trained
  *     PQ sub-codebooks. ≤ nSub × nCodes rows; broadcast-sized.
  *   - `codes/` — (vec_id, codes int[nSub]) PARTITIONED BY cid: the
  *     encoded corpus. Partitioning by coarse cell is the serving
  *     layout: a query batch probes a bounded cell set, so the scan
  *     prunes unprobed cells at FILE-listing time and serving I/O is
  *     |probed cells| / |cells| of the code bytes — and code bytes are
  *     ~nSub integers/vector, ~1.6 % of the float bytes, which are not
  *     read at all on the ADC path. At 100 TB of embeddings the index
  *     is a few-TB store whose per-query read is a handful of cell
  *     files.
  *
  * Doubles round-trip parquet bit-exactly, so searches over the loaded
  * artifacts equal searches over the just-trained frames verbatim —
  * the store adds durability, not a new numeric contract.
  */
object VectorIndexStore {

  /** Train the index on `emb` and materialize it under `dir`
    * (overwrite). The artifacts are bounded (centroids, codebooks) or
    * map-only encodes (codes) — nothing here shuffles corpus floats;
    * codes repartition by their cell id only (nSub ints per row).
    */
  def build(emb: DataFrame, dir: String, nCentroids: Int, nSub: Int,
            nCodes: Int, iters: Int): Unit = {
    val (coarse, books, codes) = Similarity.ivfPqArtifacts(emb, nCentroids, nSub, nCodes, iters)
    // The three artifacts live in disjoint subdirs and share no
    // uncomputed lineage (training already ran) — write them as
    // concurrent jobs instead of three sequential commits.
    ParallelSteps.run(
      () => coarse.write.mode("overwrite").parquet(s"$dir/centroids"),
      () => books.write.mode("overwrite").parquet(s"$dir/codebooks"),
      () => codes
        .repartition(col("cid"))
        .sortWithinPartitions("vec_id")
        .write.partitionBy("cid").mode("overwrite").parquet(s"$dir/codes"))
    // A rebuild is a new index: tombstones against the OLD code table
    // (a prior process's partial state) must not shadow fresh rows.
    val ts = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    ts.getFileSystem(emb.sparkSession.sparkContext.hadoopConfiguration).delete(ts, true)
  }

  /** Admit new vectors to an EXISTING index without retraining: assign
    * each to its stored coarse centroid, encode its residual against
    * the stored sub-codebooks ([[Similarity.encodeResiduals]] — the
    * same kernel the build used), and append the new code rows to the
    * store. Existing codes, centroids and codebooks are untouched —
    * this is the production embedding-ingest path (the q76 admit
    * pattern, for the trained index): per batch, one map-only encode
    * of the NEW rows and an append of nSub ints each.
    */
  def append(spark: SparkSession, dir: String, newVecs: DataFrame): Unit = synchronized {
    // Re-ingest REVIVES a tombstoned id — but the store still holds its
    // OLD code row hidden behind the anti-join, and merely dropping the
    // tombstone would serve BOTH generations (double ADC contributions
    // — the resurrection gap). A revival therefore folds deletions
    // physically first: [[compact]] drops every dead row and clears the
    // tombstones, then the new encoding lands as the id's only
    // generation. Amortized: revivals are rare, and the rewrite is the
    // one the maintenance schedule owes anyway.
    val newIds = newVecs.select(col("vec_id").cast("long").as("vec_id")).distinct()
    if (!tombstones(spark, dir).join(broadcast(newIds), Seq("vec_id"), "left_semi").isEmpty)
      compact(spark, dir)
    val coarse = centroids(spark, dir)
    val books = codebooks(spark, dir)
    // nSub is a property of the stored codebooks (bounded read).
    val nSub = books.agg(max("m")).first().getAs[Number](0).intValue + 1
    val resid = Similarity.residuals(Similarity.withEmb(newVecs), coarse)
    Similarity.encodeResiduals(resid, books, nSub)
      .repartition(col("cid"))
      .sortWithinPartitions("vec_id")
      .write.partitionBy("cid").mode("append").parquet(s"$dir/codes")
  }

  /** Tombstone-delete: mark `ids` (a (vec_id) frame) dead WITHOUT
    * touching a single code file — deletion at 100 TB must not rewrite
    * the store on every takedown request. Serving reads
    * [[liveCodes]]; [[compact]] later folds tombstones into a physical
    * rewrite. Appends, so repeated delete batches accumulate (duplicate
    * ids are harmless — anti-join semantics).
    */
  def delete(spark: SparkSession, dir: String, ids: DataFrame): Unit = synchronized {
    ids.select(col("vec_id").cast("long").as("vec_id"))
      .write.mode("append").parquet(s"$dir/tombstones")
  }

  /** The current tombstone set — empty frame when no delete has ever
    * run against this store. Existence goes through the Hadoop
    * FileSystem API (not java.io) so the store works on any filesystem
    * the cluster mounts, exactly like the read/write paths.
    */
  def tombstones(spark: SparkSession, dir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      spark.read.parquet(s"$dir/tombstones")
    else {
      import spark.implicits._
      spark.emptyDataset[Long].toDF("vec_id")
    }
  }

  /** The serving view of the code table: stored codes minus tombstoned
    * ids (left-anti). The tombstone side is broadcast — between
    * compactions it is operationally small (compact precisely when it
    * is not); cell pruning still happens on the codes side first, so
    * the anti-join touches only probed-cell rows.
    */
  def liveCodes(spark: SparkSession, dir: String): DataFrame =
    codes(spark, dir).join(broadcast(tombstones(spark, dir)), Seq("vec_id"), "left_anti")

  /** Physical compaction: rewrite the code table without tombstoned
    * rows — ONE file per coarse cell (the repartition on cid maps each
    * cell to exactly one task, so append-accumulated small files merge)
    * — then drop the tombstone set. Writes to a scratch subdir first
    * and swaps via rename: the live table is never read and overwritten
    * in the same plan. After compact, [[liveCodes]] ≡ [[codes]] and
    * search results are IDENTICAL to the tombstone-serving view
    * (VectorIndexStoreSpec pins both).
    *
    * Durability contract (the TextIndexStore.append caveat, compaction
    * edition): delete-old-then-rename is not a transaction — a crash
    * between the two leaves only `codes_compacting` on disk, and the
    * recovery rule is "finish the rename" (the scratch dir holds the
    * complete new table). A production deployment stages the swap
    * under one manifest/table-format commit (the Delta/Iceberg shape)
    * instead of raw directory renames.
    */
  def compact(spark: SparkSession, dir: String): Unit = synchronized {
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(s"$dir/codes_compacting")
    fs.delete(tmp, true)
    liveCodes(spark, dir)
      .repartition(col("cid"))
      .sortWithinPartitions("vec_id")
      .write.partitionBy("cid").mode("overwrite").parquet(tmp.toString)
    val live = new Path(s"$dir/codes")
    fs.delete(live, true)
    require(fs.rename(tmp, live), s"compaction swap failed for $dir")
    fs.delete(new Path(s"$dir/tombstones"), true)
  }

  /** The stored coarse quantizer (cid, cemb). */
  def centroids(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/centroids")

  /** The stored PQ sub-codebooks (m, cid, cemb). */
  def codebooks(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/codebooks")

  /** The stored code table (vec_id, cid, codes) — cid is the partition
    * column, so `filter(cid isin probed)` prunes at file level.
    */
  def codes(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/codes")
      .select(col("vec_id"), col("cid").cast("long").as("cid"), col("codes"))

  /** [[build]] once per (dir, params) per JVM — the trained index is a
    * pure function of its inputs, and queries against it should
    * measure SERVING, not re-training (the [[DocStore.writeOnce]]
    * idempotence contract).
    */
  def buildOnce(emb: DataFrame, dir: String, nCentroids: Int, nSub: Int,
                nCodes: Int, iters: Int): Unit = synchronized {
    // Whole check-and-build under the lock: an unsynchronized outer
    // read of the mutable set would race a concurrent resize (builds
    // are rare and expensive — a coarse lock costs nothing here).
    val key = (dir, nCentroids, nSub, nCodes, iters)
    if (!built.contains(key)) {
      StoreProvenance.built(dir)
      build(emb, dir, nCentroids, nSub, nCodes, iters)
      built += key
    } else StoreProvenance.reused(dir)
  }

  /** Build-on-base + append-the-rest, once per JVM: the incremental-
    * maintenance round trip as one idempotent unit (build overwrites,
    * so a fresh JVM redoes both steps from scratch — an append is
    * never applied twice to the same store).
    */
  def buildAppendedOnce(spark: SparkSession, dir: String, baseEmb: DataFrame,
                        newEmb: DataFrame, nCentroids: Int, nSub: Int,
                        nCodes: Int, iters: Int): Unit = synchronized {
    val key = (dir, nCentroids, nSub, nCodes, iters)
    if (!appended.contains(key)) {
      build(baseEmb, dir, nCentroids, nSub, nCodes, iters)
      append(spark, dir, newEmb)
      appended += key
    }
  }

  /** Build + tombstone-delete, once per JVM: the takedown-serving state
    * (live view = codes minus tombstones) as one idempotent unit.
    */
  def buildDeletedOnce(spark: SparkSession, dir: String, emb: DataFrame,
                       delIds: DataFrame, nCentroids: Int, nSub: Int,
                       nCodes: Int, iters: Int): Unit = synchronized {
    val key = (dir, nCentroids, nSub, nCodes, iters)
    if (!deletedBuilt.contains(key)) {
      build(emb, dir, nCentroids, nSub, nCodes, iters)
      delete(spark, dir, delIds)
      deletedBuilt += key
    }
  }

  /** Build + delete + physical [[compact]], once per JVM — the full
    * maintenance cycle ending in a tombstone-free, one-file-per-cell
    * store.
    */
  def buildCompactedOnce(spark: SparkSession, dir: String, emb: DataFrame,
                         delIds: DataFrame, nCentroids: Int, nSub: Int,
                         nCodes: Int, iters: Int): Unit = synchronized {
    val key = (dir, nCentroids, nSub, nCodes, iters)
    if (!compacted.contains(key)) {
      build(emb, dir, nCentroids, nSub, nCodes, iters)
      delete(spark, dir, delIds)
      compact(spark, dir)
      compacted += key
    }
  }

  private val built = scala.collection.mutable.Set.empty[(String, Int, Int, Int, Int)]
  private val appended = scala.collection.mutable.Set.empty[(String, Int, Int, Int, Int)]
  private val deletedBuilt = scala.collection.mutable.Set.empty[(String, Int, Int, Int, Int)]
  private val compacted = scala.collection.mutable.Set.empty[(String, Int, Int, Int, Int)]
}
