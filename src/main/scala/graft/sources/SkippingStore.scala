package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-skipping layout — the Iceberg/Delta trick of
  * pruning FILES by manifest-carried column stats, combined with a
  * Z-ORDER clustering so the stats are tight in EVERY indexed
  * dimension at once:
  *
  *   - write: each order column is fixed-width-bucketed to 10 bits
  *     from its global [min, max] (one agg pass; exact integer math),
  *     the buckets BIT-INTERLEAVE into a z-value, and the frame range-
  *     partitions + sorts on it — so each written file covers a small
  *     HYPER-RECTANGLE of the index space, not a thin slab of one
  *     dimension (a single-column sort prunes perfectly on that column
  *     and not at all on any other; the interleave trades a little of
  *     dimension 1 for skipping power on all of them).
  *   - stats: one grouped pass over `input_file_name()` records each
  *     file's exact per-column [min, max] into `_skipping.json` (at
  *     cluster scale the write job's task-commit messages carry these
  *     for free — Iceberg's manifest-entry shape; the re-read here is
  *     one footer-local column scan).
  *   - read: a box predicate keeps only files whose stats intervals
  *     overlap EVERY bound — a driver-side metadata decision over a
  *     bounded file list, never a data I/O — and the residual filter
  *     still pushes into the surviving parquet scans, where the z-sort
  *     makes ROW-GROUP min/max pruning tight too (two skipping tiers
  *     from one layout).
  *
  * The MAINTENANCE lifecycle is Delta's OPTIMIZE ZORDER story:
  * [[append]] lands each ingest batch as its own subdirectory with its
  * own stats entries — correctness never degrades (excluded files are
  * still provably matchless) but batch files z-sorted only WITHIN the
  * batch cover wider boxes, so pruning slowly loosens; [[optimize]]
  * rewrites everything into one fresh globally-z-ordered generation
  * and swaps the manifest ATOMICALLY (tmp + rename — a reader resolves
  * either the old file list or the new one, both complete), leaving
  * old subdirectories for [[vacuum]]. Every manifest update follows
  * the same swap, so a crash mid-append leaves data files without a
  * manifest reference — invisible, exactly like the versioned stores'
  * uncommitted segments.
  *
  * This is the layout tier under [[EventLogStore]]'s time-bucket
  * partition pruning: directory partitioning can serve ONE dimension;
  * the z-order manifest serves boxes on any subset of the indexed
  * columns without exploding directory counts. (Multi-VERSION time
  * travel belongs to [[ManifestLog]]'s stores; this store keeps one
  * live generation and demonstrates the LAYOUT axis.)
  */
object SkippingStore {

  private val Bits = 10

  private val mapper = new ObjectMapper

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def subName(op: String): String =
    s"$op-${java.util.UUID.randomUUID().toString.take(8)}"

  /** Z-sort `df` on `orderCols` into `nFiles` files under `dir/$sub`
    * and return the new files' manifest entries (relative paths +
    * exact per-statsCol [min, max]).
    */
  private def writeSubdir(df: DataFrame, dir: String, sub: String,
                          orderCols: Seq[String], statsCols: Seq[String],
                          nFiles: Int): Seq[(String, Seq[Long], Seq[Long])] = {
    val spark = df.sparkSession
    val rangeAggs = orderCols.flatMap(c =>
      Seq(min(col(c).cast("long")).as(s"mn_$c"), max(col(c).cast("long")).as(s"mx_$c")))
    val ranges = df.agg(rangeAggs.head, rangeAggs.tail: _*).first()
    // 10-bit fixed-width bucket per column from its global range —
    // deterministic and one-pass (a rank-based bucketing would need a
    // global sort or sampled cut points); skew only loosens file boxes,
    // never correctness, because the stats record what actually landed.
    val buckets = orderCols.zipWithIndex.map { case (c, i) =>
      val mn = ranges.getLong(2 * i)
      val span = math.max(1L, ranges.getLong(2 * i + 1) - mn + 1)
      s"(((CAST($c AS BIGINT) - ${mn}L) * ${1L << Bits}L) DIV ${span}L)"
    }
    val k = orderCols.length
    val zExpr = (for (i <- 0 until k; j <- 0 until Bits)
      yield s"(((${buckets(i)} >> $j) & 1) << ${j * k + i})").mkString(" + ")
    df.withColumn("_z", expr(zExpr))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(s"$dir/$sub")
    // One grouped pass: exact per-file [min, max] of every stats column.
    val statAggs = statsCols.flatMap(c =>
      Seq(min(col(c).cast("long")).as(s"mn_$c"), max(col(c).cast("long")).as(s"mx_$c")))
    spark.read.parquet(s"$dir/$sub")
      .groupBy(input_file_name().as("_f"))
      .agg(statAggs.head, statAggs.tail: _*)
      .collect()
      .map { r =>
        val file = r.getString(0).substring(r.getString(0).lastIndexOf('/') + 1)
        (s"$sub/$file",
          statsCols.indices.map(i => r.getLong(1 + 2 * i)): Seq[Long],
          statsCols.indices.map(i => r.getLong(2 + 2 * i)): Seq[Long])
      }.toSeq
  }

  /** Atomic manifest swap: tmp + rename — a reader sees the old
    * complete file list or the new one, never a torn mix.
    */
  private def commitManifest(spark: SparkSession, dir: String,
                             orderCols: Seq[String], statsCols: Seq[String],
                             files: Seq[(String, Seq[Long], Seq[Long])]): Unit = {
    val root: ObjectNode = mapper.createObjectNode()
    val oArr = root.putArray("orderCols"); orderCols.foreach(oArr.add)
    val cArr = root.putArray("indexCols"); statsCols.foreach(cArr.add)
    val fArr = root.putArray("files")
    files.foreach { case (f, mins, maxs) =>
      val n = fArr.addObject()
      n.put("file", f)
      val mn = n.putArray("min"); val mx = n.putArray("max")
      mins.foreach(mn.add); maxs.foreach(mx.add)
    }
    val f = fs(spark, dir)
    val tmp = new Path(s"$dir/.skipping-${java.util.UUID.randomUUID()}.tmp")
    val out = f.create(tmp, false)
    try out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
      .getBytes("UTF-8")) finally out.close()
    val dest = new Path(s"$dir/_skipping.json")
    f.delete(dest, false)
    require(f.rename(tmp, dest), s"manifest rename failed for $dest")
  }

  /** Build the layout: `df` z-ordered on `orderCols` (integral-typed)
    * into `nFiles` files, stats over `statsColsOpt` (default: the
    * order columns — pass a superset to record stats for columns the
    * layout does NOT cluster, the realistic Iceberg shape: stats exist
    * for every column, the LAYOUT decides how much they can skip).
    * Wipes any prior layout at `dir`.
    */
  def write(df: DataFrame, dir: String, orderCols: Seq[String], nFiles: Int,
            statsColsOpt: Seq[String] = Seq.empty): Unit = {
    require(orderCols.nonEmpty && Bits * orderCols.length <= 60,
      s"up to ${60 / Bits} order columns")
    val statsCols = if (statsColsOpt.isEmpty) orderCols else statsColsOpt
    require(orderCols.forall(statsCols.contains),
      "statsCols must cover every order column")
    val spark = df.sparkSession
    fs(spark, dir).delete(new Path(dir), true)
    val entries = writeSubdir(df, dir, subName("base"), orderCols, statsCols, nFiles)
    commitManifest(spark, dir, orderCols, statsCols, entries)
  }

  /** Ingest a batch: its files land in a fresh subdirectory, z-sorted
    * WITHIN the batch (the stored order columns; batch-local ranges —
    * the sort only tightens the new files' own boxes), and the manifest
    * gains their stats entries in one atomic swap. Pruning stays SOUND
    * unconditionally; it gradually loosens as batch files' boxes
    * overlap the base generation's — [[optimize]] restores it.
    */
  def append(spark: SparkSession, dir: String, df: DataFrame, nFiles: Int): Unit = {
    if (df.isEmpty) return
    val m = readManifest(spark, dir)
    val entries = writeSubdir(df, dir, subName("batch"), m.orderCols, m.statsCols, nFiles)
    commitManifest(spark, dir, m.orderCols, m.statsCols, m.files ++ entries)
  }

  /** Rewrite the whole table as ONE globally-z-ordered generation and
    * swap the manifest to reference only it (Delta's OPTIMIZE ZORDER).
    * Old subdirectories stay on disk — a reader that resolved the old
    * manifest keeps reading complete, untouched files — until
    * [[vacuum]] reclaims them.
    */
  def optimize(spark: SparkSession, dir: String, nFiles: Int): Unit = {
    val m = readManifest(spark, dir)
    val entries = writeSubdir(readAll(spark, dir), dir, subName("opt"),
      m.orderCols, m.statsCols, nFiles)
    commitManifest(spark, dir, m.orderCols, m.statsCols, entries)
  }

  /** Delete every subdirectory the current manifest does not reference. */
  def vacuum(spark: SparkSession, dir: String): Unit = {
    val referenced = readManifest(spark, dir).files.map(_._1.split('/').head).toSet
    val f = fs(spark, dir)
    f.listStatus(new Path(dir)).foreach { st =>
      if (st.isDirectory && !referenced.contains(st.getPath.getName))
        f.delete(st.getPath, true)
    }
  }

  private final case class Manifest(orderCols: Seq[String], statsCols: Seq[String],
                                    files: Seq[(String, Seq[Long], Seq[Long])])

  private def readManifest(spark: SparkSession, dir: String): Manifest = {
    val in = fs(spark, dir).open(new Path(s"$dir/_skipping.json"))
    val bytes =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        var n = in.read(tmp)
        while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        buf.toByteArray
      } finally in.close()
    val root = mapper.readTree(bytes)
    def arr(k: String): Seq[String] =
      (0 until root.get(k).size()).map(root.get(k).get(_).asText())
    val files = (0 until root.get("files").size()).map { i =>
      val n = root.get("files").get(i)
      (n.get("file").asText(),
        (0 until n.get("min").size()).map(n.get("min").get(_).asLong()): Seq[Long],
        (0 until n.get("max").size()).map(n.get("max").get(_).asLong()): Seq[Long])
    }
    Manifest(arr("orderCols"), arr("indexCols"), files)
  }

  /** Every live row (the manifest's full file list). */
  def readAll(spark: SparkSession, dir: String): DataFrame = {
    val m = readManifest(spark, dir)
    spark.read.parquet(m.files.map(f => s"$dir/${f._1}"): _*)
  }

  /** File lists for a box predicate: (kept, total) — the metadata-only
    * skipping decision, exposed for audits.
    */
  def pruneFiles(spark: SparkSession, dir: String,
                 bounds: Map[String, (Long, Long)]): (Seq[String], Int) = {
    val m = readManifest(spark, dir)
    val unknown = bounds.keySet.diff(m.statsCols.toSet)
    require(unknown.isEmpty, s"not indexed by this layout: $unknown")
    val kept = m.files.collect {
      case (f, mins, maxs) if m.statsCols.indices.forall { i =>
        bounds.get(m.statsCols(i)).forall { case (lo, hi) =>
          maxs(i) >= lo && mins(i) <= hi }
      } => f
    }
    (kept, m.files.length)
  }

  /** Read the box: only stats-overlapping files are listed to the scan
    * (a file the manifest excludes PROVABLY holds no matching row),
    * and the residual filter is applied — and pushed down — on the
    * survivors.
    */
  def readBox(spark: SparkSession, dir: String,
              bounds: Map[String, (Long, Long)]): DataFrame = {
    require(bounds.nonEmpty, "a box read needs at least one bound")
    val (kept, _) = pruneFiles(spark, dir, bounds)
    val pred = bounds.map { case (c, (lo, hi)) =>
      col(c).cast("long").between(lo, hi)
    }.reduce(_ && _)
    if (kept.isEmpty) readAll(spark, dir).where(lit(false))
    else spark.read.parquet(kept.map(f => s"$dir/$f"): _*).where(pred)
  }

  /** Idempotent-per-JVM write (the `*Once` store convention). */
  def writeOnce(df: DataFrame, dir: String, orderCols: Seq[String],
                nFiles: Int): Unit = synchronized {
    val key = (dir, orderCols.mkString(","), nFiles, "write")
    if (!written.contains(key)) { write(df, dir, orderCols, nFiles); written += key }
  }

  /** The q114 pre-optimize state, idempotent per JVM: base write plus
    * one appended batch — sound but box-loosened pruning.
    */
  def lifecycleAppendedOnce(baseDf: DataFrame, batchDf: DataFrame, dir: String,
                            orderCols: Seq[String], nFiles: Int): Unit = synchronized {
    val key = (dir, orderCols.mkString(","), nFiles, "app")
    if (!written.contains(key)) {
      write(baseDf, dir, orderCols, nFiles)
      append(baseDf.sparkSession, dir, batchDf, math.max(1, nFiles / 4))
      written += key
    }
  }

  /** The q114 lifecycle, idempotent per JVM: base write on `baseDf`,
    * one appended batch, then OPTIMIZE back to one generation.
    */
  def lifecycleOptimizedOnce(baseDf: DataFrame, batchDf: DataFrame, dir: String,
                             orderCols: Seq[String], nFiles: Int): Unit = synchronized {
    val key = (dir, orderCols.mkString(","), nFiles, "opt")
    if (!written.contains(key)) {
      write(baseDf, dir, orderCols, nFiles)
      append(baseDf.sparkSession, dir, batchDf, math.max(1, nFiles / 4))
      optimize(baseDf.sparkSession, dir, nFiles)
      written += key
    }
  }

  private val written = scala.collection.mutable.Set.empty[(String, String, Int, String)]
}
