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
  *   - write: each indexed column is fixed-width-bucketed to 10 bits
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
  * This is the layout tier under [[EventLogStore]]'s time-bucket
  * partition pruning: directory partitioning can serve ONE dimension;
  * the z-order manifest serves boxes on any subset of the indexed
  * columns without exploding directory counts.
  */
object SkippingStore {

  private val Bits = 10

  private val mapper = new ObjectMapper

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Write `df` z-ordered on `orderCols` (integral-typed) into
    * `nFiles` files under `dir/data`, and the per-file stats manifest
    * over `statsCols` (default: the order columns — pass a superset to
    * record stats for columns the layout does NOT cluster, the
    * realistic Iceberg shape: stats exist for every column, the LAYOUT
    * decides how much they can skip). Wipes any prior layout at `dir`.
    */
  def write(df: DataFrame, dir: String, orderCols: Seq[String], nFiles: Int,
            statsColsOpt: Seq[String] = Seq.empty): Unit = {
    require(orderCols.nonEmpty && Bits * orderCols.length <= 60,
      s"up to ${60 / Bits} order columns")
    val statsCols = if (statsColsOpt.isEmpty) orderCols else statsColsOpt
    require(orderCols.forall(statsCols.contains),
      "statsCols must cover every order column")
    val spark = df.sparkSession
    val f = fs(spark, dir)
    f.delete(new Path(dir), true)
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
      .write.mode("overwrite").parquet(s"$dir/data")
    // One grouped pass: exact per-file [min, max] of every stats column.
    val indexCols = statsCols
    val statAggs = indexCols.flatMap(c =>
      Seq(min(col(c).cast("long")).as(s"mn_$c"), max(col(c).cast("long")).as(s"mx_$c")))
    val rows = spark.read.parquet(s"$dir/data")
      .groupBy(input_file_name().as("_f"))
      .agg(statAggs.head, statAggs.tail: _*)
      .collect()
    val root: ObjectNode = mapper.createObjectNode()
    val colsArr = root.putArray("indexCols")
    indexCols.foreach(colsArr.add)
    val files = root.putArray("files")
    rows.foreach { r =>
      val n = files.addObject()
      n.put("file", r.getString(0).substring(r.getString(0).lastIndexOf('/') + 1))
      val mins = n.putArray("min"); val maxs = n.putArray("max")
      indexCols.indices.foreach { i =>
        mins.add(r.getLong(1 + 2 * i)); maxs.add(r.getLong(2 + 2 * i))
      }
    }
    val out = f.create(new Path(s"$dir/_skipping.json"), true)
    try out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
      .getBytes("UTF-8")) finally out.close()
  }

  /** The manifest's file→stats table: (file, mins, maxs) aligned with
    * `indexCols`.
    */
  private def manifest(spark: SparkSession, dir: String): (Seq[String], Seq[(String, Seq[Long], Seq[Long])]) = {
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
    val cols = (0 until root.get("indexCols").size()).map(root.get("indexCols").get(_).asText())
    val files = (0 until root.get("files").size()).map { i =>
      val n = root.get("files").get(i)
      (n.get("file").asText(),
        (0 until n.get("min").size()).map(n.get("min").get(_).asLong()): Seq[Long],
        (0 until n.get("max").size()).map(n.get("max").get(_).asLong()): Seq[Long])
    }
    (cols, files)
  }

  /** File lists for a box predicate: (kept, total) — the metadata-only
    * skipping decision, exposed for audits.
    */
  def pruneFiles(spark: SparkSession, dir: String,
                 bounds: Map[String, (Long, Long)]): (Seq[String], Int) = {
    val (cols, files) = manifest(spark, dir)
    val unknown = bounds.keySet.diff(cols.toSet)
    require(unknown.isEmpty, s"not indexed by this layout: $unknown")
    val kept = files.collect {
      case (f, mins, maxs) if cols.indices.forall { i =>
        bounds.get(cols(i)).forall { case (lo, hi) => maxs(i) >= lo && mins(i) <= hi }
      } => f
    }
    (kept, files.length)
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
    if (kept.isEmpty) spark.read.parquet(s"$dir/data").where(lit(false))
    else spark.read.parquet(kept.map(f => s"$dir/data/$f"): _*).where(pred)
  }

  /** Idempotent-per-JVM write (the `*Once` store convention). */
  def writeOnce(df: DataFrame, dir: String, orderCols: Seq[String],
                nFiles: Int): Unit = synchronized {
    val key = (dir, orderCols.mkString(","), nFiles)
    if (!written.contains(key)) { write(df, dir, orderCols, nFiles); written += key }
  }

  private val written = scala.collection.mutable.Set.empty[(String, String, Int)]
}
