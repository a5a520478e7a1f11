package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Manifest-versioned IVF-PQ index — the transactional layer
  * [[VectorIndexStore.compact]]'s durability note promises ("a
  * production deployment stages the swap under one manifest/table-format
  * commit (the Delta/Iceberg shape) instead of raw directory renames").
  * Same trained artifacts and serving kernels as [[VectorIndexStore]];
  * what changes is VISIBILITY:
  *
  *   - Data files are IMMUTABLE once written. No operation deletes or
  *     rewrites a referenced file — compaction writes NEW merged files
  *     and commits a manifest that stops referencing the old ones.
  *   - A version manifest (`_versions/v%08d.json`) lists, by explicit
  *     file name, every code/tombstone file and the model directory of
  *     that version. Readers resolve a snapshot ONCE and read exactly
  *     the listed files — a concurrent append/delete/compact commits new
  *     manifests but can never change what a pinned reader sees
  *     (snapshot isolation), and a crashed writer's half-written segment
  *     is invisible because no manifest names it.
  *   - Commit is one atomic rename of the manifest file into its final
  *     versioned name, with an optimistic expected-version check:
  *     concurrent committers race on the rename and the loser gets a
  *     conflict error, never a corrupted table (single-JVM committers
  *     additionally serialize on the object lock; multi-writer
  *     deployments on rename-overwriting filesystems — S3-style — need
  *     a coordination service exactly as Delta does).
  *   - Old versions stay readable (time travel) until [[vacuum]]
  *     drops their manifests and unreferenced files.
  *
  * The serving layout survives intact: code segments are still
  * PARTITIONED BY coarse cell, and a snapshot read goes through
  * `basePath` + explicit file lists so `cid` pruning still happens at
  * FILE level within every segment. The segment count a read unions is
  * the number of commits since the last compaction — bounded by the
  * maintenance schedule, the LSM/Delta shape.
  */
object VersionedVectorIndex {

  /** One immutable file group of a version: `kind` ∈ codes|tombstones,
    * `dir` relative to the store root, `files` relative to `dir`
    * (partition subdirs included), `rows` recorded at commit time so
    * [[history]] is a manifest-only read.
    */
  final case class Segment(kind: String, dir: String, files: Seq[String], rows: Long)

  /** A resolved version: the committed manifest, parsed. `meta` carries
    * the training parameters recorded at build time, so the store is
    * self-describing — [[reindex]] needs no caller-supplied config.
    */
  final case class Snapshot(version: Long, op: String, modelDir: String,
                            segments: Seq[Segment],
                            meta: Map[String, String] = Map.empty)

  /** Sentinel for "latest committed version". */
  val Latest: Long = -1L

  // ---------------------------------------------------------------- fs

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionsPath(dir: String) = new Path(s"$dir/_versions")

  private def manifestPath(dir: String, v: Long) =
    new Path(versionsPath(dir), f"v$v%08d.json")

  /** All committed version numbers, ascending; empty for a fresh dir. */
  private def committedVersions(f: FileSystem, dir: String): Seq[Long] = {
    val vp = versionsPath(dir)
    if (!f.exists(vp)) Seq.empty
    else f.listStatus(vp).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.matches("v\\d{8}\\.json") => n.substring(1, 9).toLong }
      .sorted
  }

  def currentVersion(spark: SparkSession, dir: String): Long = {
    val vs = committedVersions(fs(spark, dir), dir)
    if (vs.isEmpty) -1L else vs.last
  }

  // ------------------------------------------------------- manifest io

  private val mapper = new ObjectMapper

  private def writeManifest(f: FileSystem, dir: String, snap: Snapshot): Unit = {
    val root: ObjectNode = mapper.createObjectNode()
    root.put("version", snap.version)
    root.put("op", snap.op)
    root.put("model", snap.modelDir)
    val segs: ArrayNode = root.putArray("segments")
    snap.segments.foreach { s =>
      val n = segs.addObject()
      n.put("kind", s.kind)
      n.put("dir", s.dir)
      n.put("rows", s.rows)
      val files = n.putArray("files")
      s.files.foreach(files.add)
    }
    val meta = root.putObject("meta")
    snap.meta.toSeq.sortBy(_._1).foreach { case (k, v) => meta.put(k, v) }
    val json = mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
    val tmp = new Path(versionsPath(dir),
      s".tmp-${java.util.UUID.randomUUID().toString}.json")
    val out = f.create(tmp, false)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    val dest = manifestPath(dir, snap.version)
    // Optimistic concurrency: the version slot must be free. File
    // rename on POSIX overwrites, so check-then-rename (atomic within a
    // JVM under the object lock; cross-process writers on such
    // filesystems need an external coordinator, the documented caveat).
    if (f.exists(dest)) {
      f.delete(tmp, false)
      throw new IllegalStateException(
        s"concurrent commit: version ${snap.version} already exists in $dir")
    }
    if (!f.rename(tmp, dest)) {
      f.delete(tmp, false)
      throw new IllegalStateException(s"manifest rename failed for $dest")
    }
  }

  private def parseManifest(f: FileSystem, p: Path): Snapshot = {
    val in = f.open(p)
    val bytes =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        var n = in.read(tmp)
        while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        buf.toByteArray
      } finally in.close()
    val root = mapper.readTree(bytes)
    val segs = (0 until root.get("segments").size()).map { i =>
      val s = root.get("segments").get(i)
      Segment(
        s.get("kind").asText(),
        s.get("dir").asText(),
        (0 until s.get("files").size()).map(j => s.get("files").get(j).asText()),
        s.get("rows").asLong())
    }
    val meta = Option(root.get("meta")).map { m =>
      val it = m.fieldNames()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val k = it.next(); b += k -> m.get(k).asText() }
      b.result()
    }.getOrElse(Map.empty[String, String])
    Snapshot(root.get("version").asLong(), root.get("op").asText(),
      root.get("model").asText(), segs, meta)
  }

  /** The resolved manifest of `version` ([[Latest]] = newest). Throws if
    * the version was never committed or was [[vacuum]]ed away.
    */
  def snapshot(spark: SparkSession, dir: String, version: Long = Latest): Snapshot = {
    val f = fs(spark, dir)
    val v = if (version == Latest) {
      val vs = committedVersions(f, dir)
      require(vs.nonEmpty, s"no committed version in $dir")
      vs.last
    } else version
    val p = manifestPath(dir, v)
    require(f.exists(p), s"version $v is not available in $dir (never committed, or vacuumed)")
    parseManifest(f, p)
  }

  // ----------------------------------------------------- segment write

  /** Relative paths of every parquet part file under `seg`, sorted —
    * the file list frozen into the manifest at commit time.
    */
  private def listParquet(f: FileSystem, seg: Path): Seq[String] = {
    val base = seg.toUri.getPath
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = f.listFiles(seg, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet"))
        out += st.getPath.toUri.getPath.stripPrefix(base).stripPrefix("/")
    }
    out.sorted.toSeq
  }

  /** Write `codesDf` as an immutable cid-partitioned code segment and
    * return its manifest entry. The segment is INVISIBLE until a
    * manifest referencing it commits.
    */
  private def writeCodeSegment(spark: SparkSession, dir: String, name: String,
                               codesDf: DataFrame): Segment = {
    val segDir = s"$dir/$name"
    codesDf
      .repartition(col("cid"))
      .sortWithinPartitions("vec_id")
      .write.partitionBy("cid").mode("overwrite").parquet(segDir)
    val f = fs(spark, dir)
    val files = listParquet(f, new Path(segDir))
    // Footer-level count of what actually landed (at cluster scale the
    // write job's task metrics carry this for free).
    val rows = spark.read.parquet(segDir).count()
    Segment("codes", name, files, rows)
  }

  /** Write `assigned` (vec_id, cid, embedding) as an immutable
    * cell-partitioned RAW-VECTOR segment. The store owning a second,
    * cell-partitioned copy of the floats is a deliberate trade (the
    * FAISS-deployment layout): it costs float storage twice, and buys
    * (a) file-pruned exact re-rank — a query's float reads drop to
    * |probed cells| / |cells| of the corpus instead of a full
    * id-keyed lookup table scan — and (b) self-contained [[reindex]],
    * which retrains from the store alone without the original corpus.
    */
  private def writeVectorSegment(spark: SparkSession, dir: String, name: String,
                                 assigned: DataFrame): Segment = {
    val segDir = s"$dir/$name"
    assigned
      .select(col("vec_id"), col("cid").cast("long").as("cid"), col("embedding"))
      .repartition(col("cid"))
      .sortWithinPartitions("vec_id")
      .write.partitionBy("cid").mode("overwrite").parquet(segDir)
    val f = fs(spark, dir)
    val files = listParquet(f, new Path(segDir))
    val rows = spark.read.parquet(segDir).count()
    Segment("vectors", name, files, rows)
  }

  private def writeTombstoneSegment(spark: SparkSession, dir: String, name: String,
                                    ids: DataFrame): Segment = {
    val segDir = s"$dir/$name"
    ids.select(col("vec_id").cast("long").as("vec_id"))
      .write.mode("overwrite").parquet(segDir)
    val f = fs(spark, dir)
    val files = listParquet(f, new Path(segDir))
    val rows = spark.read.parquet(segDir).count()
    Segment("tombstones", name, files, rows)
  }

  // ------------------------------------------------------------- reads

  private def readSegments(spark: SparkSession, dir: String, segs: Seq[Segment],
                           kind: String, partitioned: Boolean): Option[DataFrame] = {
    val frames = segs.filter(s => s.kind == kind && s.files.nonEmpty).map { s =>
      val segDir = s"$dir/${s.dir}"
      val paths = s.files.map(f => s"$segDir/$f")
      // basePath recovers the cid partition column from the explicit
      // file list; files appended to the directory AFTER this commit
      // are not in the list, so the read is a true snapshot.
      val r = if (partitioned) spark.read.option("basePath", segDir) else spark.read
      r.parquet(paths: _*)
    }
    frames.reduceOption(_ unionByName _)
  }

  /** The code table at `version`: (vec_id, cid, codes) — a union of the
    * version's code segments, each read by its frozen file list (cid
    * pruning stays file-level inside every segment).
    */
  def codes(spark: SparkSession, dir: String, version: Long = Latest): DataFrame = {
    val snap = snapshot(spark, dir, version)
    readSegments(spark, dir, snap.segments, "codes", partitioned = true)
      .getOrElse(sys.error(s"version ${snap.version} of $dir has no code segment"))
      .select(col("vec_id"), col("cid").cast("long").as("cid"), col("codes"))
  }

  /** The tombstone set at `version` (empty frame when none). */
  def tombstones(spark: SparkSession, dir: String, version: Long = Latest): DataFrame = {
    val snap = snapshot(spark, dir, version)
    readSegments(spark, dir, snap.segments, "tombstones", partitioned = false)
      .getOrElse {
        import spark.implicits._
        spark.emptyDataset[Long].toDF("vec_id")
      }
  }

  /** Serving view at `version`: codes minus tombstoned ids (broadcast
    * anti-join AFTER cell pruning, the [[VectorIndexStore.liveCodes]]
    * contract).
    */
  def liveCodes(spark: SparkSession, dir: String, version: Long = Latest): DataFrame = {
    val snap = snapshot(spark, dir, version)
    val c = readSegments(spark, dir, snap.segments, "codes", partitioned = true)
      .getOrElse(sys.error(s"version ${snap.version} of $dir has no code segment"))
      .select(col("vec_id"), col("cid").cast("long").as("cid"), col("codes"))
    readSegments(spark, dir, snap.segments, "tombstones", partitioned = false) match {
      case Some(t) => c.join(broadcast(t), Seq("vec_id"), "left_anti")
      case None => c
    }
  }

  /** The raw-vector table at `version`: (vec_id, cid, embedding) —
    * cell-partitioned float vectors owned by the store (see
    * [[writeVectorSegment]] for the storage trade).
    */
  def vectors(spark: SparkSession, dir: String, version: Long = Latest): DataFrame = {
    val snap = snapshot(spark, dir, version)
    readSegments(spark, dir, snap.segments, "vectors", partitioned = true)
      .getOrElse(sys.error(s"version ${snap.version} of $dir has no vector segment"))
      .select(col("vec_id"), col("cid").cast("long").as("cid"), col("embedding"))
  }

  /** Serving view of the raw vectors: minus tombstoned ids. */
  def liveVectors(spark: SparkSession, dir: String, version: Long = Latest): DataFrame = {
    val snap = snapshot(spark, dir, version)
    val v = readSegments(spark, dir, snap.segments, "vectors", partitioned = true)
      .getOrElse(sys.error(s"version ${snap.version} of $dir has no vector segment"))
      .select(col("vec_id"), col("cid").cast("long").as("cid"), col("embedding"))
    readSegments(spark, dir, snap.segments, "tombstones", partitioned = false) match {
      case Some(t) => v.join(broadcast(t), Seq("vec_id"), "left_anti")
      case None => v
    }
  }

  /** The version's coarse quantizer (cid, cemb). */
  def centroids(spark: SparkSession, dir: String, version: Long = Latest): DataFrame =
    spark.read.parquet(s"$dir/${snapshot(spark, dir, version).modelDir}/centroids")

  /** The version's PQ sub-codebooks (m, cid, cemb). */
  def codebooks(spark: SparkSession, dir: String, version: Long = Latest): DataFrame =
    spark.read.parquet(s"$dir/${snapshot(spark, dir, version).modelDir}/codebooks")

  /** The commit log as a frame — (version, op, codes_rows,
    * tombstone_rows), straight from the manifests: answering "what
    * happened to this index and how big was it" reads METADATA only,
    * never a data file.
    */
  def history(spark: SparkSession, dir: String): DataFrame = {
    val f = fs(spark, dir)
    val rows = committedVersions(f, dir).map { v =>
      val s = parseManifest(f, manifestPath(dir, v))
      (s.version, s.op,
        s.segments.filter(_.kind == "codes").map(_.rows).sum,
        s.segments.filter(_.kind == "tombstones").map(_.rows).sum)
    }
    import spark.implicits._
    rows.toDF("version", "op", "codes_rows", "tombstone_rows")
      .orderBy("version")
  }

  /** Test seam for the optimistic-concurrency guard: attempt a raw
    * manifest commit (what a concurrent cross-process writer's final
    * step is). Throws the conflict error if the version slot is taken.
    */
  private[graft] def commitForTest(spark: SparkSession, dir: String, snap: Snapshot): Unit =
    writeManifest(fs(spark, dir), dir, snap)

  // -------------------------------------------------------- operations

  /** Train on `emb` and commit version 0. Wipes any prior lineage under
    * `dir` first — a rebuild is a NEW index (the
    * [[VectorIndexStore.build]] contract, manifest edition).
    */
  def build(emb: DataFrame, dir: String, nCentroids: Int, nSub: Int,
            nCodes: Int, iters: Int): Long = synchronized {
    val spark = emb.sparkSession
    val f = fs(spark, dir)
    f.delete(new Path(dir), true)
    val (coarse, books, codesDf) =
      Similarity.ivfPqArtifacts(emb, nCentroids, nSub, nCodes, iters)
    val modelDir = "model-v00000000"
    coarse.write.mode("overwrite").parquet(s"$dir/$modelDir/centroids")
    books.write.mode("overwrite").parquet(s"$dir/$modelDir/codebooks")
    val seg = writeCodeSegment(spark, dir, "seg-00000000-build", codesDf)
    // Raw vectors, cell-partitioned under the SAME assignment the codes
    // carry (assignTo is deterministic) — map-only, one broadcast row.
    val vseg = writeVectorSegment(spark, dir, "seg-00000000-build-vecs",
      Similarity.assignTo(Similarity.withEmb(emb), coarse))
    writeManifest(f, dir, Snapshot(0L, "build", modelDir, Seq(seg, vseg),
      trainParams(nCentroids, nSub, nCodes, iters)))
    0L
  }

  private def trainParams(nCentroids: Int, nSub: Int, nCodes: Int,
                          iters: Int): Map[String, String] =
    Map("nCentroids" -> nCentroids.toString, "nSub" -> nSub.toString,
      "nCodes" -> nCodes.toString, "iters" -> iters.toString)

  /** Admit new vectors against the STORED model (assign to stored
    * centroids, encode against stored books — the
    * [[VectorIndexStore.append]] kernel) and commit a version whose
    * manifest is the prior segments plus one new code segment. Existing
    * files and the model are untouched. Returns the committed version.
    */
  def append(spark: SparkSession, dir: String, newVecs: DataFrame): Long = synchronized {
    // Revival of a tombstoned id must not leave two live generations:
    // fold deletions physically first (an extra committed version, the
    // same amortized rewrite VectorIndexStore.append performs).
    val newIds = newVecs.select(col("vec_id").cast("long").as("vec_id")).distinct()
    if (!tombstones(spark, dir).join(broadcast(newIds), Seq("vec_id"), "left_semi").isEmpty)
      compact(spark, dir)
    val prior = snapshot(spark, dir)
    val v = prior.version + 1
    val books = codebooks(spark, dir)
    val nSub = books.agg(max("m")).first().getAs[Number](0).intValue + 1
    val coarse = centroids(spark, dir)
    val resid = Similarity.residuals(Similarity.withEmb(newVecs), coarse)
    val seg = writeCodeSegment(spark, dir, f"seg-$v%08d-append",
      Similarity.encodeResiduals(resid, books, nSub))
    val vseg = writeVectorSegment(spark, dir, f"seg-$v%08d-append-vecs",
      Similarity.assignTo(Similarity.withEmb(newVecs), coarse))
    writeManifest(fs(spark, dir), dir,
      Snapshot(v, "append", prior.modelDir, prior.segments :+ seg :+ vseg,
        prior.meta))
    v
  }

  /** Tombstone-delete `ids`: one new tombstone segment, no code file
    * touched. Returns the committed version.
    */
  def delete(spark: SparkSession, dir: String, ids: DataFrame): Long = synchronized {
    val prior = snapshot(spark, dir)
    val v = prior.version + 1
    val seg = writeTombstoneSegment(spark, dir, f"seg-$v%08d-delete", ids)
    writeManifest(fs(spark, dir), dir,
      Snapshot(v, "delete", prior.modelDir, prior.segments :+ seg, prior.meta))
    v
  }

  /** Physical compaction WITHOUT a destructive swap: write the live
    * view as one new merged segment (one file per cell) and commit a
    * manifest referencing ONLY it — no tombstones, no prior code
    * segments. The superseded files stay on disk untouched, so a reader
    * pinned at any earlier version is completely unaffected and time
    * travel works THROUGH the compaction; [[vacuum]] reclaims the space
    * once old versions age out. This removes the crash window
    * [[VectorIndexStore.compact]] documents: there is no
    * delete-then-rename — a crash before the manifest rename leaves the
    * old version live and the half-written segment invisible, and the
    * recovery rule is simply "retry".
    */
  def compact(spark: SparkSession, dir: String): Long = synchronized {
    val prior = snapshot(spark, dir)
    val v = prior.version + 1
    val seg = writeCodeSegment(spark, dir, f"seg-$v%08d-compact",
      liveCodes(spark, dir, prior.version))
    val vseg = writeVectorSegment(spark, dir, f"seg-$v%08d-compact-vecs",
      liveVectors(spark, dir, prior.version))
    writeManifest(fs(spark, dir), dir,
      Snapshot(v, "compact", prior.modelDir, Seq(seg, vseg), prior.meta))
    v
  }

  /** Retrain the WHOLE index from the store's own live vectors — the
    * model-refresh an operator schedules when [[history]]/occupancy
    * drift says the append stream has outgrown the trained quantizer.
    * Commits a new model dir plus fully re-encoded code and re-
    * partitioned vector segments as ONE version; the training
    * parameters come from the manifest (the store is self-describing).
    * This is the blue/green index swap: readers pinned at any earlier
    * version keep serving the OLD model untouched (spec-pinned), and
    * the first read after the commit serves the new one — zero
    * downtime, no coordination beyond the manifest rename.
    */
  def reindex(spark: SparkSession, dir: String): Long = synchronized {
    val prior = snapshot(spark, dir)
    val v = prior.version + 1
    val p = prior.meta
    require(Seq("nCentroids", "nSub", "nCodes", "iters").forall(p.contains),
      s"store $dir has no recorded training parameters — built by an older layout?")
    val vecs = liveVectors(spark, dir, prior.version)
      .select(col("vec_id"), col("embedding"))
    val (coarse, books, codesDf) = Similarity.ivfPqArtifacts(vecs,
      p("nCentroids").toInt, p("nSub").toInt, p("nCodes").toInt, p("iters").toInt)
    val modelDir = f"model-v$v%08d"
    coarse.write.mode("overwrite").parquet(s"$dir/$modelDir/centroids")
    books.write.mode("overwrite").parquet(s"$dir/$modelDir/codebooks")
    val seg = writeCodeSegment(spark, dir, f"seg-$v%08d-reindex", codesDf)
    // The new model reshapes the cells, so the vector copy re-partitions
    // under the NEW assignment (old segments stay for time travel).
    val vseg = writeVectorSegment(spark, dir, f"seg-$v%08d-reindex-vecs",
      Similarity.assignTo(Similarity.withEmb(vecs), coarse))
    writeManifest(fs(spark, dir), dir,
      Snapshot(v, "reindex", modelDir, Seq(seg, vseg), prior.meta))
    v
  }

  /** Drop all but the newest `retain` versions: delete their manifests,
    * then every segment/model directory no surviving manifest
    * references. After vacuum, time travel to a dropped version fails
    * fast at [[snapshot]]; the retained versions serve byte-identically
    * (their files were never touched).
    */
  def vacuum(spark: SparkSession, dir: String, retain: Int): Unit = synchronized {
    require(retain >= 1, "vacuum must retain at least the latest version")
    val f = fs(spark, dir)
    val vs = committedVersions(f, dir)
    val (drop, keep) = vs.splitAt(math.max(0, vs.length - retain))
    val kept = keep.map(v => parseManifest(f, manifestPath(dir, v)))
    val referenced = kept.flatMap(s => s.segments.map(_.dir) :+ s.modelDir).toSet
    drop.foreach(v => f.delete(manifestPath(dir, v), false))
    f.listStatus(new Path(dir)).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n != "_versions" && !referenced.contains(n))
        f.delete(st.getPath, true)
    }
  }

  // ----------------------------------------------------- query helpers

  /** The q107 lifecycle — build(base) v0, append(rest) v1, delete v2,
    * compact v3 — once per (dir, params) per JVM: queries against the
    * versioned store measure SERVING and TIME TRAVEL, not maintenance
    * (the [[VectorIndexStore.buildOnce]] idempotence contract).
    */
  def lifecycleOnce(spark: SparkSession, dir: String, baseEmb: DataFrame,
                    newEmb: DataFrame, delIds: DataFrame, nCentroids: Int,
                    nSub: Int, nCodes: Int, iters: Int): Unit = synchronized {
    val key = (dir, nCentroids, nSub, nCodes, iters)
    if (!lifecycled.contains(key)) {
      build(baseEmb, dir, nCentroids, nSub, nCodes, iters)
      append(spark, dir, newEmb)
      delete(spark, dir, delIds)
      compact(spark, dir)
      lifecycled += key
    }
  }

  /** The q108b lifecycle — q107's four versions plus a v4 [[reindex]]
    * — once per (dir, params) per JVM.
    */
  def lifecycleReindexedOnce(spark: SparkSession, dir: String, baseEmb: DataFrame,
                             newEmb: DataFrame, delIds: DataFrame, nCentroids: Int,
                             nSub: Int, nCodes: Int, iters: Int): Unit = synchronized {
    val key = (dir, nCentroids, nSub, nCodes, iters)
    if (!reindexed.contains(key)) {
      build(baseEmb, dir, nCentroids, nSub, nCodes, iters)
      append(spark, dir, newEmb)
      delete(spark, dir, delIds)
      compact(spark, dir)
      reindex(spark, dir)
      reindexed += key
    }
  }

  private val lifecycled = scala.collection.mutable.Set.empty[(String, Int, Int, Int, Int)]
  private val reindexed = scala.collection.mutable.Set.empty[(String, Int, Int, Int, Int)]
}
