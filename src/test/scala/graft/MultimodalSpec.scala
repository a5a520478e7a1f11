package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{MediaBlob, Multimodal}

/** The binary media column with GENUINE binary payloads — random bytes
  * including invalid UTF-8, not text cast to binary: parquet round-trip
  * is bit-exact, ingest-time sidecar metadata matches a re-decode of
  * the read-back payloads, and metadata queries prune the blob column
  * out of the parquet scan entirely.
  */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private lazy val storePath = {
    val dir = java.nio.file.Files.createTempDirectory("graft_blobs").toString
    Multimodal.writeBlobStore(Multimodal.syntheticBlobs(spark, 200, seed = 11L), dir)
    dir
  }

  test("synthetic payloads are genuinely non-UTF8 binary") {
    import java.nio.charset.StandardCharsets.UTF_8
    val blobs = Multimodal.syntheticBlobs(spark, 200, seed = 11L).collect()
    // A charset-lossy path (bytes -> String -> bytes) must NOT be
    // identity for this fixture — that's what text.cast(binary) could
    // never prove.
    val corrupted = blobs.count { b =>
      !java.util.Arrays.equals(new String(b.payload, UTF_8).getBytes(UTF_8), b.payload)
    }
    assert(corrupted > 150, s"expected mostly non-UTF8 payloads, got $corrupted/200")
  }

  test("blob store round-trips payload bytes bit-for-bit through parquet") {
    import spark.implicits._
    val original = Multimodal.syntheticBlobs(spark, 200, seed = 11L)
      .collect().map(b => b.doc_id -> b.payload).toMap
    val readBack = Multimodal.readBlobStore(spark, storePath)
      .select("doc_id", "payload").as[(Long, Array[Byte])].collect()
    assert(readBack.length == 200)
    readBack.foreach { case (id, bytes) =>
      assert(java.util.Arrays.equals(bytes, original(id)), s"payload mismatch doc $id")
    }
  }

  test("ingest-time sidecar metadata equals a re-decode of read-back payloads") {
    import spark.implicits._
    val store = Multimodal.readBlobStore(spark, storePath)
    val sidecar = store
      .select("doc_id", "media_type", "byte_len", "sha256", "width", "height", "n_frames")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val redecoded = Multimodal.decode(
        store.select("doc_id", "media_type", "payload").as[MediaBlob])
      .toDF().orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(sidecar == redecoded)
  }

  test("image/* payloads are decoded by the REAL codec; non-image stays on the stub") {
    import spark.implicits._
    // Real tiny PNGs: decode must report the GENERATOR's dimensions
    // (8..31 px — outside the stub's 64+ range, so a stub leak is
    // detectable), one frame, and the true byte length.
    val pngs = spark.range(20L).map(id => Multimodal.pngBlob(id))
    val decoded = Multimodal.decode(pngs).collect()
    assert(decoded.length == 20)
    decoded.foreach { m =>
      val (ew, eh) = ((8 + m.doc_id * 37 % 24).toInt, (8 + m.doc_id * 53 % 24).toInt)
      assert((m.width, m.height, m.n_frames) == ((ew, eh, 1)),
        s"doc ${m.doc_id}: real decode must see the generated dims, got ${(m.width, m.height)}")
      assert(m.width < 64 && m.height < 64, "stub dims start at 64 — these must be real")
    }
    // Corrupt image bytes and non-image media types fall back to the stub.
    val junk = Seq(
      MediaBlob(100L, "image/png", Array[Byte](1, 2, 3, 4)),
      MediaBlob(101L, "video/fake", Multimodal.pngBlob(0L).payload)).toDS()
    val fallback = Multimodal.decode(junk).collect().sortBy(_.doc_id)
    assert(fallback.forall(m => m.width >= 64 && m.height >= 64),
      "undecodable or non-image payloads must take the stub path")
  }

  test("audio WAV payloads round-trip through the REAL javax.sound codec") {
    import spark.implicits._
    // Closed-form check against the generator: n samples, 8 kHz mono,
    // exact amplitude sum/peak recomputed independently here.
    val rows = Multimodal.audioDecode(
        spark.range(20L).select(org.apache.spark.sql.functions.col("id").as("doc_id")))
      .collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val id = r.getLong(0)
      val n = (64 + id * 37 % 192).toInt
      var expSum = 0L
      var expPeak = 0L
      (0 until n).foreach { i =>
        val v = ((7L * i * i + 29L * i + 13L * id) % 65536L) - 32768L
        expSum += v
        expPeak = math.max(expPeak, math.abs(v))
      }
      assert(r.getInt(1) == 8000, s"doc $id: sample rate drift")
      assert(r.getLong(2) == n.toLong, s"doc $id: sample count drift")
      assert(r.getLong(3) == expSum, s"doc $id: amplitude sum drift")
      assert(r.getLong(4) == expPeak, s"doc $id: amplitude peak drift")
    }
    // Malformed audio bytes take the None fallback, never throw.
    assert(Multimodal.decodeWav(Array[Byte](82, 73, 70, 70, 0, 1)).isEmpty)
    assert(Multimodal.decodeWav(Array.fill[Byte](64)(0x7F)).isEmpty)
  }

  test("q21f: Y4M parser round-trips the generator and rejects malformed/truncated clips") {
    val blob = Multimodal.y4mBlob(7L)
    val parsed = Multimodal.decodeY4m(blob.payload)
    assert(parsed.isDefined, "generated clip must parse")
    val (w, h, fps, fpsDen, frames) = parsed.get
    assert(w == (8 + 2 * ((7L * 13) % 12)).toInt && h == (8 + 2 * ((7L * 7) % 8)).toInt)
    assert(fps == 25 && fpsDen == 1 && frames.length == (2 + 7 % 5))
    // NTSC-style ratio survives the parse: both sides of F are read.
    val ntsc = ("YUV4MPEG2 W2 H2 F30000:1001 C420jpeg\nFRAME\n" +
      new String(Array.fill(6)('x'))).getBytes
    val ntscParsed = Multimodal.decodeY4m(ntsc)
    assert(ntscParsed.isDefined && ntscParsed.get._3 == 30000 && ntscParsed.get._4 == 1001)
    assert(frames.forall(_.length == w * h), "every frame carries a full luma plane")
    // Byte-level: first frame, raster index 3 is (7·id + 0 + 3) mod 251.
    assert((frames.head(3) & 0xFF) == ((7 * 7 + 3) % 251))
    // Untrusted-media fallbacks: garbage, truncation, odd dims → None.
    assert(Multimodal.decodeY4m("not a clip\n".getBytes).isEmpty)
    assert(Multimodal.decodeY4m(Array[Byte]()).isEmpty)
    assert(Multimodal.decodeY4m(blob.payload.dropRight(3)).isEmpty,
      "clip with a truncated last frame must be rejected")
    val oddDims = "YUV4MPEG2 W9 H8 F24:1\nFRAME\n".getBytes
    assert(Multimodal.decodeY4m(oddDims).isEmpty)
  }

  test("q21g: AVI demux round-trips the generator; frame JPEGs decode to the closed form") {
    val id = 11L
    val blob = Multimodal.mjpegAviBlob(id)
    val parsed = Multimodal.decodeAvi(blob.payload)
    assert(parsed.isDefined, "generated AVI must parse")
    val (w, h, fpsNum, fpsDen, declared, frames) = parsed.get
    assert(w == (16 * (2 + id % 3)).toInt && h == (8 * (2 + id % 4)).toInt)
    assert(fpsNum == (24 + id % 2).toInt && fpsDen == 1)
    assert(declared == (2 + id % 5).toInt)
    assert(frames.length == declared, "header count must equal '00dc' chunk count")
    // NTSC-style RATIONAL rate survives: patch the video strh's
    // dwScale/dwRate to 1001/30000 — the parser must report the ratio,
    // not an integer truncation (the decodeY4m F-ratio lesson).
    val ntsc = blob.payload.clone()
    val strhAt = {
      var i = 12
      while (!(ntsc(i) == 's' && ntsc(i + 1) == 't' && ntsc(i + 2) == 'r' && ntsc(i + 3) == 'h')) i += 1
      i
    }
    def putLe32(at: Int, v: Int): Unit = {
      ntsc(at) = (v & 0xFF).toByte; ntsc(at + 1) = ((v >> 8) & 0xFF).toByte
      ntsc(at + 2) = ((v >> 16) & 0xFF).toByte; ntsc(at + 3) = ((v >> 24) & 0xFF).toByte
    }
    putLe32(strhAt + 8 + 20, 1001)  // dwScale
    putLe32(strhAt + 8 + 24, 30000) // dwRate
    val rational = Multimodal.decodeAvi(ntsc)
    assert(rational.isDefined && rational.get._3 == 30000 && rational.get._4 == 1001,
      s"rational strh rate must survive the parse: ${rational.map(r => (r._3, r._4))}")
    // Every frame is a genuine standalone JPEG (SOI marker) that the
    // real codec decodes back to the EXACT two-band grays.
    frames.zipWithIndex.foreach { case (jp, f) =>
      assert((jp(0) & 0xFF) == 0xFF && (jp(1) & 0xFF) == 0xD8, "JPEG SOI")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jp))
      assert(img.getWidth == w && img.getHeight == h)
      val vL = ((7 * id + 17 * f) % 256).toInt
      val vR = ((11 * id + 29 * f + 101) % 256).toInt
      assert((img.getRGB(0, 0) & 0xFF) == vL, "left band gray must round-trip exactly")
      assert((img.getRGB(w - 1, h - 1) & 0xFF) == vR, "right band gray must round-trip exactly")
    }
    // Untrusted-media fallbacks: garbage, wrong magic, truncation → None.
    assert(Multimodal.decodeAvi("not a clip".getBytes).isEmpty)
    assert(Multimodal.decodeAvi(Array[Byte]()).isEmpty)
    val wrongForm = blob.payload.clone()
    wrongForm(8) = 'W'.toByte
    assert(Multimodal.decodeAvi(wrongForm).isEmpty, "non-AVI RIFF form must be rejected")
    // Truncating the trailing idx1 leaves the demuxed frames intact
    // (the bounds-checked walk just stops); truncating INTO the movi
    // list loses the stream and must reject.
    val idxTrunc = Multimodal.decodeAvi(blob.payload.dropRight(3))
    assert(idxTrunc.isDefined && idxTrunc.get._6.length == declared)
    val moviTrunc = Multimodal.decodeAvi(blob.payload.dropRight(200))
    assert(moviTrunc.isEmpty || moviTrunc.get._6.length < declared)
  }

  test("metadata catalog query prunes the payload column from the parquet scan") {
    val catalog = Multimodal.blobCatalog(Multimodal.readBlobStore(spark, storePath))
    val scanned = catalog.queryExecution.sparkPlan.collectLeaves()
      .collect { case f: FileSourceScanExec => f.requiredSchema.fieldNames.toSet }
    assert(scanned.nonEmpty)
    scanned.foreach { fields =>
      assert(!fields.contains("payload"), s"blob column reached the scan: $fields")
      assert(!fields.contains("sha256"), s"unneeded wide column scanned: $fields")
    }
    assert(catalog.count() > 0)
  }
}
