package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import graft.operators.SyncRequest
import graft.streaming.{SyncConfig, SyncEngine}
import scala.collection.mutable

/** Streaming throughput bench: sustained syncs/s and per-microbatch
  * latency through [[graft.streaming.SyncEngine]] — the one workload
  * the reference actually publishes numbers for (20 ticks/s, ~5
  * syncs/s/client — /root/reference/model/game.go:10-15,
  * README.md:21-27; a reference deployment therefore sustains
  * ~5·clients syncs/s total).
  *
  * Method: for each stream count N, feed a deterministic schedule of
  * N streams x clients x syncs through the engine as microbatches
  * (MemoryStream, noop-equivalent memory sink discarded), measure wall
  * time over the fed batches and per-trigger latency via a
  * StreamingQueryListener. Per-stream processing is sequential by
  * semantics (the reference's per-stream mutex), so throughput should
  * scale with N up to the core count — that scale-out curve is the
  * point of reporting multiple N.
  *
  * Emits one JSON line, same convention as [[Bench]]:
  * {"metric":"stream_syncs_per_sec","points":[{"streams":N,...}],...}
  */
object StreamBench {
  private case class Point(streams: Int, syncs: Long, wallSec: Double,
                           syncsPerSec: Double, batchMsP50: Long, batchMsMax: Long)
  private case class PackPoint(shards: Int, docs: Long, wallSec: Double, docsPerSec: Double)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val streamCounts = sys.env.getOrElse("SPARK_GRAFT_STREAMS", "8,32,128")
      .split(',').map(_.trim.toInt).toSeq
    val syncsPerStream = sys.env.getOrElse("SPARK_GRAFT_SYNCS_PER_STREAM", "1000").toInt
    val spark = GraftSession.build(cpus)
    spark.sparkContext.setLogLevel("WARN")

    // Untimed warm-up: JIT the fold + state-store codepaths.
    runPoint(spark, streams = 4, syncsPerStream = 200, microbatches = 4)

    val points = streamCounts.map { n =>
      val p = runPoint(spark, n, syncsPerStream, microbatches = 10)
      System.err.println(f"[streambench] streams=$n syncs=${p.syncs} wall=${p.wallSec}%.2fs " +
        f"=> ${p.syncsPerSec}%.0f syncs/s (batch p50=${p.batchMsP50}ms max=${p.batchMsMax}ms)")
      p
    }
    // Second surface: sustained docs/s through the streaming sequence
    // packer (S12's operator) across shard counts — shards are the
    // packer's scale-out axis exactly as streams are the sync engine's.
    runPackerPoint(spark, shards = 4, totalDocs = 4000, microbatches = 4) // warm-up
    val packPoints = streamCounts.map { n =>
      val p = runPackerPoint(spark, n, totalDocs = 40000, microbatches = 10)
      System.err.println(f"[streambench] pack shards=$n docs=${p.docs} wall=${p.wallSec}%.2fs " +
        f"=> ${p.docsPerSec}%.0f docs/s")
      p
    }

    val js = points.map { p =>
      f"""{"streams":${p.streams},"syncs":${p.syncs},"wall_s":${p.wallSec}%.3f,""" +
      f""""syncs_per_sec":${p.syncsPerSec}%.1f,"batch_ms_p50":${p.batchMsP50},"batch_ms_max":${p.batchMsMax}}"""
    }.mkString("[", ",", "]")
    val pjs = packPoints.map { p =>
      f"""{"shards":${p.shards},"docs":${p.docs},"wall_s":${p.wallSec}%.3f,"docs_per_sec":${p.docsPerSec}%.1f}"""
    }.mkString("[", ",", "]")
    val best = points.map(_.syncsPerSec).max
    val bestPack = packPoints.map(_.docsPerSec).max
    println(f"""{"metric":"stream_syncs_per_sec","value":$best%.1f,"unit":"syncs/sec","points":$js,""" +
      f""""packer_docs_per_sec":$bestPack%.1f,"packer_points":$pjs,""" +
      f""""cores":$cpus,"reference":{"ticks_per_sec":20,"syncs_per_sec_per_client":5}}""")
    spark.stop()
  }

  /** Drive the streaming chunk packer at one shard count: `totalDocs`
    * ~50-token docs in doc_id order, split into microbatches, noop
    * sink. Per-shard state is one Long, so the measured cost is the
    * tokenize + fold + state round-trip itself.
    */
  private def runPackerPoint(spark: org.apache.spark.sql.SparkSession,
                             shards: Int, totalDocs: Int, microbatches: Int): PackPoint = {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val text = (0 until 50).map(i => s"tok$i").mkString(" ")
    val src = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamingPacking.chunkAssignments(
      src.toDF().toDF("doc_id", "text"), budget = 1024L, nShards = shards)
    val q = out.writeStream.format("noop").outputMode("append").start()
    val t0 = System.nanoTime()
    try {
      (0 until totalDocs).map(i => (i.toLong, text))
        .grouped(totalDocs / microbatches + 1).foreach { chunk =>
          src.addData(chunk: _*); q.processAllAvailable()
        }
    } finally q.stop()
    val wall = (System.nanoTime() - t0) / 1e9
    PackPoint(shards, totalDocs.toLong, wall, totalDocs / wall)
  }

  /** Drive one (streams, syncs/stream) configuration; returns measured
    * throughput. Fresh MemoryStream + query per point so state-store
    * contents don't leak across configurations.
    */
  private def runPoint(spark: org.apache.spark.sql.SparkSession,
                       streams: Int, syncsPerStream: Int, microbatches: Int): Point = {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val clientsPerStream = 4
    // Deterministic schedule with tick-crossing gaps and periodic
    // timeout-crossing jumps — exercises eviction + reconnect, not just
    // the happy path (same shape as test S3).
    val reqs = (for {
      s <- 0 until streams
      i <- 0 until syncsPerStream
    } yield {
      val jitter = (i * 7919 + s * 104729) % 90
      val now = 1000L + i * (37L + jitter) + (if (i % 97 == 0) 25000L else 0L)
      SyncRequest(s.toLong, now, (i % clientsPerStream).toString, "e", (s * 100000L + i).toString)
    }).sortBy(r => (r.now, r.body.toLong))

    val batchMs = mutable.ArrayBuffer.empty[Long]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        if (e.progress.numInputRows > 0)
          Option(e.progress.durationMs.get("triggerExecution"))
            .foreach(d => batchMs.synchronized { batchMs += d.longValue })
    }
    spark.streams.addListener(listener)
    val src = MemoryStream[SyncRequest]
    val out = SyncEngine(src.toDS(), SyncConfig(50L, 10000L), seed = 42L, gameTimeoutUs = 0L)
    // noop sink: full engine runs, results discarded — measures the
    // engine, not a sink.
    val q = out.writeStream.format("noop").outputMode("append").start()
    val t0 = System.nanoTime()
    try {
      reqs.grouped(reqs.size / microbatches + 1).foreach { chunk =>
        src.addData(chunk: _*); q.processAllAvailable()
      }
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
    val wall = (System.nanoTime() - t0) / 1e9
    val sorted = batchMs.synchronized(batchMs.sorted.toVector)
    Point(streams, reqs.size.toLong, wall, reqs.size / wall,
      if (sorted.nonEmpty) sorted(sorted.size / 2) else 0L,
      if (sorted.nonEmpty) sorted.last else 0L)
  }
}
