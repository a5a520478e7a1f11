package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Streaming sink helpers for `foreachBatch` — the bridge between
  * Structured Streaming and external stores that have no native sink.
  *
  * Structured Streaming guarantees each microbatch is delivered with a
  * monotonically increasing `batchId`, but a batch can be RE-delivered
  * after a failure/restart (at-least-once at the sink boundary). An
  * exactly-once external write therefore needs the sink side to be
  * idempotent on `batchId` — the pattern every production pipeline at
  * scale uses for warehouse/object-store loads.
  */
object Sinks {

  /** Idempotent parquet append: each microbatch lands in its own
    * `batch_id=N` subdirectory, written atomically-enough for re-runs —
    * a re-delivered batchId that already COMMITTED (directory present
    * with a `_SUCCESS` marker) is skipped, so replays after a restart
    * cannot duplicate rows. A partial write without the marker (crash
    * mid-write) is overwritten by the redelivery, which is exactly the
    * recovery one wants.
    *
    * Readers see one logical table at `out` (`batch_id` becomes a
    * partition column); downstream compaction can fold small batch
    * directories without changing the contract.
    *
    * Usage: `df.writeStream.foreachBatch(Sinks.idempotentParquetAppend(out) _)`.
    */
  def idempotentParquetAppend(out: String)(df: DataFrame, batchId: Long): Unit = {
    val dir = new org.apache.hadoop.fs.Path(s"$out/batch_id=$batchId")
    val fs = dir.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val committed = fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))
    if (!committed)
      df.write.mode(SaveMode.Overwrite).parquet(dir.toString)
  }
}
