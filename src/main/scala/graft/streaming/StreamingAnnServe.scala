package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Streaming ANN serving — the trained, PERSISTED IVF-PQ index
  * ([[graft.sources.VectorIndexStore]]) answering a continuous stream
  * of query vectors: the S17 broadcast-model pattern (Classifier
  * .scoreWith) applied to the vector index. Each microbatch of
  * queries (qid, embedding) runs [[Similarity.ivfPqSearchFrames]]
  * against the STATIC stored artifacts — a stream-static join shape:
  * the stream side is the bounded query batch, the static side is the
  * cid-partitioned code table, and the per-batch read is only the
  * probed cells' code files.
  *
  * Statelessness is the scale property: serving holds NO streaming
  * state (no watermark, no state store) — the "state" is the index
  * artifact on disk, shared by every batch and every concurrent
  * query stream, which is what lets one trained index fan out to any
  * number of serving queries. Index maintenance (VectorIndexStore
  * .append) and serving compose: an appended cell's new codes are
  * visible to the next microbatch's scan with no coordination beyond
  * parquet file visibility.
  */
object StreamingAnnServe {

  /** Score ONE microbatch of query vectors (qid, embedding float[64])
    * against stored-index frames. Usable directly under foreachBatch;
    * pure — the same batch against the same artifacts gives the same
    * ranking, so stream results replayed batch-at-a-time equal the
    * one-shot batch call (StreamingSpec pins this).
    */
  def scoreBatch(queries: DataFrame, centroids: DataFrame, codebooks: DataFrame,
                 codes: DataFrame, nSub: Int, k: Int, nProbe: Int): DataFrame = {
    // foreachBatch hands over a CLONED session, and the combined plan
    // resolves against the STATIC side's session — re-registering the
    // bounded-buffer top-k aggregators on both is idempotent and keeps
    // this callable from any microbatch context.
    graft.GraftSession.registerUdafs(queries.sparkSession)
    graft.GraftSession.registerUdafs(codes.sparkSession)
    val q = queries.select(col("qid"),
      col("embedding").cast("array<double>").as("emb"))
    Similarity.ivfPqSearchFrames(q, centroids, codebooks, codes, nSub, k, nProbe)
  }
}
