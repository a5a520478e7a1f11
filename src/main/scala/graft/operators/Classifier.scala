package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PortableHash.hash48

/** In-engine TRAINING of a hashed-feature linear quality/language
  * classifier — the fastText-style filter every curation pipeline runs
  * (reference scope: none; this is north-star LLM-pipeline surface,
  * the trained sibling of [[Curation.hashedClassifier]]'s fixed-weight
  * inference, completing the in-engine training trio alongside k-means
  * (q50b) and PQ codebooks (q73d)).
  *
  * The model is an INTEGER perceptron over hashed bag-of-words counts:
  * features are per-document term counts folded into `buckets` hash
  * buckets (plus a constant-1 bias), weights live in ℤ, and the
  * full-batch update is w += Σ_i (y_i − pred_i)·x_i with unit learning
  * rate. Every quantity is exact integer arithmetic — no sigmoid, no
  * float sums — so the engine and the DuckDB oracle agree bit-for-bit
  * with no rounding-grid contract at all (stronger than the k-means/PQ
  * families, which need the 1e-4 grid).
  *
  * Scale shape (the [[Similarity.kmeansTrain]] pattern): per round the
  * corpus is re-SCANNED but never shuffled — the weight vector
  * (buckets+1 rows, bounded) folds into ONE broadcast array, margins
  * are a map-only zip_with fold, and the update reduces on the bounded
  * bucket key space with map-side partial aggregation. Round state is
  * `localCheckpoint`ed so plan depth stays constant across rounds.
  * Early exit at a fixpoint is sound for the usual reason: a zero
  * update reproduces itself, so "stop when no weight moved" equals the
  * oracle's fixed unroll.
  */
object Classifier {

  /** Per-document hashed feature vector: xs[j] = count of words with
    * hash48('lrb:'+word) mod buckets = j, xs[buckets] = 1 (bias);
    * label y = 1 iff lang = posLang. The per-word bucket pass is one
    * map-only projection; widening the counts to a fixed
    * (buckets+1)-array keeps every training round free of per-doc
    * shuffles (the array is the document's entire footprint — text
    * never reaches a round).
    */
  private[graft] def featureRows(docs: DataFrame, buckets: Int,
                                 posLang: String): DataFrame =
    graft.sources.Tables.widen(docs)
      .withColumn("y", when(col("lang") === posLang, 1L).otherwise(0L))
      .withColumn("js", expr(
        s"""transform(split(text, ' '),
              t -> CAST(${hash48("concat('lrb:', t)")} % $buckets AS INT))"""))
      .withColumn("xs", expr(
        s"""transform(sequence(0, $buckets), j ->
              CASE WHEN j = $buckets THEN CAST(1 AS BIGINT)
                   ELSE CAST(size(filter(js, v -> v = j)) AS BIGINT) END)"""))
      .select("doc_id", "y", "xs")

  /** The shared training loop: final weights (j, w), both BIGINT. */
  private[graft] def trainLoop(docs: DataFrame, buckets: Int, iters: Int,
                               posLang: String): DataFrame = {
    require(iters >= 1, s"perceptron needs at least one round, got $iters")
    val spark = docs.sparkSession
    val feat = featureRows(docs, buckets, posLang)
    var ws: DataFrame = spark.range(buckets + 1L)
      .select(col("id").as("j"), lit(0L).as("w"))
    var converged = false
    for (_ <- 1 to iters if !converged) {
      val upd = scoreAgainst(feat, ws)
        .withColumn("err", col("y") - col("pred"))
        .where(col("err") =!= 0L)
        .select(col("err"), posexplode(col("xs")))
        .groupBy(col("pos").cast("long").as("j"))
        .agg(sum(col("err") * col("col")).as("d"))
      val next = ws.join(upd, Seq("j"), "left")
        .select(col("j"), (col("w") + coalesce(col("d"), lit(0L))).as("w"))
        .localCheckpoint()
      converged = next.join(ws, Seq("j", "w"), "left_anti").isEmpty
      ws = next
    }
    ws
  }

  /** Margin + prediction of feature rows against a weight frame: the
    * weights collapse to one broadcast array, so scoring is map-only.
    */
  private def scoreAgainst(feat: DataFrame, ws: DataFrame): DataFrame = {
    val wsArr = ws.agg(expr(
      "transform(array_sort(collect_list(struct(j, w))), s -> s.w)").as("ws"))
    feat.crossJoin(broadcast(wsArr))
      .withColumn("margin", expr(
        """aggregate(zip_with(xs, ws, (x, w) -> x * w),
             CAST(0 AS BIGINT), (acc, v) -> acc + v)"""))
      .withColumn("pred", when(col("margin") >= 0, 1L).otherwise(0L))
  }

  /** Q81 — the trained weight vector after `iters` full-batch rounds
    * (capped-fixpoint), long form (j, w).
    */
  def perceptronTrain(docs: DataFrame, buckets: Int, iters: Int,
                      posLang: String): DataFrame =
    trainLoop(docs, buckets, iters, posLang).orderBy("j")

  /** Q81b — score every document against the TRAINED weights: margin,
    * prediction, and the true label (so the oracle pins training
    * accuracy, not just the arithmetic). Map-only on top of the loop.
    */
  def perceptronScore(docs: DataFrame, buckets: Int, iters: Int,
                      posLang: String): DataFrame =
    scoreAgainst(featureRows(docs, buckets, posLang),
        trainLoop(docs, buckets, iters, posLang))
      .select("doc_id", "y", "margin", "pred")
      .orderBy("doc_id")
}
