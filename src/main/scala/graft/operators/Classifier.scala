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

  /** Per-document SPARSE hashed features: `js` is the token stream
    * mapped to bucket ids (hash48('lrb:'+word) mod buckets); label
    * y = 1 iff lang = posLang. The document's count vector is never
    * densified — a margin is one O(tokens) fold over `js` and an
    * update sums occurrences, so per-round work is O(corpus tokens),
    * not O(corpus tokens × buckets) (the dense-xs formulation measured
    * 65× slower at the registered 64-bucket config — the difference
    * between 80 s and ~1 s at sf0.1).
    */
  /** The one tokenizer/hash expression of the family: any change to
    * the salt or bucketing here reaches training ([[trainLoop]]) and
    * exported-weight serving ([[scoreWith]]) together.
    */
  private def jsExpr(buckets: Int): String =
    s"""transform(split(text, ' '),
          t -> CAST(${hash48("concat('lrb:', t)")} % $buckets AS INT))"""

  private[graft] def featureRows(docs: DataFrame, buckets: Int,
                                 posLang: String): DataFrame =
    graft.sources.Tables.widen(docs)
      .withColumn("y", when(col("lang") === posLang, 1L).otherwise(0L))
      .withColumn("js", expr(jsExpr(buckets)))
      .select("doc_id", "y", "js")

  /** Margin + prediction of a frame carrying `js` against a weight
    * array column (bias last): the single O(tokens) scoring fold used
    * by both the broadcast-row path ([[scoreAgainst]]) and the
    * plan-literal serving path ([[scoreWith]]).
    */
  private def withMarginPred(feat: DataFrame): DataFrame =
    feat
      .withColumn("margin", expr(
        """aggregate(js, CAST(0 AS BIGINT), (acc, v) -> acc + ws[v])
             + ws[size(ws) - 1]"""))
      .withColumn("pred", when(col("margin") >= 0, 1L).otherwise(0L))

  /** The shared training loop with DRIVER-resident weights: the
    * tokenized feature rows are materialized ONCE (lazy localCheckpoint
    * — the first round's job fills it; formerly every round re-ran the
    * corpus tokenization), and each round is exactly ONE job — margins
    * against the PLAN-LITERAL weight vector (the [[scoreWith]] serving
    * shape, no broadcast exchange), misclassified occurrences reduced
    * on the bounded bucket key space and collected (≤ buckets+1 rows).
    * The bias rides as one synthetic occurrence of bucket `buckets`
    * per misclassified doc (err·1 ≡ the former separate bias
    * aggregation), and convergence is "every collected delta is zero"
    * — exactly the former next==ws anti-join test, moved to the
    * driver. Final weights (j, w), both BIGINT.
    */
  private[graft] def trainLoop(docs: DataFrame, buckets: Int, iters: Int,
                               posLang: String): DataFrame = {
    val feat = featureRows(docs, buckets, posLang).localCheckpoint(false)
    wsFrame(docs.sparkSession, trainModel(feat, buckets, iters))
  }

  /** The weight loop over an already-materialized feature frame. */
  private def trainModel(feat: DataFrame, buckets: Int, iters: Int): Array[Long] = {
    require(iters >= 1, s"perceptron needs at least one round, got $iters")
    val ws = Array.fill(buckets + 1)(0L)
    var converged = false
    for (_ <- 1 to iters if !converged) {
      val deltas = withMarginPred(feat.withColumn("ws", typedlit(ws.toSeq)))
        .withColumn("err", col("y") - col("pred"))
        .where(col("err") =!= 0L)
        .select(col("err"), explode(concat(col("js"), array(lit(buckets)))).as("j"))
        .groupBy("j").agg(sum("err").as("d"))
        .collect().map(r => (r.getInt(0), r.getLong(1)))
      converged = deltas.forall(_._2 == 0L)
      deltas.foreach { case (j, d) => ws(j) += d }
    }
    ws
  }

  /** The (j, w) weight frame of a driver-side model, as a
    * LocalRelation. */
  private def wsFrame(spark: org.apache.spark.sql.SparkSession,
                      ws: Array[Long]): DataFrame = {
    import spark.implicits._
    ws.toSeq.zipWithIndex.map { case (w, j) => (j.toLong, w) }.toDF("j", "w")
  }

  /** Q81 — the trained weight vector after `iters` full-batch rounds
    * (capped-fixpoint), long form (j, w).
    */
  def perceptronTrain(docs: DataFrame, buckets: Int, iters: Int,
                      posLang: String): DataFrame =
    trainLoop(docs, buckets, iters, posLang).orderBy("j")

  /** Q81b — score every document against the TRAINED weights: margin,
    * prediction, and the true label (so the oracle pins training
    * accuracy, not just the arithmetic). Map-only on top of the loop,
    * against the SAME materialized feature frame the loop trained on
    * (formerly the corpus was re-tokenized for scoring).
    */
  def perceptronScore(docs: DataFrame, buckets: Int, iters: Int,
                      posLang: String): DataFrame = {
    val feat = featureRows(docs, buckets, posLang).localCheckpoint(false)
    val ws = trainModel(feat, buckets, iters)
    withMarginPred(feat.withColumn("ws", typedlit(ws.toSeq)))
      .select("doc_id", "y", "margin", "pred")
      .orderBy("doc_id")
  }

  /** The trained weight vector as a SERVING artifact: (buckets+1)
    * longs, index = bucket, last = bias. Bounded by construction —
    * the driver-resident loop state IS the export.
    */
  def trainedWeights(docs: DataFrame, buckets: Int, iters: Int,
                     posLang: String): Array[Long] =
    trainModel(featureRows(docs, buckets, posLang).localCheckpoint(false),
      buckets, iters)

  /** Score an arriving frame against an EXPORTED weight vector — the
    * train-offline / serve-in-stream half of q81: weights ship as a
    * plan literal, so scoring is a stateless per-row fold that runs
    * unchanged over a batch frame OR a streaming source (no state
    * store, no stream-static join, any trigger). StreamingSpec S17
    * pins stream ≡ batch scoring under arbitrary microbatch splits.
    */
  def scoreWith(docs: DataFrame, weights: Seq[Long], buckets: Int,
                posLang: String): DataFrame = {
    require(weights.length == buckets + 1,
      s"weight vector must be buckets+1 long, got ${weights.length}")
    withMarginPred(docs
        .withColumn("ws", typedlit(weights))
        .withColumn("y", when(col("lang") === posLang, 1L).otherwise(0L))
        .withColumn("js", expr(jsExpr(buckets))))
      .select("doc_id", "y", "margin", "pred")
  }
}
