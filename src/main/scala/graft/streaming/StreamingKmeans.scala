package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Online (mini-batch) k-means over a vector stream — the streaming
  * form of [[graft.operators.Similarity.kmeansTrain]]: each microbatch
  * assigns its vectors to the CURRENT centroids map-only (broadcast
  * centroid row, the batch trainer's `assignTo` contract: argmax of
  * 1e-6-rounded cosine, tie → lowest cid) and folds the batch's
  * per-centroid sums into the running model with the count-weighted
  * mini-batch rule (Sculley 2010):
  *
  *   c' = (n_old · c_old + s_batch) / (n_old + n_batch)
  *
  * The model is the ONLY state — k × (dim + 1) numbers held by the
  * driver between microbatches (the [[graft.operators.Classifier
  * .trainedWeights]] bounded-artifact precedent; a restart resumes
  * from the persisted model exactly). All blending runs on exact
  * integer grids: centroids live in 1e-4 units, batch sums arrive as
  * 1e-6-unit integer sums (order-free), and the one division per
  * (cid, dim) converts Long→Double under 2^53 — so the trained model
  * is bit-identical under any intra-batch row order or partitioning,
  * and a replay of the same microbatch sequence reproduces it exactly.
  *
  * Scale shape: per batch ONE map-only assignment pass plus a
  * reduction onto the bounded (k × dim) key space with map-side
  * combining — the q50 step's shape, applied incrementally. The
  * stream never accumulates rows; state is the model alone.
  */
object StreamingKmeans {

  /** Running model: per centroid, its 1e-4-grid components and the
    * count of vectors that have contributed to it.
    */
  final case class Model(cents: Array[(Int, Array[Long], Long)]) {
    /** Centroid frame (cid, cemb) in doubles, for assignment. */
    def frame(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      cents.toSeq
        .map { case (cid, units, _) => (cid, units.map(_ / 1e4).toSeq) }
        .toDF("cid", "cemb")
    }
  }

  /** Seed model from the first `k` vectors of a frame (the stand-in
    * seeding contract of the batch trainer), counts start at each
    * seed's own contribution of 1.
    */
  def seed(vecs: DataFrame, k: Int): Model = {
    val rows = vecs
      .where(col("vec_id") < k)
      .withColumn("emb", col("embedding").cast("array<double>"))
      .select(col("vec_id"), expr(
        "transform(emb, x -> CAST(floor(x * 1e4 + 0.5) AS BIGINT))").as("units"))
      .orderBy("vec_id").collect()
    require(rows.length == k,
      s"seed needs vectors for every vec_id in [0, $k), found ${rows.length} — " +
        "a short model would silently train with fewer centroids")
    Model(rows.map(r =>
      (r.getLong(0).toInt, r.getSeq[Long](1).toArray, 1L)))
  }

  /** One mini-batch update: assign `batch` to the model's centroids
    * and blend the batch's exact per-(cid, dim) integer sums into the
    * running means. Returns the new model; the input model is not
    * mutated. Deterministic for a given (model, batch-row-set) — row
    * order and partitioning cannot change the result.
    */
  def update(batch: DataFrame, model: Model): Model = {
    val spark = batch.sparkSession
    val e = batch.withColumn("emb", col("embedding").cast("array<double>"))
    val assigned = graft.operators.Similarity.assignTo(e, model.frame(spark))
    // Exact 1e-6-unit integer sums per (cid, dim): order-free.
    val sums = assigned
      .select(col("cid"), posexplode(col("emb")))
      .groupBy(col("cid"), col("pos"))
      .agg(
        sum(expr("CAST(floor(col * 1e6 + 0.5) AS BIGINT)")).as("s"),
        count(lit(1)).as("n"))
      .collect()
      .groupBy(_.getInt(0))
    val cents = model.cents.map { case (cid, units, nOld) =>
      sums.get(cid) match {
        case None => (cid, units, nOld)
        case Some(rows) =>
          val nB = rows.head.getLong(3)
          val byDim = rows.map(r => r.getInt(1) -> r.getLong(2)).toMap
          val blended = units.zipWithIndex.map { case (u, d) =>
            // (n_old·c_old + s_batch) in 1e-6 units as a LONG product —
            // exact (no 2^53 mantissa cliff) for counts up to ~9e12
            // with unit-scale components (|u|·100 ≤ 1e6), far past any
            // single-model stream; one integer round-half-up division
            // lands c' on the 1e-4 grid.
            val numer = nOld * (u * 100L) + byDim(d)
            val den = (nOld + nB) * 100L
            // den is a multiple of 100 so den/2 is exact, and adding it
            // (instead of doubling numer) keeps the full ~9e12-count
            // headroom: floor((numer + den/2) / den) = round-half-up.
            Math.floorDiv(numer + den / 2, den)
          }
          (cid, blended, nOld + nB)
      }
    }
    Model(cents)
  }
}
