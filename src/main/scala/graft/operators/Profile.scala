package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Deterministic.roundTo

/** Corpus profiling — the data-quality gate of a training pipeline:
  * one pass over the table computing per-stratum integrity counters
  * (row counts, null/empty rates, length extrema and means, key
  * uniqueness) that mixture decisions and ingest alarms read.
  *
  * Single hash aggregation over a low-cardinality key: partial
  * aggregation collapses everything map-side, the shuffle moves one
  * accumulator row per (stratum, partition) — profiling 100 TB costs
  * one scan.
  */
object Profile {

  /** One named validation rule: `violated` marks a failing row. */
  case class Expectation(name: String, violated: org.apache.spark.sql.Column)

  /** Q41 — rule-driven expectations (the Deequ-style contract check a
    * pipeline runs before promoting a snapshot): every rule evaluates
    * over every row in ONE aggregation pass — N rules cost one scan,
    * not N — emitting a rule-per-row report with violation counts and
    * pass rates. Rules are plain Column predicates, so new checks are
    * one-liners and Catalyst folds them into the same codegen stage.
    */
  def expectations(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    val session = df.sparkSession
    import session.implicits._
    val total = count(lit(1))
    val counted = df.agg(
      total.as("n_rows"),
      rules.map(r => sum(when(r.violated, 1L).otherwise(0L)).as(s"v_${r.name}")): _*)
    // One wide row → one row per rule: stack is a map-side Expand.
    val stacked = rules.map(r =>
      s"'${r.name}', CAST(v_${r.name} AS BIGINT)").mkString(", ")
    counted.selectExpr(
        "n_rows", s"stack(${rules.size}, $stacked) AS (rule, n_violations)")
      .select(
        col("rule"), col("n_rows"), col("n_violations"),
        roundTo((col("n_rows") - col("n_violations")).cast("double") / col("n_rows"), 6)
          .as("pass_rate"),
        (col("n_violations") === 0L).as("passed"))
      .orderBy("rule")
  }

  /** The documents contract: the rules q41's oracle mirrors. */
  def documentExpectations(docs: DataFrame): DataFrame = expectations(docs, Seq(
    Expectation("doc_id_not_null", col("doc_id").isNull),
    Expectation("text_not_empty", col("text").isNull || length(col("text")) === 0),
    Expectation("n_chars_matches_text", col("n_chars") =!= length(col("text"))),
    Expectation("lang_known", !col("lang").isin("en", "fr", "es", "de", "zh")),
    Expectation("lang_is_en", col("lang") =!= "en"),
    Expectation("source_prefixed", !col("source").startsWith("src"))))

  /** Q23 — per-source profile of the documents corpus. */
  def documentsProfile(docs: DataFrame): DataFrame =
    docs
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("doc_id")).as("n_distinct_ids"),
        sum(when(col("text").isNull || length(col("text")) === 0, 1L)
          .otherwise(0L)).as("n_empty_text"),
        countDistinct(col("lang")).as("n_langs"),
        min("n_chars").as("min_chars"),
        max("n_chars").as("max_chars"),
        roundTo(sum("n_chars").cast("double") / count(lit(1)), 4).as("avg_chars"),
        sum(length(col("text")).cast("long")).as("total_text_len"))
      .withColumn("ids_unique", col("n_distinct_ids") === col("n_docs"))
      .orderBy("source")

  /** Q126 — distribution drift between two corpus cohorts via the
    * population stability index (the ML-ops drift monitor: PSI > 0.2
    * conventionally triggers retraining). Three categorical features
    * — lang, source, and the 200-char length bucket — are compared
    * between the even-id and odd-id cohorts; each value's
    * contribution is (p − q)·ln(p/q) with Laplace-smoothed shares
    * (p = (n_a+1)/(t_a+V), V = the feature's value count), so an
    * empty cell never divides by zero and the formula stays defined
    * on both sides. Counts are exact integers; the one float step is
    * rounded to the 1e-6 grid (the BM25 discipline) so the report is
    * hash-exact.
    *
    * Scale shape: one stack-projected scan, one hash aggregation on
    * the bounded (feature, value) key space (map-side combined), one
    * broadcast of the per-feature totals — profiling drift at 100 TB
    * costs one pass, like [[documentsProfile]].
    */
  def distributionDrift(docs: DataFrame): DataFrame =
    driftFromCounts(featureCounts(docs))

  /** The PSI sufficient statistics: per-(feature, value) cohort
    * counts. Split out so the streaming monitor
    * ([[graft.streaming.StreamingDrift]]) can MAINTAIN exactly this
    * table incrementally (counts are the only state a drift monitor
    * needs — bounded by the categorical value space, not the corpus)
    * and share [[driftFromCounts]] with the batch path verbatim.
    */
  private[graft] def featureCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), expr(
      """stack(3,
           'lang', lang,
           'source', source,
           'len', CAST(n_chars DIV 200 AS STRING)) AS (feature, value)"""))
      .groupBy("feature", "value").agg(
        sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("doc_id") % 2 =!= 0, 1L).otherwise(0L)).as("n_b"))

  /** PSI report from a maintained counts table — the bounded final
    * projection over the sufficient statistics (one agg on the value
    * space + one broadcast join; corpus never touched).
    */
  private[graft] def driftFromCounts(counts: DataFrame): DataFrame = {
    val totals = counts.groupBy("feature")
      .agg(sum("n_a").as("ta"), sum("n_b").as("tb"), count(lit(1)).as("v"))
    counts.join(broadcast(totals), "feature")
      .withColumn("p", (col("n_a") + 1).cast("double") / (col("ta") + col("v")).cast("double"))
      .withColumn("q", (col("n_b") + 1).cast("double") / (col("tb") + col("v")).cast("double"))
      .withColumn("psi_c", roundTo((col("p") - col("q")) * log(col("p") / col("q")), 6))
      .select("feature", "value", "n_a", "n_b", "psi_c")
      .orderBy("feature", "value")
  }

  /** Q132 — embedding-space drift: how far each label cohort's mean
    * embedding points away from the corpus mean — the dense-space
    * companion to [[distributionDrift]]'s categorical PSI (a cohort
    * can drift semantically while every categorical marginal stays
    * flat; this is the monitor that catches it).
    *
    * Exactness: cosine is scale-invariant, so cos(mean_L, mean_corpus)
    * = cos(sum_L, sum_corpus) — the division by counts never happens.
    * Components land on the repo's 1e-4 grid as BIGINTs, per-(label,
    * dim) sums are exact integers, and the dot/norm cross-products run
    * in decimal(38,0) (DuckDB HUGEINT) — exact to ~1e9 vectors — so
    * the one terminal double (the cosine itself) is computed from
    * identical integers in both engines and rounds identically.
    *
    * Plan shape: one posexplode scan → one (label, dim) hash agg
    * (map-side combined, key space = labels × dims) → per-dim corpus
    * sums derived FROM the label sums (bounded table, no second corpus
    * pass) → one broadcast join on dim → per-label fold. Drift at
    * 100 TB costs one pass, like [[distributionDrift]].
    */
  def embeddingDrift(embeddings: DataFrame): DataFrame = {
    val labelSums = embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .withColumn("u", expr("CAST(floor(x * 1e4 + 0.5) AS BIGINT)"))
      .groupBy("label", "dim")
      .agg(sum("u").as("ls"))
    val nVecs = embeddings.groupBy("label").agg(count(lit(1)).as("n_vecs"))
    val corpusSums = labelSums.groupBy("dim").agg(sum("ls").as("cs"))
    labelSums
      .join(broadcast(corpusSums), "dim")
      .groupBy("label")
      .agg(
        sum(expr("CAST(ls AS DECIMAL(38,0)) * cs")).as("dot"),
        sum(expr("CAST(ls AS DECIMAL(38,0)) * ls")).as("nl"),
        sum(expr("CAST(cs AS DECIMAL(38,0)) * cs")).as("nc"))
      .withColumn("cosine", roundTo(
        col("dot").cast("double") /
          (sqrt(col("nl").cast("double")) * sqrt(col("nc").cast("double"))), 6))
      .withColumn("drift_ppm",
        expr("CAST(floor((1.0 - cosine) * 1e6 + 0.5) AS BIGINT)"))
      .join(broadcast(nVecs), "label")
      .select("label", "n_vecs", "cosine", "drift_ppm")
      .orderBy("label")
  }
}
