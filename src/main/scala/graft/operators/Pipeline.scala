package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Deterministic.roundTo
import graft.functions.PortableHash.hash48

/** Training-data pipeline operators over the event log and document
  * corpus: funnel analysis, deterministic dataset splitting, temporal
  * (SCD2) state history, normalization-based dedup, cohort retention,
  * and per-stratum sampling.
  *
  * Shared scale discipline: every operator here is either map-only
  * (hash-predicate splits) or shuffles exclusively on its natural key
  * (`user_id` for the event-log operators, the stratum for sampling) —
  * no global windows, no driver-side state, no data-dependent loops.
  */
object Pipeline {

  /** Epoch-day of 2024-01-01 (the corpus start, TESTDATA.md): integer
    * day arithmetic in both engines avoids timezone/calendar traps.
    */
  val CorpusStartDay = 19723L
  val DayUs = 86400000000L

  /** Q42 — ordered conversion funnel view → click → purchase.
    *
    * Stage k admits a user iff they have a stage-k event STRICTLY after
    * their stage-(k-1) entry time (first qualifying event); `0_all` is
    * the corpus user count. Each stage is one filtered aggregation plus
    * an equi join on `user_id` — all three stage plans co-partition on
    * the same key, so at scale this is one shuffle of the (small)
    * per-user stage table per stage, never an event-log self-join. The
    * final counts are single-row aggregates unioned together; the
    * conversion rate divides by the stage-0 count via a 1-row broadcast.
    */
  def funnel(events: DataFrame): DataFrame = {
    val v = events.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_us").as("t1"))
    val c = events.where(col("event_type") === "click")
      .join(v, "user_id").where(col("ts_us") > col("t1"))
      .groupBy("user_id").agg(min("ts_us").as("t2"))
    val p = events.where(col("event_type") === "purchase")
      .join(c, "user_id").where(col("ts_us") > col("t2"))
      .groupBy("user_id").agg(min("ts_us").as("t3"))
    val stages: Seq[(String, DataFrame)] = Seq(
      "0_all" -> events.select("user_id").distinct(),
      "1_view" -> v,
      "2_view_click" -> c,
      "3_view_click_purchase" -> p)
    val counts = stages
      .map { case (name, df) =>
        df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
      }
      .reduce(_ union _)
    val total = events.agg(countDistinct("user_id").as("n_total"))
    counts.crossJoin(broadcast(total))
      .select(
        col("stage"), col("n_users"),
        roundTo(col("n_users").cast("double") / col("n_total"), 4).as("conv_rate"))
      .orderBy("stage")
  }

  /** Q43 — deterministic train/val/test split: bucket =
    * `hash48(salt:doc_id) mod 10`; 0-7 train, 8 val, 9 test. Like
    * [[Sampling.stratifiedSample]] the assignment is a pure per-row
    * hash predicate — reproducible across runs, partitionings, and
    * engines, and each document lands in EXACTLY one split (buckets
    * partition the hash range), the invariant an auditable training
    * setup needs. Reported per (split, source) with an id checksum so
    * the oracle verifies membership, not just counts.
    */
  def trainSplit(docs: DataFrame, salt: String): DataFrame =
    withSplit(docs, salt)
      .groupBy("split", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        sum("doc_id").as("id_checksum"))
      .orderBy("split", "source")

  /** The per-row split assignment behind [[trainSplit]]: a pure
    * projection (no aggregation, no state), so it runs UNCHANGED on a
    * streaming DataFrame — new documents get their final split label as
    * they arrive.
    */
  def withSplit(docs: DataFrame, salt: String): DataFrame = {
    val bucket = expr(s"${hash48(s"concat('$salt', ':', CAST(doc_id AS STRING))")} % 10")
    docs.withColumn("split",
      when(bucket < 8, lit("train")).when(bucket === 8, lit("val")).otherwise(lit("test")))
  }

  /** Q100 — LEAKAGE-SAFE split: the q43 hash split at near-dup-CLUSTER
    * granularity. Per-document splitting ([[withSplit]]) lets two
    * near-duplicate documents straddle train/test — the classic
    * contamination hole where the "held-out" example is a paraphrase
    * of a training row. Here every document hashes on its connected-
    * component label from [[Dedup.nearDupClusters]] (singletons label
    * as themselves), so a whole near-dup cluster lands in ONE split by
    * construction — the bucket is a pure function of the label.
    *
    * Scale shape: the cluster pass is q40's pointer-jumping loop
    * (O(log n) rounds, localCheckpoint-bounded); the split itself adds
    * one left join of docs against the (pairs-only) label frame and a
    * per-row hash — no new corpus exchange beyond q40's.
    */
  def clusterSafeSplit(docs: DataFrame, threshold: Double, salt: String): DataFrame = {
    val labels = graft.operators.Dedup.nearDupClusters(docs, threshold)
      .select(col("doc_id"), col("cluster_id"))
    val bucket = expr(
      s"${hash48(s"concat('$salt', ':', CAST(cluster_label AS STRING))")} % 10")
    docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("cluster_label", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split",
        when(bucket < 8, lit("train")).when(bucket === 8, lit("val"))
          .otherwise(lit("test")))
      .select(col("doc_id"), col("cluster_label"), col("split"))
      .orderBy("doc_id")
  }

  /** Q44 — SCD2 state history: the reference's state stream
    * (stateStream.go:19-21) keeps only the latest write per key (Q2's
    * LWW); the temporal-table formulation keeps EVERY write as a
    * validity interval `[valid_from, valid_to)` — `valid_to` = the next
    * write's time (null while current), version = write sequence. One
    * window pass partitioned by `user_id` with the deterministic
    * `(ts_us, event_id)` intra-key total order (SURVEY §7.3.1) — scales
    * with the largest single key, never the log.
    */
  def stateHistory(events: DataFrame): DataFrame =
    historyCore(events).orderBy("user_id", "version")

  private def historyCore(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    events
      .select("user_id", "event_id", "event_type", "ts_us")
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead("ts_us", 1).over(w))
      .select(
        col("user_id"), col("version"), col("event_type"),
        col("ts_us").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Q53 — state occupancy: how long the population spends in each
    * state, from the closed [[stateHistory]] intervals — the
    * time-weighted aggregation validity intervals exist FOR (a plain
    * count-by-state weights each write equally; occupancy weights by
    * dwell time). Pure integer duration arithmetic on top of the same
    * single window pass, reduced on the state vocabulary.
    */
  def stateOccupancy(events: DataFrame): DataFrame =
    historyCore(events)
      .where(col("valid_to").isNotNull)
      .withColumn("dur_us", col("valid_to") - col("valid_from"))
      .groupBy(col("event_type").as("state"))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum("dur_us").as("total_us"),
        roundTo(sum("dur_us").cast("double") / count(lit(1)), 4).as("mean_us"))
      .orderBy("state")

  /** Q45 — normalization-based dedup (the CCNet-style "exact after
    * cleaning" class, between exact and near-dup): lowercase, collapse
    * every non-alphanumeric run to one space, trim, then group on the
    * md5 of the normalized text. `n_raw_variants` counts how many
    * distinct RAW contents collapsed into the group — the signal raw
    * [[Dedup.exactDedup]] cannot see. Same scale shape as exact dedup:
    * per-row normalization at scan speed, one shuffle on a fixed-width
    * hash, text never shuffled.
    */
  def normalizedDedup(docs: DataFrame): DataFrame =
    docs
      .withColumn("norm",
        trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")))
      .groupBy(md5(col("norm")).as("norm_hash"))
      .agg(
        count(lit(1)).as("n_copies"),
        min("doc_id").as("keep_id"),
        countDistinct(sha2(col("text"), 256)).as("n_raw_variants"))
      .orderBy("norm_hash")

  /** Q46 — weekly retention cohorts: users grouped by first-seen week
    * (cohort), activity counted per calendar-week offset from the
    * cohort week. Two shuffles, both on `user_id` (first-seen
    * aggregation, then the join back to the log — co-partitioned), then
    * one low-cardinality aggregation on (cohort, offset). Day/week
    * arithmetic is integer division on epoch-day indices — identical in
    * both engines, no calendar functions on the hot path.
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val e = events
      .withColumn("day_idx", expr(s"ts_us div $DayUs") - CorpusStartDay)
    val first = e.groupBy("user_id")
      .agg(min("day_idx").as("first_day"))
      .withColumn("cohort_week", expr("first_day div 7"))
      .select("user_id", "cohort_week")
    e.join(first, "user_id")
      .withColumn("week_offset", expr("day_idx div 7") - col("cohort_week"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_active"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Q48 — event-type association rules: support and lift for every
    * unordered pair of event types co-occurring in a user's history.
    * The per-user type set is collected first (bounded by the type
    * vocabulary, not the user's event count), pairs are generated
    * MAP-SIDE from each sorted set — the classic market-basket shape
    * without a corpus self-join — and everything downstream aggregates
    * on the (tiny) type-pair key space. `lift` is computed from integer
    * counts in one multiplication, so it is exact until the final
    * rounding.
    */
  def typeAssociations(events: DataFrame, minSupport: Double): DataFrame = {
    // No persist: `sets` recurs three times in one plan, and Spark's
    // ReuseExchange serves the repeated subtree from the same shuffle
    // output — caching here would pin executor memory for the life of
    // the session instead.
    val sets = events.groupBy("user_id")
      .agg(sort_array(collect_set("event_type")).as("types"))
    val nUsers = sets.agg(count(lit(1)).as("n_users"))
    val singles = sets
      .select(col("user_id"), explode(col("types")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n_t"))
    val pairs = sets
      .select(explode(expr(
        """flatten(transform(types, (a, i) ->
             transform(slice(types, i + 2, size(types) - i - 1),
               b -> named_struct('type_a', a, 'type_b', b))))""")).as("p"))
      .select(col("p.type_a"), col("p.type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(singles.select(col("t").as("type_a"), col("n_t").as("n_a"))), "type_a")
      .join(broadcast(singles.select(col("t").as("type_b"), col("n_t").as("n_b"))), "type_b")
      .crossJoin(broadcast(nUsers))
      .withColumn("support", roundTo(col("n_ab").cast("double") / col("n_users"), 4))
      .where(col("support") >= minSupport)
      .withColumn("lift", roundTo(
        (col("n_ab") * col("n_users")).cast("double") / (col("n_a") * col("n_b")), 4))
      .select("type_a", "type_b", "n_ab", "support", "lift")
      .orderBy("type_a", "type_b")
  }

  /** Q49 — unigram language-model scoring: each document's mean
    * negative log-likelihood under the corpus's own unigram
    * distribution (the cheap LM-quality signal: high nll = tokens rare
    * in the corpus). One exploded pass builds the token stream; the
    * frequency table is key-space bounded (it joins back on `word` as
    * an ordinary hash join — never broadcast-dependent); the corpus
    * total is a 1-row broadcast. Per-token nll is rounded to the fixed
    * grid FIRST, so the per-document mean is an exact integer sum
    * (order-free) divided by the token count — the [[Deterministic]]
    * contract for cross-engine float stability.
    */
  def lmScore(docs: DataFrame): DataFrame = {
    // No persist (same reasoning as typeAssociations): the exploded
    // token stream recurs in one plan and is cheap to recompute; a
    // session-lifetime cache of it would leak executor memory.
    val words = graft.sources.Tables.widen(docs)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val vocab = words.groupBy("word").agg(count(lit(1)).as("n_w"))
    val total = words.agg(count(lit(1)).as("n_total"))
    words
      .join(vocab, "word")
      .crossJoin(broadcast(total))
      .withColumn("nll",
        roundTo(-log(col("n_w").cast("double") / col("n_total").cast("double")), 4))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        roundTo(graft.functions.Deterministic.exactSum(col("nll"), 4)
          / count(lit(1)), 4).as("mean_nll"))
      .orderBy("doc_id")
  }

  /** Q102 — LM scoring against the PERSISTED model
    * ([[graft.sources.LmStore]]): an arriving candidate batch scores
    * against the stored reference-corpus frequency table — the
    * production deployment shape of q49 (model from a fixed reference
    * corpus, candidates stream through it). Out-of-vocabulary tokens
    * back off to a singleton count (`n_w → 1`), and the per-document
    * OOV count is surfaced — the domain-shift signal a curation
    * pipeline monitors alongside the score. The scoring join moves
    * batch tokens against the type table; the reference corpus is
    * never rescanned.
    */
  def lmScoreStored(spark: org.apache.spark.sql.SparkSession, dir: String,
                    newDocs: DataFrame): DataFrame = {
    import graft.sources.LmStore
    val words = graft.sources.Tables.widen(newDocs)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    words
      .join(LmStore.vocab(spark, dir), Seq("word"), "left")
      .crossJoin(broadcast(LmStore.stats(spark, dir)))
      .withColumn("oov", col("n_w").isNull)
      .withColumn("nll", roundTo(
        -log(coalesce(col("n_w"), lit(1L)).cast("double")
          / col("n_total").cast("double")), 4))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("oov").cast("long")).as("n_oov"),
        roundTo(graft.functions.Deterministic.exactSum(col("nll"), 4)
          / count(lit(1)), 4).as("mean_nll"))
      .orderBy("doc_id")
  }

  /** Q56 — percentile length gate: keep documents whose length falls
    * inside the corpus's [pLo, pHi] band — the outlier-trimming quality
    * gate every training mixture runs (too-short = boilerplate,
    * too-long = concatenation junk). The bounds are ONE tiny aggregate
    * row cross-joined (broadcast) onto the corpus, so the gate itself
    * is a map-side predicate. The bounds come from the two-pass exact
    * selection ([[EventLog.exactQuantiles]] — histogram cells on the
    * integer `n_chars` grid, then rank-select inside the two target
    * cells), not `percentile`'s whole-corpus single buffer; the values
    * are bit-identical (QuantileSpec) and interpolated-percentile
    * parity with the oracle engine is already pinned by q25.
    */
  def lengthGate(docs: DataFrame, pLo: Double, pHi: Double): DataFrame = {
    val bounds = graft.operators.EventLog.exactQuantiles(
        docs.withColumn("_all", lit(0)),
        Seq(pLo -> "lo", pHi -> "hi"),
        cellsPerUnit = 1.0, groupCol = "_all", valueCol = "n_chars")
      .select("lo", "hi")
    docs.crossJoin(broadcast(bounds))
      .where(col("n_chars") >= col("lo") && col("n_chars") <= col("hi"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        roundTo(col("lo"), 4).as("p_lo"), roundTo(col("hi"), 4).as("p_hi"))
      .orderBy("doc_id")
  }

  /** Q54 — event-transition matrix (first-order Markov counts): for
    * each consecutive pair in a user's event sequence, count
    * (from_type → to_type) and the row-conditional probability. One
    * window pass per user (the same `(ts_us, event_id)` total order as
    * [[stateHistory]]) then two aggregations on the type-pair key
    * space; the per-from totals join back as a vocabulary-sized
    * broadcast. The probability divides two exact longs — one rounding,
    * cross-engine stable.
    */
  def typeTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val pairs = events
      .withColumn("from_type", lag("event_type", 1).over(w))
      .where(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type").agg(sum("n").as("n_from"))
    pairs.join(broadcast(totals), "from_type")
      .withColumn("p", roundTo(col("n").cast("double") / col("n_from"), 4))
      .select("from_type", "to_type", "n", "p")
      .orderBy("from_type", "to_type")
  }

  /** Q51 — per-type feature standardization: z = (v - mean) / stddev
    * under population moments. The moment sums use the
    * [[graft.functions.Deterministic.exactSum]] integer grids (`value`
    * carries 2 decimals, `value²` 4), so mean and variance are pure
    * IEEE functions of identical exact inputs in both engines — the
    * whole z-score is then deterministic per row with ONE final
    * rounding, no intermediate rounding drift. The stats table is
    * vocabulary-sized (genuinely bounded, like a dimension table), so
    * broadcasting it back onto the log is scale-safe; the log itself
    * shuffles only for its own (partial-agg) moment pass.
    */
  def standardize(events: DataFrame): DataFrame =
    applyStandardize(events, fitMoments(events)).orderBy("event_id")

  /** The "fit" half of [[standardize]]: per-type exact moment sums.
    * Computed offline (batch) and reusable online — the fitted table is
    * a bounded dimension any stream can join against.
    */
  def fitMoments(events: DataFrame): DataFrame = {
    import graft.functions.Deterministic.exactSum
    events.groupBy("event_type").agg(
      count(lit(1)).cast("double").as("n"),
      exactSum(col("value"), 2).as("s1"),
      exactSum(col("value") * col("value"), 4).as("s2"))
  }

  /** The "transform" half of [[standardize]]: pure per-row math against
    * the fitted moments — no aggregation, so it runs UNCHANGED on a
    * streaming DataFrame (stream-static broadcast join + projection),
    * the fit-offline/transform-online deployment shape.
    */
  def applyStandardize(df: DataFrame, stats: DataFrame): DataFrame = {
    val m = col("s1") / col("n")
    val variance = col("s2") / col("n") - m * m
    // Zero-variance guard: a constant-valued type yields z = NaN/∞,
    // whose rounded representation engines need not agree on — emit
    // null instead (mirrored as CASE in the q51 oracle). The predicate
    // compares identical exact-moment doubles in both engines, so the
    // branch itself is deterministic.
    df.join(broadcast(stats), "event_type")
      .withColumn("z", when(variance > 0,
        roundTo((col("value") - m) / sqrt(variance), 4)))
      .select("event_id", "event_type", "value", "z")
  }

  /** Q47 — deterministic per-stratum sample: the k docs per
    * (lang, source) with the smallest `hash48(salt:doc_id)` — a
    * reproducible stand-in for per-group reservoir sampling (the hash
    * order IS a uniform random order, but stable across runs/engines).
    * The window partitions by stratum; with bounded k the
    * [[graft.functions.TopKAggregator]] formulation (map-side k-heaps)
    * is the drop-in when a stratum outgrows a partition sort.
    */
  def groupSample(docs: DataFrame, k: Int, salt: String): DataFrame = {
    val w = Window.partitionBy("lang", "source")
      .orderBy(col("rank_hash"), col("doc_id"))
    docs
      .withColumn("rank_hash",
        expr(hash48(s"concat('$salt', ':', CAST(doc_id AS STRING))")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("lang", "source", "rnk", "doc_id", "rank_hash")
      .orderBy("lang", "source", "rnk")
  }

  /** DSIR hashed-feature space: unigrams hash into this many buckets.
    * Small here because the synthetic vocabulary is ~30 words; the
    * shape is identical at the paper's 10^4 buckets — the model stays
    * a bounded single-row broadcast either way.
    */
  val DsirBuckets = 128

  /** Target distribution for DSIR: English documents stand in for the
    * "high-quality target domain" (the paper uses Wikipedia+books).
    */
  val DsirTargetLang = "en"

  /** SQL fragment: DSIR feature bucket of word expression `w`. */
  private def dsirBucket(w: String): String =
    s"CAST(${hash48(s"concat('dsir:', $w)")} % $DsirBuckets AS INT)"

  /** The fitted DSIR model as ONE broadcastable row: `lam` is the
    * per-bucket log-likelihood-ratio table, quantized to integer
    * micro-nats (`floor(λ·1e6 + 0.5)`) so every downstream sum is
    * exact integer arithmetic — order-free and cross-engine identical
    * (the one floating-point step, `ln`, happens once per bucket on
    * exact integer counts, never per document).
    *
    * Laplace(+1) smoothing over `DsirBuckets` cells; buckets no word
    * hashed into still carry the nonzero default ratio
    * `ln((raw_total+B)/(tgt_total+B))`, which the `coalesce` inside the
    * table builder produces for free.
    */
  private[graft] def dsirModel(docs: DataFrame): DataFrame =
    graft.sources.Tables.widen(docs)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .groupBy(expr(dsirBucket("w")).as("b"))
      .agg(
        sum(when(col("lang") === DsirTargetLang, 1L).otherwise(0L)).as("tgt_cnt"),
        count(lit(1)).as("raw_cnt"))
      .agg(
        map_from_entries(collect_list(
          struct(col("b"), struct(col("tgt_cnt"), col("raw_cnt"))))).as("m"),
        sum("tgt_cnt").as("tgt_total"),
        sum("raw_cnt").as("raw_total"))
      .select(expr(
        s"""transform(sequence(0, ${DsirBuckets - 1}), b -> CAST(floor(
              (ln(CAST(coalesce(m[b].tgt_cnt, 0L) + 1 AS DOUBLE)
                  / CAST(tgt_total + $DsirBuckets AS DOUBLE))
             - ln(CAST(coalesce(m[b].raw_cnt, 0L) + 1 AS DOUBLE)
                  / CAST(raw_total + $DsirBuckets AS DOUBLE))) * 1e6 + 0.5)
            AS BIGINT))""").as("lam"))

  /** Q82 — DSIR importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): per document,
    * `weight = Σ_w [log p_target(bucket(w)) − log p_raw(bucket(w))]`
    * under hashed-unigram bag-of-words models of the target (English
    * docs) and raw (whole corpus) distributions.
    *
    * Scale shape: fitting is one aggregation onto the bounded
    * `DsirBuckets` key space (map-side combined — the shuffle carries
    * ≤ B rows per task regardless of corpus size); scoring is map-only
    * against the broadcast single-row λ table — each document folds its
    * own words through `lam[bucket(w)]` with exact integer adds. Two
    * linear scans, zero corpus-keyed shuffles, nothing driver-side.
    */
  def dsirWeights(docs: DataFrame): DataFrame =
    graft.sources.Tables.widen(docs)
      .crossJoin(broadcast(dsirModel(docs)))
      .withColumn("words", split(col("text"), " "))
      .withColumn("n_tokens", size(col("words")).cast("long"))
      .withColumn("weight_micros", expr(
        s"""aggregate(words, CAST(0 AS BIGINT),
              (acc, w) -> acc + lam[${dsirBucket("w")}])"""))
      .withColumn("weight", col("weight_micros").cast("double") / 1e6)
      .select("doc_id", "lang", "n_tokens", "weight_micros", "weight")
      .orderBy("doc_id")

  /** Q82b — DSIR importance RESAMPLING via the Gumbel-top-k trick:
    * adding i.i.d. Gumbel noise to each log-weight and taking the top k
    * is exactly sampling k documents without replacement with
    * probability ∝ exp(weight). The Gumbel draw is derandomized through
    * the portable hash (`u = (hash48(gum:doc_id)+1) / (2^48+2)`,
    * `g = −ln(−ln u)`) so the "random" sample is reproducible across
    * runs AND engines; keys are quantized to integer micro-nats with
    * `doc_id` as the total-order tie-break.
    *
    * Scale shape: one map-only pass over the scored corpus, then
    * TakeOrdered — O(k) rows per partition reach the driver, no global
    * sort. The selection set is deterministic, so re-runs of a 100 TB
    * selection job are idempotent.
    */
  def dsirResample(docs: DataFrame, k: Int): DataFrame = {
    val u = s"(CAST(${hash48("concat('gum:', CAST(doc_id AS STRING))")} AS DOUBLE)" +
      " + 1.0) / 281474976710658.0"
    dsirWeights(docs)
      .withColumn("gumbel_micros",
        expr(s"CAST(floor(-ln(-ln($u)) * 1e6 + 0.5) AS BIGINT)"))
      .withColumn("key_micros", col("weight_micros") + col("gumbel_micros"))
      .orderBy(col("key_micros").desc, col("doc_id"))
      .limit(k)
      .select("doc_id", "lang", "weight_micros", "gumbel_micros", "key_micros")
  }

  /** Q125 — per-group winsorization (the robust-scaling feature prep
    * that tames heavy tails before training): each event's value is
    * clipped to its event_type's exact [pLo, pHi] percentile band.
    * Bounds come from [[EventLog.exactQuantiles]]'s two-pass grid
    * selection (bounded shuffle key space, never a whole-group sort)
    * and are ROUNDED to the 1e-4 grid before comparison — the clip
    * verdict must not hinge on the last ulp of an interpolated
    * percentile, and the rounded bound is the value both engines
    * agree on (the q25 contract). The clip itself is then a broadcast
    * join + one codegen'd least/greatest per row: map-only over the
    * fact table.
    */
  def winsorize(events: DataFrame, pLo: Double, pHi: Double): DataFrame = {
    require(0 < pLo && pLo < pHi && pHi < 1, s"need 0 < pLo < pHi < 1, got ($pLo, $pHi)")
    val bounds = EventLog.exactQuantiles(events, Seq(pLo -> "lo", pHi -> "hi"))
      .select(col("event_type"), roundTo(col("lo"), 4).as("lo"),
        roundTo(col("hi"), 4).as("hi"))
    events.join(broadcast(bounds), "event_type")
      .withColumn("value_w", least(greatest(col("value"), col("lo")), col("hi")))
      .select(col("event_id"), col("event_type"),
        roundTo(col("value_w"), 4).as("value_w"),
        (col("value") < col("lo") || col("value") > col("hi")).as("clipped"))
      .orderBy("event_id")
  }
}
