package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Deterministic.{exactSum, roundTo}

/** Temporal join operators (north-star additions; the reference's only
  * temporal primitive is the delta scan, model/eventStream.go:63-71 —
  * as-of and interval joins are the two classic time-series queries a
  * general engine must add on top of it).
  *
  * Scale designs:
  *   - The as-of join is NOT a range join: both sides are unioned and
  *     resolved in one partitioned window pass (shuffle each row once on
  *     the key, sort within partition by time, carry the last match
  *     forward). Equivalent to the merge-scan as-of algorithm — no
  *     per-probe binary search, no O(probe × build) candidate blowup,
  *     and the big side streams through whole-stage codegen.
  *   - The interval join banded on a bucket key turns `lo <= t < hi`
  *     into an equi join: each interval is exploded into the time
  *     buckets it covers, each fact row computes its single bucket, and
  *     the exact predicate filters bucket collisions. A bounded interval
  *     side broadcasts (hash join, no shuffle of the fact side); a large
  *     interval side degrades to a shuffle hash join on the bucket key —
  *     either way, never a nested-loop/cartesian plan.
  */
object Temporal {

  /** Q28 — as-of join: each `purchase` event paired with the same user's
    * most recent `view` event at-or-before it, "before" meaning strictly
    * earlier in the total order `(ts_us, event_id)` (the explicit total
    * order the engine substitutes for the reference's mutex arrival
    * order, model/eventStream.go:53).
    *
    * One window pass over the union of both event roles: `last(...,
    * ignoreNulls)` carries the latest view forward inside each user
    * partition; purchases then project it. Purchases with no prior view
    * keep nulls (left-as-of semantics).
    */
  def asofLastView(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select("event_id", "user_id", "ts_us", "event_type")
      .withColumn("view_event_id",
        last(when(col("event_type") === "view", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("view_ts_us",
        last(when(col("event_type") === "view", col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id"), col("user_id"), col("ts_us"),
        col("view_event_id"), col("view_ts_us"),
        (col("ts_us") - col("view_ts_us")).as("lag_us"))
      .orderBy("event_id")
  }

  /** Q29 interval-side generator: `n` fixed periods of length `lenUs`
    * starting every `stepUs` from `startUs` — overlapping when
    * lenUs > stepUs, so one event can land in several periods (a real
    * interval join, not a partition).
    */
  def periods(spark: SparkSession, startUs: Long, stepUs: Long, lenUs: Long, n: Int): DataFrame =
    spark.range(n).select(
      col("id").as("period_id"),
      (lit(startUs) + col("id") * stepUs).as("lo_us"),
      (lit(startUs) + col("id") * stepUs + lenUs).as("hi_us"))

  /** Q29 — banded interval join + aggregation: per period, the count,
    * distinct users, and value sum of events with `lo_us <= ts_us <
    * hi_us`. `bandUs` is the bucket width; correctness is independent of
    * it (each event has exactly one bucket, and an interval is exploded
    * to every bucket it covers, so each true (event, period) pair meets
    * exactly once — no post-join dedup needed).
    */
  def periodStats(events: DataFrame, periods: DataFrame, bandUs: Long): DataFrame = {
    val bands = periods.withColumn(
      "bucket", explode(expr(s"sequence(lo_us div $bandUs, (hi_us - 1) div $bandUs)")))
    events
      .withColumn("bucket", expr(s"ts_us div $bandUs"))
      .join(broadcast(bands), Seq("bucket"))
      .where(col("ts_us") >= col("lo_us") && col("ts_us") < col("hi_us"))
      .groupBy("period_id", "lo_us", "hi_us")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(exactSum(col("value"), 2), 2).as("sum_value"))
      .orderBy("period_id")
  }

  private val DayUs = 86400000000L

  /** Q118 — resample to a regular grid with forward-fill: each user's
    * irregular event stream becomes one row per DAY from their first to
    * last observed day; a day's `value` is the user's closing value
    * (last event by the (ts_us, event_id) total order) carried forward
    * across gap days — Pandas `resample('1D').last().ffill()`, the step
    * that turns event logs into the aligned series feature pipelines
    * and ML dataloaders consume.
    *
    * Scale shape: observations collapse to one row per (user, day)
    * first (map-side-combining agg — the carried value is max_by on
    * the total order, pure selection, no arithmetic), the grid comes
    * from per-user [first, last] spans via `sequence`/explode (output-
    * bounded: the grid IS the result), and the fill is the as-of union
    * trick — grid and observation rows shuffle ONCE on user and a
    * running `last(ignoreNulls)` carries the day struct forward, so
    * there is no (user, day) join anywhere. Gap days report `n_events
    * = 0` and `gap_filled = true` (the carried struct's day differs
    * from the grid day).
    */
  def resampleDailyFfill(events: DataFrame): DataFrame = {
    val obs = events
      .groupBy(col("user_id"), expr(s"ts_us DIV ${DayUs}L").as("day"))
      .agg(count(lit(1)).as("n_events"),
        max_by(col("value"), struct(col("ts_us"), col("event_id"))).as("close_value"))
    val grid = obs.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      .withColumn("_side", lit(1))
    val o = obs.select(col("user_id"), col("day"),
        struct(col("day").as("_d"), col("n_events"), col("close_value")).as("_p"))
      .withColumn("_side", lit(0))
    val w = Window.partitionBy("user_id").orderBy(col("day"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.unionByName(o, allowMissingColumns = true)
      .withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(col("user_id"), col("day"),
        when(col("_m").getField("_d") === col("day"),
          col("_m").getField("n_events")).otherwise(lit(0L)).as("n_events"),
        col("_m").getField("close_value").as("value"),
        (col("_m").getField("_d") =!= col("day")).as("gap_filled"))
      .orderBy("user_id", "day")
  }

  /** Q118b — the gap report over the same day grid: per user, observed
    * days, span, gap-day count, and the longest run of consecutive
    * missing days (the data-freshness monitor deciding whether a
    * forward-fill is still honest). One (user, day) distinct + a lag
    * window + a user-keyed aggregation — counts only, never values.
    */
  def resampleGapReport(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("day")
    events
      .select(col("user_id"), expr(s"ts_us DIV ${DayUs}L").as("day"))
      .distinct()
      .withColumn("_prev", lag(col("day"), 1).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_obs_days"),
        (max("day") - min("day") + 1).as("span_days"),
        (max("day") - min("day") + 1 - count(lit(1))).as("gap_days"),
        max(when(col("_prev").isNotNull, col("day") - col("_prev") - 1)
          .otherwise(lit(0L))).as("max_gap_days"))
      .orderBy("user_id")
  }

  private val HourUs = 3600L * 1000000L

  /** Q123 — rolling z-score anomaly detection over the per-type hourly
    * event-count series (the ops-monitoring classic: flag hours whose
    * count deviates > z·σ from the trailing window's mean). The series
    * is the COMPLETE hour grid per event_type (missing hours count 0 —
    * silence is signal for an anomaly detector); each point with a
    * full `window` of priors is scored against the exact integer
    * inequality
    *
    *   (x·W − s)² > z² · (W·ss − s²)      (W = window, s/ss = trailing
    *                                       sum / sum of squares)
    *
    * which is (x − mean)² > z²·var with both sides multiplied by W² —
    * float-free, so the verdict is bit-exact and oracle-checkable.
    * Zero trailing variance makes ANY deviation anomalous (the z-score
    * degeneracy, deterministic on both sides).
    *
    * Scale shape: one hash aggregation to hourly counts (map-side
    * combined), a per-type grid explode bounded by the time span, and
    * one partitioned window pass per type — series count × span rows,
    * never event-count rows, in the window. Grids are per event_type,
    * so a 1000-type corpus parallelizes across the cluster; no global
    * window, no collect.
    */
  /** The complete per-type hourly count series (event_type, hour, x)
    * — q123's input, shared with the S26 streaming detector so both
    * score the identical grid-filled series.
    */
  def hourlySeries(events: DataFrame): DataFrame = {
    val obs = events
      .groupBy(col("event_type"), expr(s"ts_us DIV ${HourUs}L").as("hour"))
      .agg(count(lit(1)).as("x"))
    val grid = obs.groupBy("event_type")
      .agg(min("hour").as("h0"), max("hour").as("h1"))
      .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("hour"))
    grid.join(obs, Seq("event_type", "hour"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
  }

  def anomalyZscore(events: DataFrame, window: Int = 24, z: Int = 3): DataFrame = {
    require(window >= 2 && z >= 1, s"need window >= 2 and z >= 1, got ($window, $z)")
    val filled = hourlySeries(events)
    val w = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(-window, -1)
    filled
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum("x").over(w))
      .withColumn("ss", sum(expr("x * x")).over(w))
      .where(col("n") === window)
      .withColumn("is_anomaly", expr(
        s"(x * $window - s) * (x * $window - s) > ${z.toLong * z} * ($window * ss - s * s)"))
      .select(col("event_type"), col("hour"), col("x").as("n_events"),
        col("s").as("win_sum"), col("ss").as("win_sumsq"), col("is_anomaly"))
      .orderBy("event_type", "hour")
  }

  /** Q133 — Kaplan-Meier session-duration survival, float-free.
    *
    * The subject is the SESSION (the q09 gap-and-island unit): its
    * lifetime is `(last − first) div 1 h`, it DIES when the inactivity
    * gap closes it, and a session whose last event lies within `gapUs`
    * of the corpus end is CENSORED — a later event could still extend
    * it, so its true lifetime is unobserved. The KM estimator handles
    * exactly this: censored sessions leave the risk set without
    * counting as death events, which a naive "mean session length"
    * silently gets wrong (it treats every open session as closed).
    *
    * Exactness: survival is the running product Π (n_risk − d)/n_risk
    * — a float in every textbook, but the duration axis is bounded by
    * the corpus time SPAN in hours (never session- or corpus-sized),
    * so the per-duration table collects to the driver (the
    * bounded-model-export contract, like the PCA Gram) and the product
    * folds in exact integer ppb: `s' = s·(n_risk − d) div n_risk` —
    * the identical fold a DuckDB recursive CTE restates, so the curve
    * hash-matches bit-for-bit (exact while sessions ≤ ~9e9).
    *
    * Distributed cost: one per-user window pass (the q09 shape) + one
    * per-session agg + one per-duration agg; the driver touches only
    * the duration axis.
    */
  def sessionSurvival(events: DataFrame, gapUs: Long): DataFrame = {
    val spark = events.sparkSession
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val sess = events
      .select("user_id", "event_id", "ts_us")
      .withColumn("prev_ts", lag("ts_us", 1).over(w))
      .withColumn("is_start",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("is_start").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("ts_us").as("t0"), max("ts_us").as("t1"))
    val tmax = events.agg(max("ts_us").as("tmax"))
    val byDur = sess.crossJoin(broadcast(tmax))
      .select(expr(s"(t1 - t0) div ${HourUs}L").as("dur"),
        (col("t1") > col("tmax") - gapUs).as("censored"))
      .groupBy("dur")
      .agg(
        sum(when(col("censored"), 0L).otherwise(1L)).as("n_churn"),
        sum(when(col("censored"), 1L).otherwise(0L)).as("n_censored"))
      .orderBy("dur")
      .collect() // bounded by the corpus span in hours, never the session count
    val total = byDur.map(r => r.getLong(1) + r.getLong(2)).sum
    var atRisk = total
    var surv = 1000000000L
    val rows = byDur.map { r =>
      val (dur, nChurn, nCens) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val nRisk = atRisk
      surv = surv * (nRisk - nChurn) / nRisk
      atRisk -= nChurn + nCens
      (dur, nRisk, nChurn, nCens, nChurn * 1000000L / nRisk, surv)
    }
    import spark.implicits._
    rows.toSeq
      .toDF("dur_hours", "n_risk", "n_churn", "n_censored",
        "hazard_ppm", "survival_ppb")
  }

  /** Q135 — CUSUM change-point detection over the per-type hourly
    * series: the drift detector q123's z-score cannot be (a z-score
    * flags single spikes; CUSUM accumulates small sustained shifts
    * until they cross a decision threshold — Page's test).
    *
    * The textbook recursion s_t = max(0, s_{t-1} + x_t − μ − k) is not
    * window-expressible, but its closed form is: s_t = cum_t −
    * min(0, min_{j≤t} cum_j) with cum the prefix sum of deviations —
    * two stacked per-type window passes, exact BIGINT throughout.
    * Everything runs on the centi-count grid (100·x) so the slack and
    * threshold can be SCALE-RELATIVE — slack = μ_c div slackDiv,
    * threshold = thresholdMult·μ_c — and the detector keeps firing on
    * genuine drift (not on the corpus growing 10×) with no float ever
    * entering: both engines floor the same nonnegative divisions.
    * Same scale shape as [[anomalyZscore]]: everything is partitioned
    * by event_type; series length is bounded by the time span.
    */
  def cusumChangePoints(
      events: DataFrame, slackDiv: Long, thresholdMult: Long): DataFrame = {
    val filled = hourlySeries(events)
    cusumWithMu(filled, seriesMu(filled), slackDiv, thresholdMult)
  }

  /** The per-type reference level μ_c (centi-counts per hour) — the
    * "model" of the CUSUM detector. Split out so the streaming monitor
    * ([[graft.streaming.StreamingCusum]]) can pin a trained μ and
    * serve with it (the S17 broadcast-model shape), sharing the exact
    * scoring arithmetic with batch.
    */
  def seriesMu(filled: DataFrame): DataFrame =
    filled.groupBy("event_type")
      .agg(expr("(100 * sum(x)) div count(1)").as("mu_c"))

  /** Q137 — grouped OLS trend: per event type, the least-squares line
    * of value against time (is the revenue-per-event drifting up or
    * down, and how much of the variance does time explain?) — the
    * regression primitive a metrics warehouse computes per segment.
    *
    * Everything reduces to the five sufficient statistics (n, Σx, Σy,
    * Σxy, Σx², plus Σy² for R²) in ONE map-side-combined agg — the
    * textbook distributed-OLS shape: no per-group sort, no second
    * pass, 100 TB costs one scan. x = hours since the corpus epoch
    * (bounded magnitude keeps products exact), y = value on the centi
    * grid; the closed-form slope/intercept/R² assemble from
    * decimal(38,0) cross-products of the BIGINT sums (DuckDB HUGEINT)
    * — exact through ~1e12 rows per group — with the three terminal
    * doubles rounded on the shared 1e-6 grid.
    */
  def trendOls(events: DataFrame): DataFrame =
    trendFromStats(trendStats(events))

  /** The OLS sufficient statistics: per-type (n, Σx, Σy, Σxy, Σx²,
    * Σy²). Split out because these six sums are THE canonical
    * mergeable state — a streaming aggregation maintains exactly this
    * table (state bounded by the type space, never the event count),
    * so [[graft.streaming.StreamingTrend]] shares [[trendFromStats]]
    * with batch verbatim (the S27 maintenance contract, for
    * regression).
    */
  private[graft] def trendStats(events: DataFrame): DataFrame = {
    // 2024-01-01T00Z in epoch-hours: bounded x keeps Σx² small.
    val epochHour = 19723L * 24L
    events
      .select(col("event_type"),
        (expr(s"ts_us div ${HourUs}L") - epochHour).as("x"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("y"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        // The product sums accumulate in DECIMAL(38,0): a BIGINT sum
        // wraps silently under Spark's non-ANSI mode while DuckDB
        // promotes to HUGEINT — at y² ≈ 1e16 per row (value ≈ $1e6 on
        // the centi grid) the engines would diverge silently after
        // ~1e3 rows. Decimal matches HUGEINT's exactness to ~1e38
        // (int128 tops out at 1.7e38), so the honest bound is
        // n·Σ(y²) < 1e38 on BOTH engines — ~1e12 rows per group at
        // y ≈ 1e8. The linear sums sx/sy stay BIGINT (|x| is epoch
        // hours ≈ 1e4: wrap needs 1e15 rows · $1e6 values).
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
  }

  /** The OLS closed forms over a (maintained or one-shot) stats table
    * — the bounded final projection.
    */
  private[graft] def trendFromStats(stats: DataFrame): DataFrame =
    stats
      .withColumn("snum", expr(
        "CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("sden", expr(
        "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .withColumn("yden", expr(
        "CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
      .withColumn("slope_centi_per_hour",
        roundTo(col("snum").cast("double") / col("sden").cast("double"), 6))
      .withColumn("intercept_centi", roundTo(
        expr("CAST(CAST(sy AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sxy AS DOUBLE)")
          / col("sden").cast("double"), 6))
      .withColumn("r2", roundTo(
        expr("CAST(snum * snum AS DOUBLE)") /
          expr("CAST(sden * yden AS DOUBLE)"), 6))
      .select("event_type", "n", "slope_centi_per_hour", "intercept_centi", "r2")
      .orderBy("event_type")

  /** The closed-form CUSUM scorer under an explicit reference level —
    * the shared batch/stream contract.
    */
  def cusumWithMu(
      filled: DataFrame, mu: DataFrame,
      slackDiv: Long, thresholdMult: Long): DataFrame = {
    require(slackDiv > 0 && thresholdMult > 0,
      s"need slackDiv > 0 and thresholdMult > 0, got ($slackDiv, $thresholdMult)")
    val w = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled.join(broadcast(mu), "event_type")
      .withColumn("dev",
        expr(s"100 * x - mu_c - mu_c div $slackDiv"))
      .withColumn("cum", sum("dev").over(w))
      .withColumn("cusum_c", col("cum") - least(lit(0L), min("cum").over(w)))
      .withColumn("alarm", col("cusum_c") > col("mu_c") * thresholdMult)
      .select("event_type", "hour", "x", "cusum_c", "alarm")
      .orderBy("event_type", "hour")
  }
}
