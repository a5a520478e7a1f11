package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Deterministic.{exactSum, roundTo}

/** Batch re-expression of the reference's event-log query surface.
  *
  * The reference (michaeldgagnon/GoEventStream) holds an append-only
  * per-stream event log plus a latest-value-per-client state map, and
  * answers "what changed since tick X" scans over both. Here the log is
  * a Parquet-backed DataFrame with an explicit total order
  * `(ts_us, event_id)` — the reference's intra-tick order is mutex
  * arrival order (model/eventStream.go:53), which a distributed engine
  * must replace with an explicit sequence column.
  *
  * Scale notes (100 TB framing):
  *   - Delta scans are pure range predicates on the event-time column;
  *     Catalyst pushes them into the Parquet scan (row-group pruning via
  *     min/max stats). Storage partitioned/sorted by time buckets turns
  *     this into partition pruning — O(delta), not O(log).
  *   - Latest-state is a hash aggregation with map-side partial
  *     aggregation (`max_by` over a struct), shuffling only one row per
  *     (user, partition) — no window/sort over the full log.
  */
object EventLog {

  /** Q1 — delta event scan (model/eventStream.go:63-71): all events with
    * `lastKnown < t <= serverT`, in total `(t, event_id)` order. The
    * half-open-at-left interval reproduces the reference predicate
    * `event.T <= stream.T && event.T > lastT` (eventStream.go:66).
    *
    * The range is expressed on the RAW stored column (`ts`, a parquet
    * TIMESTAMP read as TimestampType — see [[graft.sources.Tables.events]]),
    * not a derived integer column: a predicate on a derived column never
    * reaches the scan, while on `ts` against foldable timestamp literals
    * it lands in PushedFilters and prunes parquet row groups — on a
    * time-partitioned 100 TB log, the difference between reading the
    * delta and reading everything. Micros-resolution bounds are exact:
    * `t > a ⟺ ts ≥ a+1 µs` and `t ≤ b ⟺ ts < b+1 µs`.
    */
  def deltaEvents(events: DataFrame, lastKnownUs: Long, serverTUs: Long): DataFrame =
    events
      .filter(
        col("ts") >= timestamp_micros(lit(lastKnownUs + 1)) &&
          col("ts") < timestamp_micros(lit(serverTUs + 1)))
      .select("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .orderBy("ts_us", "event_id")

  /** Q2 — latest-per-key LWW state (model/stateStream.go:19-21): each
    * client's state is the payload of its newest event; newest =
    * max(ts_us, event_id) so ties at microsecond resolution stay
    * deterministic. One hash agg; no window over the full log.
    */
  def latestState(events: DataFrame): DataFrame =
    events
      .groupBy("user_id")
      .agg(
        max_by(col("props"), struct(col("ts_us"), col("event_id"))).as("state"),
        max(col("ts_us")).as("t"))
      .orderBy("user_id")

  /** Q7 — distinct-client count; the reference's `lastProxyId` counter
    * (model/game.go:49) is a running count of distinct clients ever seen.
    */
  def distinctUsers(events: DataFrame): DataFrame =
    events.agg(
      count(lit(1)).as("n_events"),
      countDistinct(col("user_id")).as("n_users"))

  /** Q7b — approximate distinct clients (HyperLogLog++) next to the
    * exact count. At 100 TB `count(DISTINCT)` shuffles every key; the
    * HLL sketch is a constant-size mergeable accumulator — the scale
    * path. The sketch estimate itself is engine-specific, so the
    * deterministic cross-engine contract is the exact count plus a
    * boolean relative-error bound on the estimate.
    */
  def approxDistinctUsers(events: DataFrame, rsd: Double, tol: Double): DataFrame =
    events
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        approx_count_distinct(col("user_id"), rsd).as("approx"))
      .select(
        col("n_users"),
        (abs(col("approx") - col("n_users")) <= col("n_users") * tol).as("within_tol"))

  /** Q10 — dense monotonic proxy-id assignment (model/game.go:44-58):
    * first-seen order, ties broken by user_id. Dense id assignment is
    * inherently sequential in the reference (one counter under a mutex);
    * here it is the distributed two-pass scheme in [[DenseId]] — range
    * partition + in-partition sort + partition-offset stamping — which
    * holds at any user cardinality (no single-task window).
    */
  def proxyIds(events: DataFrame): DataFrame = {
    val firstSeen = events.groupBy("user_id").agg(min(col("ts_us")).as("first_seen"))
    DenseId.withDenseId(firstSeen, Seq(col("first_seen"), col("user_id")), "proxy_id")
      .select("user_id", "first_seen", "proxy_id")
      .orderBy("proxy_id")
  }

  /** Q9 — sessionization with an inactivity gap (model/game.go:92-113:
    * clients are evicted after 10 s idle; a returning client starts a new
    * session). Gap-and-island over per-user event sequences. `gapUs` is a
    * parameter because the test data's natural timescale is hours, not
    * the protocol's 10 s.
    */
  def sessionize(events: DataFrame, gapUs: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    events
      .withColumn("prev_ts", lag("ts_us", 1).over(w))
      .withColumn("is_start",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(sum("is_start").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** Q9c — sessionization via Spark's native `session_window` (the
    * idiomatic streaming-compatible form of [[sessionize]]; in a
    * `readStream` the identical expression gives watermarked incremental
    * sessions). Boundary alignment: `session_window` merges two events
    * when their gap is strictly less than the duration, while the
    * reference contract (and [[sessionize]]) starts a new session only
    * when the gap *exceeds* `gapUs` — so the duration is `gapUs + 1`
    * microsecond, making "merge iff gap <= gapUs" exact.
    */
  def sessionizeNative(events: DataFrame, gapUs: Long): DataFrame =
    events
      .groupBy(session_window(col("ts"), s"${gapUs + 1} microseconds"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n").as("n_events"))
      .orderBy("user_id")

  /** Q20 — batch sync replay: the reference's whole session lifecycle
    * (model/game.go:60-74) re-expressed declaratively. Each (user,
    * session) pair — sessions delimited by the inactivity gap, i.e. the
    * reference's timeout-disconnect — gets a fresh dense proxy id in
    * session-start order (reconnect after timeout ⇒ NEW proxy id,
    * game.go:49). Output: one row per session with its id assignment,
    * span, and event count.
    */
  def syncReplay(events: DataFrame, gapUs: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val sessions = events
      .withColumn("prev_ts", lag("ts_us", 1).over(w))
      .withColumn("is_start",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, 1L).otherwise(0L))
      .withColumn("sess_no", sum("is_start").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_no")
      .agg(
        min("ts_us").as("t_first"),
        max("ts_us").as("t_last"),
        count(lit(1)).as("n_events"))
    DenseId.withDenseId(
        sessions, Seq(col("t_first"), col("user_id"), col("sess_no")), "proxy_id")
      .select("user_id", "sess_no", "t_first", "t_last", "n_events", "proxy_id")
      .orderBy("proxy_id")
  }

  /** Q11 — per-user running aggregates + inter-event gap (window
    * functions over the log; north-star addition).
    */
  def windowFuncs(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    events
      .withColumn("running_sum",
        round(sum("value").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
      .withColumn("gap_us", col("ts_us") - lag("ts_us", 1).over(w))
      .withColumn("rn", row_number().over(w).cast("long"))
      .select("event_id", "user_id", "ts_us", "running_sum", "gap_us", "rn")
      .orderBy("event_id")
  }

  /** Q25 — exact percentiles of `value` per event type, via two BOUNDED
    * passes instead of `percentile`'s per-group multiset buffer (which
    * concentrates each group's whole column into one aggregation buffer
    * — with 5 event types, 5 reducers hold everything at 100 TB).
    * Values interpolate identically to `percentile`/`quantile_cont`
    * (the formula is mirrored bit-for-bit), so the DuckDB oracle is
    * unchanged; QuantileSpec additionally pins two-pass ≡ `percentile`
    * bit-for-bit pre-rounding.
    */
  def quantiles(events: DataFrame): DataFrame =
    exactQuantiles(events, Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99"))
      .select(col("event_type"), col("n"),
        roundTo(col("p50"), 4).as("p50"),
        roundTo(col("p90"), 4).as("p90"),
        roundTo(col("p99"), 4).as("p99"))
      .orderBy("event_type")

  /** Exact interpolated percentiles by two-pass grid selection — the
    * scale-safe formulation of ORDER-BY-rank selection:
    *
    * Pass 1 histograms (event_type, grid cell) with map-side partial
    * aggregation — the shuffle key space is bounded by the value range ×
    * grid resolution, independent of row count — then locates, for each
    * requested rank p·(n−1), the cell containing its floor/ceil
    * neighbors via a cumulative count over the (bounded) histogram.
    * Pass 2 rescans only rows in those few target cells (inner join
    * against the broadcast cell list) and rank-selects within each —
    * sort partition size = one cell's occupancy, never a whole group.
    * The grid only needs to be a deterministic monotone binning for
    * correctness; its resolution tunes cell occupancy.
    *
    * Interpolation mirrors Spark's `percentile` exactly:
    * `(ceil(rk)−rk)·v0 + (rk−floor(rk))·v1`, with integral ranks
    * returning v0 directly. Output: event_type, n, one unrounded column
    * per (p, name) requested.
    */
  private[graft] def exactQuantiles(
      df: DataFrame, ps: Seq[(Double, String)],
      cellsPerUnit: Double = 100.0,
      groupCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    val ev = df
      .select(col(groupCol).as("_g"), col(valueCol).cast("double").as("_v"))
      .where(col("_v").isNotNull)
      .withColumn("cell", floor(col("_v") * cellsPerUnit))
    val hist = ev.groupBy("_g", "cell").agg(count(lit(1)).as("cnt"))
    val wc = Window.partitionBy("_g").orderBy("cell")
    // Cell covers 0-indexed sorted ranks [lo_rank, hi_rank).
    val cum = hist
      .withColumn("hi_rank", sum("cnt").over(wc))
      .withColumn("lo_rank", col("hi_rank") - col("cnt"))
    val totals = hist.groupBy("_g").agg(sum("cnt").as("n"))
    // Ranks to fetch: floor and ceil neighbors of every requested p.
    val pvals = ps.map(_._1).distinct
    val ranks = totals
      .select(col("_g"), col("n"),
        explode(array(pvals.map(lit(_)): _*)).as("p"))
      .withColumn("rk", col("p") * (col("n") - 1).cast("double"))
      .withColumn("k0", floor(col("rk")))
      .withColumn("k1", least(col("k0") + 1, col("n") - 1))
      .select(col("_g"), col("n"), col("p"), col("rk"),
        explode(array(
          struct(col("k0").as("k"), lit(0).as("side")),
          struct(col("k1").as("k"), lit(1).as("side")))).as("t"))
      .select(col("_g"), col("n"), col("p"), col("rk"),
        col("t.k").as("k"), col("t.side").as("side"))
    val cells = cum.join(ranks, "_g")
      .where(col("lo_rank") <= col("k") && col("k") < col("hi_rank"))
      .select(col("_g"), col("cell"), col("n"), col("p"), col("rk"),
        col("side"), col("k"), col("lo_rank"))
    // Pass 2: within each target cell, the (k − lo_rank + 1)-th smallest
    // value. Ties in `_v` rank arbitrarily but the selected VALUE is
    // unique, so the result is deterministic.
    val wv = Window.partitionBy("_g", "p", "side").orderBy("_v")
    val picked = ev.join(broadcast(cells), Seq("_g", "cell"))
      .withColumn("rn", row_number().over(wv).cast("long"))
      .where(col("rn") === col("k") - col("lo_rank") + 1)
    val interp = picked.groupBy("_g", "n", "p", "rk")
      .agg(
        max(when(col("side") === 0, col("_v"))).as("v0"),
        max(when(col("side") === 1, col("_v"))).as("v1"))
      .withColumn("pct", when(col("rk") === floor(col("rk")), col("v0"))
        .otherwise((ceil(col("rk")) - col("rk")) * col("v0")
          + (col("rk") - floor(col("rk"))) * col("v1")))
    val aggs = ps.map { case (p, name) =>
      max(when(col("p") === p, col("pct"))).as(name)
    }
    interp.groupBy(col("_g"), col("n")).agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("_g", groupCol)
  }

  /** Q11b — ranking/distribution window-function breadth: quartile
    * (`ntile`), relative rank (`percent_rank`, `cume_dist`), lookahead
    * (`lead`) and frame anchors (`first_value`), all over the same
    * per-user total order as [[windowFuncs]]. Relative ranks are exact
    * rationals of the in-partition row number, so with a total order
    * they are cross-engine deterministic; rounded anyway per the float
    * rule.
    */
  def windowRanks(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    events
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pr", roundTo(percent_rank().over(w), 6))
      .withColumn("cd", roundTo(cume_dist().over(w), 6))
      .withColumn("next_value", lead("value", 1).over(w))
      .withColumn("first_ts", first("ts_us").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("event_id", "user_id", "quartile", "pr", "cd", "next_value", "first_ts")
      .orderBy("event_id")
  }

  /** Q15d — date arithmetic breadth: day shifting, day differencing,
    * integer week bucketing, and ISO day-of-week. Everything lands as
    * strings or integers so both engines hash identical values (Spark's
    * `weekday` is 0=Monday; ISO is 1=Monday — hence the +1).
    */
  def dateArith(events: DataFrame): DataFrame =
    events
      .withColumn("d", col("ts").cast("date"))
      .select(
        col("event_id"),
        date_format(col("d"), "yyyy-MM-dd").as("day"),
        date_format(date_add(col("d"), 7), "yyyy-MM-dd").as("day_plus_7"),
        datediff(col("d"), lit("2024-01-01").cast("date")).cast("long").as("days_since_start"),
        expr("CAST(datediff(d, DATE '2024-01-01') div 7 AS BIGINT)").as("week_of_corpus"),
        (weekday(col("d")) + lit(1)).cast("int").as("iso_dow"))
      .orderBy("event_id")

  /** Q11c — RANGE-frame window: per event, activity within ±1 day of
    * ITS OWN event time (`RANGE BETWEEN ... PRECEDING AND ...
    * FOLLOWING` over the numeric time column) — the value-based frame
    * ROWS frames can't express (neighbors counted by distance in time,
    * not by row offset). The windowed sum uses the exactSum integer
    * scheme inline, since the frame's contents must hash identically
    * across engines.
    */
  def rangeFrame(events: DataFrame, bandUs: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us")
      .rangeBetween(-bandUs, bandUs)
    events
      .withColumn("n_nearby", count(lit(1)).over(w))
      .withColumn("sum_nearby", round(
        sum(round(col("value") * 100, 0).cast("long")).over(w).cast("double") / 100, 2))
      .select("event_id", "user_id", "ts_us", "n_nearby", "sum_nearby")
      .orderBy("event_id")
  }

  /** Q15b — datetime scalar breadth: calendar-field extraction
    * (month / day-of-month / hour) drives the grouping — the everyday
    * "traffic by hour" rollup. Fields are integers in both engines (UTC
    * sessions), so no string-formatting locale traps.
    */
  def datetimeFuncs(events: DataFrame): DataFrame =
    events
      .groupBy(
        month(col("ts")).as("mon"),
        dayofmonth(col("ts")).as("dom"),
        hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"), round(exactSum(col("value"), 2), 2).as("sum_value"))
      .orderBy("mon", "dom", "hr")

  /** Q25b — approximate percentiles (GK mergeable sketch) next to the
    * exact ones: the 100 TB path, where exact `percentile` must sort
    * every group. Like Q7b, the sketch value is engine-specific, so the
    * deterministic cross-engine contract is the exact values plus
    * booleans asserting the sketch landed inside its guarantee — which
    * is a RANK bound (±n/accuracy ranks), not a value bound: the
    * returned value must lie between the exact `p ∓ rankTol`
    * percentiles. (A value-tolerance contract is wrong in heavy tails,
    * where one rank step can move the value by double digits.)
    */
  def approxQuantiles(events: DataFrame, accuracy: Int, rankTol: Double): DataFrame = {
    // Exact references (the p's themselves plus the p ∓ rankTol rank
    // bounds) come from the two-pass selection — nothing here buffers a
    // per-group multiset either.
    val base = Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99")
    val withBounds = base.flatMap { case (p, nm) => Seq(
      p -> nm,
      math.max(0.0, p - rankTol) -> s"${nm}_lob",
      math.min(1.0, p + rankTol) -> s"${nm}_hib")
    }
    val exact = exactQuantiles(events, withBounds)
    val sketch = events.groupBy("event_type").agg(
      expr(s"approx_percentile(value, 0.5D, $accuracy)").as("a50"),
      expr(s"approx_percentile(value, 0.9D, $accuracy)").as("a90"),
      expr(s"approx_percentile(value, 0.99D, $accuracy)").as("a99"))
    exact.join(sketch, "event_type")
      .select(col("event_type"), col("n"),
        roundTo(col("p50"), 4).as("p50"),
        roundTo(col("p90"), 4).as("p90"),
        roundTo(col("p99"), 4).as("p99"),
        col("a50").between(col("p50_lob"), col("p50_hib")).as("p50_ok"),
        col("a90").between(col("p90_lob"), col("p90_hib")).as("p90_ok"),
        col("a99").between(col("p99_lob"), col("p99_hib")).as("p99_ok"))
      .orderBy("event_type")
  }

  /** Q32 — sliding (hopping) window aggregation: 2-day windows every
    * 1 day, so each event lands in exactly 2 overlapping windows —
    * Spark's `window(ts, duration, slide)` in batch, and the identical
    * expression incrementally in a `readStream` (S1 proves the tumbling
    * case; sliding differs only in the per-event window fan-out).
    * Output keyed by the window start in epoch-us.
    */
  def slidingWindowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "2 days", "1 day").as("w"))
      .agg(count(lit(1)).as("n"), round(exactSum(col("value"), 2), 2).as("sum_value"))
      .select(unix_micros(col("w.start")).as("w_start"), col("n"), col("sum_value"))
      .orderBy("w_start")

  /** Q26 — fixed-width histogram of `value` per event type: bucket =
    * floor(value / width), exact integer math both engines agree on.
    * One hash aggregation; the classic distribution-profile scan.
    */
  def histogram(events: DataFrame, width: Double): DataFrame =
    events
      .groupBy(col("event_type"), floor(col("value") / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "bucket")

  /** Q52 — mergeable-sketch distinct counts: per-day HLL sketches
    * (Apache DataSketches via `hll_sketch_agg`) unioned up to per-type
    * totals. THIS is how distincts pre-aggregate at 100 TB: daily
    * sketches are built once at ingest (a few KB per key), and any
    * rollup — weekly, monthly, all-time — is a sketch union, never a
    * re-scan of raw data; naive daily distinct counts can't be summed
    * (overlap), which is exactly what the union handles. The estimate
    * is engine-specific, so the cross-engine contract is the q07b
    * shape: exact values + a tolerance boolean — with the tolerance
    * derived from the sketch's own accuracy model (HLL relative
    * standard error ≈ 1.04/√2^lgK; the bound is 3σ of the CONFIGURED
    * sketch, not an arbitrary constant), so a future lgK change
    * re-derives the bound instead of silently loosening the contract.
    */
  def mergeableDistinct(events: DataFrame, lgK: Int = 12): DataFrame =
    mergeableDistinctEstimates(events, lgK)
      .select("event_type", "n_days", "n_exact", "within_tol")
      .orderBy("event_type")

  /** 3σ relative error bound of an HLL sketch with `lgK` register bits. */
  def hllErrorBound(lgK: Int): Double = 3.0 * 1.04 / math.sqrt(math.pow(2.0, lgK))

  /** [[mergeableDistinct]] with the raw estimate and relative error
    * exposed — engine-specific values, so for logs and specs, not the
    * cross-engine oracle (which compares the boolean only).
    */
  def mergeableDistinctEstimates(events: DataFrame, lgK: Int = 12): DataFrame = {
    val tol = hllErrorBound(lgK)
    val daily = events
      .withColumn("day", expr("ts_us div 86400000000"))
      .groupBy("event_type", "day")
      .agg(expr(s"hll_sketch_agg(user_id, $lgK)").as("sk"))
    val merged = daily.groupBy("event_type")
      .agg(
        count(lit(1)).as("n_days"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("n_est"))
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("n_exact"))
    merged.join(exact, "event_type")
      .select(
        col("event_type"), col("n_days"), col("n_exact"), col("n_est"),
        roundTo(abs(col("n_est") - col("n_exact")).cast("double")
          / col("n_exact"), 6).as("rel_err"),
        (abs(col("n_est") - col("n_exact")).cast("double")
          <= col("n_exact") * tol).as("within_tol"))
      .orderBy("event_type")
  }

  /** Q27 — pivot: per-user event counts spread into one column per
    * event type. The type list is passed explicitly — at scale an
    * unlisted pivot costs a distinct-scan to discover values; listing
    * them keeps it one aggregation pass.
    */
  def pivotByType(events: DataFrame, types: Seq[String]): DataFrame =
    events
      .groupBy("user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy("user_id")

  /** Q27b — unpivot (melt): the wide per-type count matrix of
    * [[pivotByType]] back to long (user_id, event_type, n) form —
    * pivot's inverse, the wide→long reshape every feature matrix
    * eventually needs. Unpivot is a per-row expansion (Expand node):
    * map-only over the wide input, no shuffle beyond what produced it.
    */
  def unpivotCounts(events: DataFrame, types: Seq[String]): DataFrame =
    pivotByType(events, types)
      .unpivot(
        Array(col("user_id")), types.map(col).toArray, "event_type", "n")
      .orderBy("user_id", "event_type")

  /** Q12 — top-k users by total value. Ordering on the *rounded* measure
    * keeps the cutoff deterministic across engines.
    */
  def topK(events: DataFrame, k: Int): DataFrame =
    events
      .groupBy("user_id")
      .agg(round(exactSum(col("value"), 2), 2).as("total_value"), count(lit(1)).as("n_events"))
      .orderBy(col("total_value").desc, col("user_id"))
      .limit(k)
}
