package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PortableHash.hash48

/** One emitted CEP match — the q138 row shape. */
case class CepMatch(user_id: Long, match_no: Long,
                    view_event_id: Long, click_event_id: Long,
                    purchase_event_id: Long, view_to_purchase_us: Long)

/** Marketing/product-analytics operators over the event log:
  * multi-touch conversion attribution and A/B experiment readout
  * (north-star additions; the reference's only analytics surface is
  * the per-stream event list, eventStream.go:63-71 — cross-event
  * inference is new surface).
  *
  * Scale discipline shared with [[Pipeline]]: attribution's only heavy
  * operator is a BANDED equi-join (user_id × window-bucket — the q29
  * trick), never the per-user cross product that detonates on hot
  * users; the experiment readout reduces to a two-row arm table before
  * any cross-arm arithmetic. All credit/score arithmetic is exact
  * integer (ppm grids, decimal(38,0) cross-products) so the DuckDB
  * oracle hash-matches bit-for-bit.
  */
object Behavior {

  /** The per-conversion touch summary behind [[attributionReport]] —
    * split out so the streaming serve (S28) can run the identical
    * kernel per microbatch: each purchase row is scored independently
    * of every other purchase (stream ≡ batch under any split).
    *
    * A touch (view/click by the same user) is attributable to a
    * purchase iff it lies in the half-open lookback window
    * `[p.ts - windowUs, p)` on the (ts_us, event_id) total order —
    * the strict upper bound keeps a same-microsecond touch/purchase
    * pair deterministic, the same tie rule as [[AsofJoin]].
    *
    * Join shape: touches carry their window-bucket `ts_us div
    * windowUs`; each purchase probes its own bucket and the previous
    * one (a ≤window lookback spans at most two buckets), so the match
    * is a plain equi-join on (user_id, bucket) with the range check as
    * a residual filter — per-pair work bounded by touches-per-window,
    * never touches-per-user squared.
    *
    * Output per purchase: touch counts by type, and the first/last
    * touch type on the total order (`min_by`/`max_by` on the
    * (ts_us, event_id) struct — one partial-aggregated pass).
    */
  def conversionTouches(events: DataFrame, windowUs: Long): DataFrame =
    touchSummary(
      events.where(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), col("ts_us").as("pts")),
      events, windowUs)

  /** The attribution kernel on an explicit purchase batch — each
    * purchase row is summarized independently of every other purchase,
    * so a STREAM of conversions served against the static touch
    * history in foreachBatch (S28) equals the one-shot batch under any
    * microbatch split, with zero streaming state. `purchases` columns:
    * (pid, user_id, pts).
    */
  def touchSummary(
      purchases: DataFrame, events: DataFrame, windowUs: Long): DataFrame = {
    val probed = purchases
      .withColumn("probe",
        explode(array(expr(s"pts div $windowUs"), expr(s"pts div $windowUs - 1"))))
    val touches = events
      .where(col("event_type").isin("view", "click"))
      .select(
        col("event_id").as("tid"), col("user_id"),
        col("ts_us").as("tts"), col("event_type").as("touch_type"))
      .withColumn("probe", expr(s"tts div $windowUs"))
    probed
      .join(touches, Seq("user_id", "probe"))
      .where(col("tts") >= col("pts") - windowUs &&
        struct(col("tts"), col("tid")) < struct(col("pts"), col("pid")))
      .groupBy("pid")
      .agg(
        count(lit(1)).as("n_touches"),
        sum(when(col("touch_type") === "view", 1L).otherwise(0L)).as("n_view"),
        sum(when(col("touch_type") === "click", 1L).otherwise(0L)).as("n_click"),
        min_by(col("touch_type"), struct(col("tts"), col("tid"))).as("first_type"),
        max_by(col("touch_type"), struct(col("tts"), col("tid"))).as("last_type"))
  }

  /** Q130 — multi-touch attribution report: total conversion credit by
    * attribution model × touch type, on the exact ppm grid.
    *
    * Each converting purchase carries 1,000,000 ppm of credit.
    *   - `first` / `last`: all credit to the first / last touch's type.
    *   - `linear`: every touch gets `1e6 div n` ppm and the LAST touch
    *     absorbs the integer remainder, so credit sums to exactly 1e6
    *     per conversion with a deterministic tie-free assignment
    *     (exact while a purchase has ≤ 1e6 window touches — beyond
    *     that `div` floors to 0 and the last touch takes everything,
    *     still conservation-exact).
    *
    * Purchases with no window touch carry no credit (they never enter
    * [[conversionTouches]]'s output). The three model reports are
    * unions of aggregates over the per-purchase summary — a bounded
    * table (one row per converting purchase), so everything after the
    * banded join is cheap at any scale.
    */
  def attributionReport(events: DataFrame, windowUs: Long): DataFrame = {
    val per = conversionTouches(events, windowUs)
      .withColumn("base", expr("1000000L div n_touches"))
      .withColumn("rem", expr("1000000L - base * n_touches"))
    val first = per.groupBy(col("first_type").as("touch_type"))
      .agg(count(lit(1)).as("n_conv"), (count(lit(1)) * 1000000L).as("credit_ppm"))
      .select(lit("first").as("model"), col("touch_type"), col("n_conv"), col("credit_ppm"))
    val last = per.groupBy(col("last_type").as("touch_type"))
      .agg(count(lit(1)).as("n_conv"), (count(lit(1)) * 1000000L).as("credit_ppm"))
      .select(lit("last").as("model"), col("touch_type"), col("n_conv"), col("credit_ppm"))
    val linear = per
      .select(explode(array(
        struct(lit("view").as("touch_type"),
          (col("n_view") * col("base") +
            when(col("last_type") === "view", col("rem")).otherwise(0L)).as("credit")),
        struct(lit("click").as("touch_type"),
          (col("n_click") * col("base") +
            when(col("last_type") === "click", col("rem")).otherwise(0L)).as("credit"))))
        .as("c"))
      .select(col("c.touch_type"), col("c.credit"))
      .where(col("credit") > 0L)
      .groupBy("touch_type")
      .agg(count(lit(1)).as("n_conv"), sum("credit").as("credit_ppm"))
      .select(lit("linear").as("model"), col("touch_type"), col("n_conv"), col("credit_ppm"))
    first.unionByName(last).unionByName(linear)
      .orderBy("model", "touch_type")
  }

  /** Q138 — complex event processing: ordered pattern matching over
    * per-user event sequences (the MATCH_RECOGNIZE / Flink-CEP
    * capability Spark's SQL surface lacks). Pattern: view → click →
    * purchase with each step within `withinUs` of the PREVIOUS step,
    * non-overlapping matches (AFTER MATCH SKIP PAST LAST ROW), and a
    * fully deterministic automaton on the (ts_us, event_id) total
    * order:
    *
    *   - state 0 (seek view): a view anchors a partial match.
    *   - state 1 (seek click): a step timeout (event beyond
    *     view_ts + within) resets to state 0 and the CURRENT event is
    *     reprocessed there (a timing-out view starts the next anchor);
    *     additional views inside the window do NOT re-anchor (strict
    *     first-match, the deterministic choice).
    *   - state 2 (seek purchase): same timeout rule against click_ts;
    *     a purchase emits the match and resets.
    *
    * The q42/q93 funnels answer "how many USERS converted"; this
    * answers "every OCCURRENCE, with its event ids and latency" — the
    * per-match table sessions, attribution audits, and fraud rules
    * consume.
    *
    * This is the 3-step instance of the generalized pattern engine
    * ([[Cep.matchesGeneric]] — bring-your-own steps/predicates/
    * timeouts); the projection back to the named view/click/purchase
    * columns keeps the original q138 row shape bit-for-bit.
    *
    * Scale shape (the q59b ordered-fold contract): ONE shuffle on
    * user_id, an EXTERNAL sort within partitions, then a linear
    * mapPartitions fold with O(1) state — no per-user materialization,
    * so a 10⁸-event hot key streams through instead of buffering in
    * one executor. The DuckDB oracle replays the identical automaton
    * as a recursive CTE, so matches are hash-exact.
    */
  def cepMatches(events: DataFrame, withinUs: Long): DataFrame =
    Cep.matchesGeneric(events, Cep.funnel3(withinUs))
      .select(col("user_id"), col("match_no"),
        col("step_event_ids")(0).as("view_event_id"),
        col("step_event_ids")(1).as("click_event_id"),
        col("step_event_ids")(2).as("purchase_event_id"),
        col("duration_us").as("view_to_purchase_us"))
      .orderBy("user_id", "match_no")

  /** Q131 — A/B experiment readout with a float-free significance
    * verdict.
    *
    * Arm assignment is the q43 deterministic hash split
    * ([[Pipeline.withSplit]]'s convention): `hash48(salt:user_id) % 2`
    * — reproducible across runs, engines, and partitionings, so the
    * readout is a pure function of the corpus. Conversion = ACTIVATION:
    * the user purchases within `activationUs` of their first event
    * (computable in ONE agg — earliest purchase ts ≤ first ts +
    * window — no self-join); exposure = the user appears at all.
    *
    * The verdict is the pooled two-proportion z-test restated as an
    * exact integer inequality (the q123 trick):
    *   (p1−p2)² > z²·p̂(1−p̂)(1/n1+1/n2)
    *   ⇔ (c1·n2 − c2·n1)²·N > z²·C·(N−C)·n1·n2
    * with C = c1+c2, N = n1+n2 — computed in decimal(38,0) (DuckDB
    * HUGEINT), exact up to ~1e9 users per arm, so both engines agree
    * bit-for-bit with no float epsilon.
    *
    * Everything reduces to a two-row arm table before the cross-arm
    * arithmetic: one distinct-user agg (map-side combined) + one
    * 2-row agg + a broadcast of the one-row verdict back onto the
    * arms.
    */
  def abReadout(
      events: DataFrame, salt: String, z2: Int, activationUs: Long): DataFrame = {
    val arms = events
      .groupBy("user_id")
      .agg(
        min("ts_us").as("t0"),
        min(when(col("event_type") === "purchase", col("ts_us"))).as("tp"))
      .withColumn("converted",
        when(col("tp").isNotNull && col("tp") <= col("t0") + activationUs, 1L)
          .otherwise(0L))
      .withColumn("arm", expr(s"${hash48(s"concat('$salt', ':', CAST(user_id AS STRING))")} % 2"))
      .groupBy("arm")
      .agg(count(lit(1)).as("n_users"), sum("converted").as("n_conv"))
    val verdict = arms
      .agg(
        sum(when(col("arm") === 0, col("n_users"))).as("n1"),
        sum(when(col("arm") === 0, col("n_conv"))).as("c1"),
        sum(when(col("arm") === 1, col("n_users"))).as("n2"),
        sum(when(col("arm") === 1, col("n_conv"))).as("c2"))
      // coalesce: with a degenerate split (every user hashed to one
      // arm — tiny corpus or skewed salt) the missing arm's n/c are
      // null and the inequality is null; an absent comparison arm is
      // "not significant", not an unknown verdict poisoning every row.
      .select(coalesce(expr(
        s"""(CAST(c1 AS DECIMAL(38,0)) * n2 - CAST(c2 AS DECIMAL(38,0)) * n1)
            * (CAST(c1 AS DECIMAL(38,0)) * n2 - CAST(c2 AS DECIMAL(38,0)) * n1)
            * (n1 + n2)
          > CAST($z2 AS DECIMAL(38,0)) * (c1 + c2) * (n1 + n2 - c1 - c2) * n1 * n2
         """), lit(false)).as("significant"))
    arms
      .withColumn("conv_ppm", expr("n_conv * 1000000L div n_users"))
      .crossJoin(broadcast(verdict))
      .select("arm", "n_users", "n_conv", "conv_ppm", "significant")
      .orderBy("arm")
  }
}
