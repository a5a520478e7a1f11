package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §2C for the declared query
  * inventory. Every entry in [[queries]] has, where SQL-expressible, an
  * equivalent DuckDB oracle in [[oracleSql]]; column names and types are
  * aligned pairwise (the driver sorts columns by name and hash-compares
  * values).
  *
  * Cross-engine determinism rules used throughout:
  *   - event time = `ts_us` epoch-microseconds Long (see
  *     [[graft.sources.Tables.events]] for why micros, not nanos);
  *   - every float measure is `round(...)`-ed in BOTH engines;
  *   - every result has a total ORDER BY on unique key columns;
  *   - rank/row_number outputs cast to BIGINT on the Spark side
  *     (DuckDB window functions return BIGINT);
  *   - integer sums wrapped in CAST(... AS BIGINT) on the DuckDB side
  *     (DuckDB sums BIGINT into HUGEINT).
  */
object SparkEntry {

  // Fixed parameters shared by the Spark queries and the DuckDB oracles.
  /** Q1 delta-scan watermarks: 2024-01-10 / 2024-01-20 UTC in epoch-us
    * (events span 2024-01-01..2024-01-30 at every SF). */
  private val DeltaLastKnownUs = 1704844800000000L
  private val DeltaServerTUs = 1705708800000000L
  /** Session inactivity gap: 1 day in us (the reference's 10 s timeout
    * rescaled to the test data's natural timescale, model/game.go:12). */
  private val SessionGapUs = 86400000000L
  private val TopK = 10

  /** DuckDB mirror of [[graft.functions.Deterministic.exactSum]]: scale
    * each row to an integer (per-row IEEE ops are bit-identical across
    * engines), sum integers (exact, order-free), divide back. Every
    * oracle measure that pairs with exactSum on the Spark side MUST use
    * this form — pairing exactSum against a raw-double `sum()` is a
    * latent hash flake whenever a group total lands on a rounding
    * boundary (that is exactly how round-1 q15 failed).
    */
  private def exactSumSql(x: String, decimals: Int): String = {
    val scale = math.pow(10, decimals).toLong
    s"CAST(sum(CAST(round(($x) * $scale) AS BIGINT)) AS DOUBLE) / $scale"
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.multiJoinRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_delta_scan" -> ((s, d) =>
      EventLog.deltaEvents(Tables.events(s, d), DeltaLastKnownUs, DeltaServerTUs)),
    "q02_latest_state" -> ((s, d) => EventLog.latestState(Tables.events(s, d))),
    "q03_join_agg" -> ((s, d) => Relational.joinAgg(s, d)),
    "q04_multijoin_revenue" -> ((s, d) => Relational.multiJoinRevenue(s, d)),
    "q05_anti_join" -> ((s, d) => Relational.antiJoin(s, d)),
    "q05b_semi_join" -> ((s, d) => Relational.semiJoin(s, d)),
    "q06_pricing_summary" -> ((s, d) => Relational.pricingSummary(s, d)),
    "q07_distinct_users" -> ((s, d) => EventLog.distinctUsers(Tables.events(s, d))),
    "q08_rollup" -> ((s, d) => Relational.rollupAgg(s, d)),
    "q09_sessionize" -> ((s, d) => EventLog.sessionize(Tables.events(s, d), SessionGapUs)),
    "q10_proxy_ids" -> ((s, d) => EventLog.proxyIds(Tables.events(s, d))),
    "q11_window_funcs" -> ((s, d) => EventLog.windowFuncs(Tables.events(s, d))),
    "q12_topk" -> ((s, d) => EventLog.topK(Tables.events(s, d), TopK)),
    "q13_set_ops" -> ((s, d) => Relational.setOps(s, d)),
    "q14_json_extract" -> ((s, d) => Relational.jsonExtract(s, d)),
    "q15_scalar_funcs" -> ((s, d) => Relational.scalarFuncs(s, d)),
    "q16_array_funcs" -> ((s, d) => Relational.arrayFuncs(s, d)),
    "q20_sync_replay" -> ((s, d) => EventLog.syncReplay(Tables.events(s, d), SessionGapUs)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_delta_scan" ->
      s"""SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props
          FROM events
          WHERE epoch_us(ts) > $DeltaLastKnownUs AND epoch_us(ts) <= $DeltaServerTUs
          ORDER BY ts_us, event_id""",
    "q02_latest_state" ->
      """SELECT user_id, props AS state, ts_us AS t FROM (
           SELECT user_id, props, epoch_us(ts) AS ts_us,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
           FROM events) WHERE rn = 1 ORDER BY user_id""",
    "q03_join_agg" ->
      s"""SELECT n_name, count(*) AS n_customers,
                 round(${exactSumSql("c_acctbal", 2)}, 2) AS total_acctbal
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name ORDER BY n_name""",
    "q04_multijoin_revenue" ->
      s"""SELECT r_name, n_name,
                 round(${exactSumSql("l_extendedprice * (1.0 - l_discount)", 4)}, 2) AS revenue,
                 count(*) AS n_items
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q05_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q05b_semi_join" ->
      """SELECT s_suppkey, s_name FROM supplier
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
         ORDER BY s_suppkey""",
    "q06_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
                 round(${exactSumSql("l_quantity", 2)}, 2) AS sum_qty,
                 round(${exactSumSql("l_extendedprice", 2)}, 2) AS sum_base_price,
                 round(${exactSumSql("l_extendedprice * (1.0 - l_discount)", 4)}, 2) AS sum_disc_price,
                 round(${exactSumSql("l_quantity", 2)} / count(*), 4) AS avg_qty,
                 round(${exactSumSql("l_extendedprice", 2)} / count(*), 4) AS avg_price,
                 round(${exactSumSql("l_discount", 2)} / count(*), 6) AS avg_disc,
                 count(*) AS count_order
          FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
          GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q07_distinct_users" ->
      "SELECT count(*) AS n_events, count(DISTINCT user_id) AS n_users FROM events",
    "q08_rollup" ->
      s"""SELECT coalesce(n_name, 'ALL') AS nation,
                coalesce(o_orderpriority, 'ALL') AS priority,
                count(*) AS n_orders, round(${exactSumSql("o_totalprice", 2)}, 2) AS total_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY ROLLUP(n_name, o_orderpriority) ORDER BY nation, priority""",
    "q09_sessionize" ->
      s"""WITH m AS (
            SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                   lag(epoch_us(ts)) OVER (PARTITION BY user_id
                     ORDER BY epoch_us(ts), event_id) AS prev_ts
            FROM events)
          SELECT user_id,
                 CAST(sum(CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > $SessionGapUs
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
                 count(*) AS n_events
          FROM m GROUP BY user_id ORDER BY user_id""",
    "q10_proxy_ids" ->
      """SELECT user_id, first_seen,
                CAST(row_number() OVER (ORDER BY first_seen, user_id) AS BIGINT) AS proxy_id
         FROM (SELECT user_id, min(epoch_us(ts)) AS first_seen FROM events GROUP BY user_id)
         ORDER BY proxy_id""",
    "q11_window_funcs" ->
      """SELECT event_id, user_id, ts_us,
                round(sum(value) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                  ROWS UNBOUNDED PRECEDING), 2) AS running_sum,
                ts_us - lag(ts_us) OVER (PARTITION BY user_id
                  ORDER BY ts_us, event_id) AS gap_us,
                CAST(row_number() OVER (PARTITION BY user_id
                  ORDER BY ts_us, event_id) AS BIGINT) AS rn
         FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events)
         ORDER BY event_id""",
    "q12_topk" ->
      s"""SELECT user_id, round(${exactSumSql("value", 2)}, 2) AS total_value, count(*) AS n_events
          FROM events GROUP BY user_id
          ORDER BY total_value DESC, user_id LIMIT $TopK""",
    "q13_set_ops" ->
      """WITH eu AS (SELECT DISTINCT user_id AS id FROM events),
              oc AS (SELECT DISTINCT o_custkey AS id FROM orders),
              ck AS (SELECT c_custkey AS id FROM customer)
         SELECT 'except' AS op, id FROM (SELECT id FROM eu EXCEPT SELECT id FROM oc)
         UNION ALL
         SELECT 'intersect' AS op, id FROM (SELECT id FROM eu INTERSECT SELECT id FROM oc)
         UNION ALL
         SELECT 'union' AS op, id FROM (SELECT id FROM eu UNION SELECT id FROM ck)
         ORDER BY op, id""",
    "q14_json_extract" ->
      s"""SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k,
                 count(*) AS n, round(${exactSumSql("value", 2)}, 2) AS sum_value
          FROM events GROUP BY k ORDER BY k NULLS FIRST""",
    "q15_scalar_funcs" ->
      s"""SELECT strftime(ts, '%Y-%m-%d') AS day, substr(event_type, 1, 3) AS prefix,
                 count(*) AS n, round(${exactSumSql("value", 2)}, 2) AS sum_value,
                 round(${exactSumSql("abs(value)", 2)} / count(*), 4) AS avg_abs
          FROM events GROUP BY day, prefix ORDER BY day, prefix""",
    "q16_array_funcs" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
                round(CAST(embedding[1] AS DOUBLE), 4) AS first_elem,
                round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), 4) AS sq_norm,
                label
         FROM embeddings ORDER BY vec_id""",
    "q20_sync_replay" ->
      s"""WITH m AS (
            SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                   lag(epoch_us(ts)) OVER (PARTITION BY user_id
                     ORDER BY epoch_us(ts), event_id) AS prev_ts
            FROM events),
          s AS (
            SELECT user_id, event_id, ts_us,
                   sum(CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > $SessionGapUs
                            THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS sess_no
            FROM m),
          a AS (
            SELECT user_id, sess_no, min(ts_us) AS t_first, max(ts_us) AS t_last,
                   count(*) AS n_events
            FROM s GROUP BY user_id, sess_no)
          SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no, t_first, t_last, n_events,
                 CAST(row_number() OVER (ORDER BY t_first, user_id, sess_no) AS BIGINT) AS proxy_id
          FROM a ORDER BY proxy_id""",
  )
}
