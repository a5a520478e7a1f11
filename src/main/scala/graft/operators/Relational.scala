package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Deterministic.{exactSum, roundTo}
import graft.sources.Tables

/** Relational query surface (SURVEY.md §2C Q3-Q8, Q13-Q16): joins,
  * aggregations, rollup, set ops, scalar/JSON/array functions — all
  * Catalyst built-ins, declared so the optimizer keeps pushdown,
  * pruning, and join-strategy choices.
  *
  * Scale notes: only genuinely bounded dimensions (region: 5 rows,
  * nation: 25 rows — fixed at every SF) carry an explicit `broadcast()`
  * hint; SF-growing tables (customer, orders, ...) are left to AQE,
  * which broadcasts them at small SF and shuffle-joins at scale.
  * Aggregation keys are low-cardinality so partial (map-side)
  * aggregation collapses most rows before shuffle.
  */
object Relational {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(spark, dir, name)

  /** Q3 — equi join + agg with broadcast dimension. */
  def joinAgg(spark: SparkSession, dir: String): DataFrame = {
    val customer = t(spark, dir, "customer")
    val nation = t(spark, dir, "nation")
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        count(lit(1)).as("n_customers"),
        round(exactSum(col("c_acctbal"), 2), 2).as("total_acctbal"))
      .orderBy("n_name")
  }

  /** Q4 — multi-way join + agg (TPC-H Q5 shape): revenue by nation.
    * lineitem⋈orders and orders⋈customer shuffle on their keys —
    * customer grows with SF (~10 GB+ at the 100 TB framing) so it is
    * deliberately NOT broadcast-hinted; AQE picks broadcast at small SF
    * on its own. nation/region are genuinely bounded (25/5 rows) and
    * stay broadcast. At 100 TB, lineitem/orders co-bucketed on orderkey
    * would remove the first shuffle too.
    */
  def multiJoinRevenue(spark: SparkSession, dir: String): DataFrame = {
    val lineitem = t(spark, dir, "lineitem")
    val orders = t(spark, dir, "orders")
    val customer = t(spark, dir, "customer")
    val nation = t(spark, dir, "nation")
    val region = t(spark, dir, "region")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        round(exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** Q57 — the full star: every relational table of the schema in ONE
    * query (TPC-H Q5's local-supplier shape — supplier nation must
    * equal customer nation, so the supplier join carries a second,
    * non-key predicate). Facts (lineitem⋈orders) shuffle on their join
    * keys; the growing dimensions (customer, part, supplier) join by
    * size under AQE with no forced hints; the bounded dims
    * (nation, region) broadcast. Catalyst's join reordering gets the
    * full 7-relation graph to work with — this is the query that
    * catches a bad join order at scale.
    */
  def starJoin(spark: SparkSession, dir: String): DataFrame = {
    val lineitem = t(spark, dir, "lineitem")
    val orders = t(spark, dir, "orders")
    val customer = t(spark, dir, "customer")
    val supplier = t(spark, dir, "supplier")
    val part = t(spark, dir, "part")
    val nation = t(spark, dir, "nation")
    val region = t(spark, dir, "region")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(supplier,
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .join(part, col("l_partkey") === col("p_partkey") && col("p_size") <= 25)
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        round(exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** Q5 — anti join: customers with no orders (NOT EXISTS). */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val customer = t(spark, dir, "customer")
    val orders = t(spark, dir, "orders")
    customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Q5b — semi join: suppliers that supply at least one shipped part. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val supplier = t(spark, dir, "supplier")
    val lineitem = t(spark, dir, "lineitem")
    supplier
      .join(lineitem, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  /** Q6 — wide hash aggregation (TPC-H Q1 shape). Measures rounded so
    * double summation-order noise can't break cross-engine hashes.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(expr("l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(exactSum(col("l_quantity"), 2), 2).as("sum_qty"),
        round(exactSum(col("l_extendedprice"), 2), 2).as("sum_base_price"),
        round(exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4), 2).as("sum_disc_price"),
        roundTo(exactSum(col("l_quantity"), 2) / count(lit(1)), 4).as("avg_qty"),
        roundTo(exactSum(col("l_extendedprice"), 2) / count(lit(1)), 4).as("avg_price"),
        roundTo(exactSum(col("l_discount"), 2) / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q8 — rollup over nation × order priority. NULL subtotal markers are
    * coalesced to 'ALL' so NULL-ordering differences between engines
    * can't affect the hash.
    */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val customer = t(spark, dir, "customer")
    val nation = t(spark, dir, "nation")
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      // rollup(expr(...)) rather than rollup("name", ...): the String
      // overload resolves grouping columns via df.col, which tags them
      // with dataset ids; the Expand node then duplicates the tagged
      // attributes and ANY later reference (even plain col) trips the
      // ambiguous-self-join check in Spark 4.1. expr() yields untagged
      // UnresolvedAttributes and resolves cleanly.
      .rollup(expr("n_name"), expr("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(exactSum(col("o_totalprice"), 2), 2).as("total_price"))
      .select(
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total_price"))
      .orderBy("nation", "priority")
  }

  /** Q8b — cube over the same join as [[rollupAgg]]: all four grouping
    * combinations (both, each alone, grand total) in one pass via
    * Expand — the planner turns this into a single shuffle, not four
    * queries.
    */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val customer = t(spark, dir, "customer")
    val nation = t(spark, dir, "nation")
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .cube(expr("n_name"), expr("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(exactSum(col("o_totalprice"), 2), 2).as("total_price"))
      .select(
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total_price"))
      .orderBy("nation", "priority")
  }

  /** Q30 — explicit GROUPING SETS (the general form of [[rollupAgg]] /
    * [[cubeAgg]]): per-(lang, source), per-lang, and per-source document
    * strata in one Expand pass — one shuffle for all three groupings,
    * not three queries. The grand-total set is deliberately omitted to
    * show an arbitrary (non-rollup, non-cube) set list.
    */
  def groupingSetsAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      // expr(), not col(): same dataset-id-tagging trap as rollup above.
      .groupingSets(
        Seq(Seq(expr("lang"), expr("source")), Seq(expr("lang")), Seq(expr("source"))),
        expr("lang"), expr("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("long").as("total_chars"))
      .select(
        coalesce(col("lang"), lit("ALL")).as("lang"),
        coalesce(col("source"), lit("ALL")).as("source"),
        col("n_docs"), col("total_chars"))
      .orderBy("lang", "source")

  /** Q24 — part revenue by brand (TPC-H Q14/Q19 shape): fact⋈dimension
    * join where the dimension grows with SF (so no broadcast hint — AQE
    * decides from sizes), with the dimension predicate (`p_size`) pushed
    * into its scan before the join.
    */
  def partRevenue(spark: SparkSession, dir: String): DataFrame = {
    val lineitem = t(spark, dir, "lineitem")
    val part = t(spark, dir, "part").filter(col("p_size") <= 25)
    lineitem
      .join(part, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        countDistinct(col("p_partkey")).as("n_parts"),
        count(lit(1)).as("n_items"),
        round(exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4), 2).as("revenue"))
      .orderBy("p_brand")
  }

  /** Q33 — full outer join: the key-presence reconciliation query
    * (which customers have events, which events have no customer row).
    * Nulls from both sides are made explicit as a category column so
    * the result is null-ordering-proof.
    */
  def outerJoin(spark: SparkSession, dir: String): DataFrame = {
    val custKeys = t(spark, dir, "customer").select(col("c_custkey").as("key"))
    val eventUsers = Tables.events(spark, dir)
      .groupBy(col("user_id").as("key")).agg(count(lit(1)).as("n_events"))
    custKeys
      .withColumn("is_cust", lit(1L))
      .join(eventUsers, Seq("key"), "full_outer")
      .select(
        col("key"),
        when(col("is_cust").isNotNull && col("n_events").isNotNull, "both")
          .when(col("is_cust").isNotNull, "customer_only")
          .otherwise("events_only").as("presence"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy("key")
  }

  /** Q34 — collection aggregation: per user, the distinct event types
    * seen, as a canonically sorted joined string (set semantics need an
    * explicit order before they can hash deterministically anywhere).
    */
  def collectTypes(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(
        array_join(array_sort(collect_set(col("event_type"))), ",").as("types_seen"),
        countDistinct(col("event_type")).as("n_types"))
      .orderBy("user_id")

  /** Q13 — set operations, tagged and unioned into one deterministic
    * relation: EXCEPT / INTERSECT / UNION over comparable key domains.
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val eventUsers = Tables.events(spark, dir).select(col("user_id").as("id"))
    val orderCusts = t(spark, dir, "orders").select(col("o_custkey").as("id"))
    val custKeys = t(spark, dir, "customer").select(col("c_custkey").as("id"))
    val ex = eventUsers.except(orderCusts).withColumn("op", lit("except"))
    val in = eventUsers.intersect(orderCusts).withColumn("op", lit("intersect"))
    val un = eventUsers.union(custKeys).distinct().withColumn("op", lit("union"))
    ex.union(in).union(un).select("op", "id").orderBy("op", "id")
  }

  /** Q14 — JSON extraction over `events.props` (the reference's
    * `State.Data` map analogue, model/state.go:10).
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), round(exactSum(col("value"), 2), 2).as("sum_value"))
      .orderBy("k")

  /** Q15 — scalar function sampler: date, string, math functions in one
    * grouped query. Day rendered as a string so both engines hash the
    * identical value.
    */
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("prefix", substring(col("event_type"), 1, 3))
      .groupBy("day", "prefix")
      .agg(
        count(lit(1)).as("n"),
        round(exactSum(col("value"), 2), 2).as("sum_value"),
        roundTo(exactSum(abs(col("value")), 2) / count(lit(1)), 4).as("avg_abs"))
      .orderBy("day", "prefix")

  /** Q15c — string scalar breadth over documents: case mapping,
    * reversal, padding, edit distance, global regex replacement — one
    * projection, no shuffle, every function cross-engine exact (strings
    * have no rounding problems).
    */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        upper(substring(col("text"), 1, 12)).as("head_upper"),
        reverse(col("lang")).as("gnal"),
        lpad(col("source"), 8, "_").as("source_pad"),
        levenshtein(col("lang"), lit("en")).as("lang_dist"),
        length(regexp_replace(col("text"), "[aeiou]", "")).as("n_consonant_chars"),
        concat_ws("|", col("lang"), col("source")).as("stratum"))
      .orderBy("doc_id")

  /** Q36 — map functions over `events.props` parsed as a real
    * `map<string,string>` (the reference's `State.Data` type,
    * model/state.go:10, as a first-class column type): key listing
    * (canonically sorted), cardinality, point lookup, and map
    * augmentation. Pure projection — no shuffle, fully codegen'd.
    */
  def mapFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("m", from_json(col("props"), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)))
      .select(
        col("event_id"),
        array_join(array_sort(map_keys(col("m"))), ",").as("keys"),
        size(col("m")).cast("long").as("n_keys"),
        // try_element_at, not element_at: under ANSI mode (Spark 4
        // default) element_at THROWS on a missing key; the missing-key
        // answer here is NULL, like the oracle's json_extract_string.
        try_element_at(col("m"), lit("k")).cast("long").as("k_val"),
        // Overwrite-on-collision spelled explicitly (drop an existing
        // 't' before adding ours): map_concat's behavior on duplicate
        // keys is a session policy (EXCEPTION by default) — a query
        // must not depend on it.
        size(map_concat(expr("map_filter(m, (k, v) -> k != 't')"),
          map(lit("t"), col("event_type")))).cast("long").as("n_aug"))
      .orderBy("event_id")

  /** Q37 — conditional aggregation: predicate-filtered counts and sums
    * (`count_if` / CASE-gated exactSum), boolean aggregates
    * (`bool_or`/`bool_and`), and a predicate-gated distinct count, all
    * in ONE hash aggregation pass — the single-scan formulation of
    * "N metrics with different WHERE clauses", which at scale replaces
    * N self-joining subqueries.
    */
  def conditionalAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        expr("count_if(value > 50.0)").as("n_high"),
        round(exactSum(when(col("value") > 50.0, col("value")).otherwise(lit(0.0)), 2), 2)
          .as("sum_high"),
        expr("bool_or(value > 99.0)").as("any_gt99"),
        expr("bool_and(value >= 0.0)").as("all_nonneg"),
        countDistinct(when(col("value") > 90.0, col("user_id"))).as("n_users_gt90"))
      .orderBy("event_type")

  /** Q38 — correlated subqueries (SQL surface): a correlated scalar
    * aggregate in the WHERE clause (customers above their own nation's
    * average balance) and one in the SELECT list (their order count).
    * Catalyst de-correlates both into aggregate+join subplans — the
    * scale-safe rewrite (one aggregation over the inner table, one
    * join) rather than a per-row re-execution.
    */
  def correlatedSubqueries(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("graft_customer")
    t(spark, dir, "orders").createOrReplaceTempView("graft_orders")
    spark.sql(
      """SELECT c_custkey, c_nationkey, c_acctbal,
                (SELECT count(*) FROM graft_orders o
                 WHERE o.o_custkey = c.c_custkey) AS n_orders
         FROM graft_customer c
         WHERE c_acctbal > (SELECT avg(i.c_acctbal) FROM graft_customer i
                            WHERE i.c_nationkey = c.c_nationkey)
         ORDER BY c_custkey""")
  }

  /** Q39 — null-safe equality join (`<=>`): the null bucket (events
    * whose props carry no `k`) joins to the other side's null bucket
    * instead of disappearing, so the reconciliation covers every row.
    * Both inputs aggregate BEFORE the join (key-space-sized, not
    * row-space-sized) and the full-outer keeps unmatched keys from
    * either side.
    */
  def nullSafeJoin(spark: SparkSession, dir: String): DataFrame =
    nullSafeReconcile(Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long")))

  /** Core of [[nullSafeJoin]] over any (event_id, k) relation — split
    * out so the null bucket and unmatched-side paths are unit-testable
    * with synthetic nulls (the natural corpus happens to always carry
    * `k`, which would leave the query's defining semantics untested).
    */
  private[graft] def nullSafeReconcile(k: DataFrame): DataFrame = {
    val even = k.where(col("event_id") % 2 === 0)
      .groupBy("k").agg(count(lit(1)).as("n_even"))
    val odd = k.where(col("event_id") % 2 === 1)
      .groupBy(col("k").as("k2")).agg(count(lit(1)).as("n_odd"))
    even.join(odd, col("k") <=> col("k2"), "full_outer")
      .select(
        coalesce(col("k"), col("k2")).as("k"),
        coalesce(col("n_even"), lit(0L)).as("n_even"),
        coalesce(col("n_odd"), lit(0L)).as("n_odd"))
      .orderBy(col("k").asc_nulls_first)
  }

  /** Q16 — array functions over the embeddings table: length, element
    * access, and an elementwise fold (squared L2 norm). Arithmetic in
    * double on both engines; rounded before hashing.
    */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .withColumn("e", col("embedding").cast("array<double>"))
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(element_at(col("e"), 1), 4).as("first_elem"),
        round(expr("aggregate(e, 0D, (acc, x) -> acc + x * x)"), 4).as("sq_norm"),
        col("label"))
      .orderBy("vec_id")
}
