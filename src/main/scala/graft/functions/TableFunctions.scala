package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL entry points for the table-shaped operator library — registered
  * table-valued functions (`SELECT * FROM graft_cep_matches('ev', …)`),
  * so the operators are usable from pure SQL, where real analytics
  * users live, not only from the Scala API.
  *
  * Each TVF takes the SOURCE TABLE NAME (a catalog/temp-view name) as
  * its first argument plus the operator's scalar parameters, all as
  * literals, and expands — at analysis time, via the session catalog —
  * to exactly the LogicalPlan the Scala API builds. There is no second
  * implementation to drift: the builder calls the same operator
  * function on `SparkSession.active.table(name)`, and the produced
  * (already-analyzed) plan is spliced into the outer query, where
  * Catalyst optimizes it together with the caller's filters and
  * projections like any other subquery. SqlSurfaceSpec pins
  * `sameResult` between each TVF's plan and its Scala-API twin.
  *
  * The expected input shape is the normalized events frame
  * ([[graft.sources.Tables.events]]: user_id, event_id, ts_us,
  * event_type, value) published under a view name by the caller.
  */
object TableFunctions {

  private def strArg(args: Seq[Expression], i: Int, fn: String): String =
    args(i) match {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a string literal, got $other")
    }

  private def longArg(args: Seq[Expression], i: Int, fn: String): Long =
    args(i) match {
      case Literal(v: Long, LongType)   => v
      case Literal(v: Int, IntegerType) => v.toLong
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an integer literal, got $other")
    }

  private def doubleArg(args: Seq[Expression], i: Int, fn: String): Double =
    args(i) match {
      case Literal(v: Double, DoubleType) => v
      case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
      case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
      case Literal(v: Long, LongType)   => v.toDouble
      case Literal(v: Int, IntegerType) => v.toDouble
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a numeric literal, got $other")
    }

  private def requireArity(args: Seq[Expression], n: Int, fn: String, usage: String): Unit =
    require(args.length == n, s"$fn takes $n arguments: $usage")

  private def tvf(name: String, usage: String, arity: Int)
                 (build: Seq[Expression] => org.apache.spark.sql.DataFrame)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.functions.TableFunctions", name, usage),
      (args: Seq[Expression]) => {
        requireArity(args, arity, name, usage)
        build(args).queryExecution.logical
      })

  /** All registered TVFs — injected by [[graft.GraftExtensions]]. */
  def descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)] = Seq(
    tvf("graft_cep_matches",
      "graft_cep_matches(events_view, within_us) — q138 CEP funnel matches", 2) { args =>
      graft.operators.Behavior.cepMatches(
        SparkSession.active.table(strArg(args, 0, "graft_cep_matches")),
        longArg(args, 1, "graft_cep_matches"))
    },
    tvf("graft_cep_pattern",
      "graft_cep_pattern(events_view, 'type[|alt…][{n}] [>= minValue] [<= gapTimeoutUs]; …') — generalized CEP matches", 2) { args =>
      graft.operators.Cep.matchesGeneric(
        SparkSession.active.table(strArg(args, 0, "graft_cep_pattern")),
        graft.operators.Cep.parsePattern(strArg(args, 1, "graft_cep_pattern")))
    },
    tvf("graft_asof_join",
      "graft_asof_join(events_view) — q28 purchase→last-view as-of join", 1) { args =>
      graft.operators.Temporal.asofLastView(
        SparkSession.active.table(strArg(args, 0, "graft_asof_join")))
    },
    tvf("graft_attribution",
      "graft_attribution(events_view, window_us) — q130 multi-touch attribution", 2) { args =>
      graft.operators.Behavior.attributionReport(
        SparkSession.active.table(strArg(args, 0, "graft_attribution")),
        longArg(args, 1, "graft_attribution"))
    },
    tvf("graft_winsorize",
      "graft_winsorize(events_view, p_lo, p_hi) — q125 per-type percentile clipping", 3) { args =>
      graft.operators.Pipeline.winsorize(
        SparkSession.active.table(strArg(args, 0, "graft_winsorize")),
        doubleArg(args, 1, "graft_winsorize"),
        doubleArg(args, 2, "graft_winsorize"))
    },
    tvf("graft_resample_ffill",
      "graft_resample_ffill(events_view) — q118 daily resample + forward fill", 1) { args =>
      graft.operators.Temporal.resampleDailyFfill(
        SparkSession.active.table(strArg(args, 0, "graft_resample_ffill")))
    },
    tvf("graft_cusum",
      "graft_cusum(events_view, slack_div, threshold_mult) — q135 CUSUM change points", 3) { args =>
      graft.operators.Temporal.cusumChangePoints(
        SparkSession.active.table(strArg(args, 0, "graft_cusum")),
        longArg(args, 1, "graft_cusum"),
        longArg(args, 2, "graft_cusum"))
    },
    tvf("graft_trend_ols",
      "graft_trend_ols(events_view) — q137 per-type OLS trend", 1) { args =>
      graft.operators.Temporal.trendOls(
        SparkSession.active.table(strArg(args, 0, "graft_trend_ols")))
    },
    tvf("graft_fact_changes",
      "graft_fact_changes(store_dir, from_version, to_version) — q140e change data feed between commits", 3) { args =>
      graft.sources.FactStore.changes(SparkSession.active,
        strArg(args, 0, "graft_fact_changes"),
        longArg(args, 1, "graft_fact_changes"),
        longArg(args, 2, "graft_fact_changes"))
    },
    tvf("graft_fact_at_time",
      "graft_fact_at_time(store_dir, ts_ms) — TIMESTAMP AS OF time travel over the versioned lake", 2) { args =>
      graft.sources.FactStore.readAsOf(SparkSession.active,
        strArg(args, 0, "graft_fact_at_time"),
        longArg(args, 1, "graft_fact_at_time"))
    },
    tvf("graft_fact_at",
      "graft_fact_at(store_dir, version) — q140 raw-lake snapshot read (-1 = latest)", 2) { args =>
      graft.sources.FactStore.read(SparkSession.active,
        strArg(args, 0, "graft_fact_at"), longArg(args, 1, "graft_fact_at"))
    }) :+ factBoxTvf :+ factPointTvf

  /** `graft_fact_box(store_dir, col, lo, hi [, col2, lo2, hi2 …])` —
    * the q140d pruned box read from SQL: variadic (column, lo, hi)
    * triples after the store path; the manifest prunes files before
    * any data I/O, the residual pushes into the survivors, tombstones
    * still apply. The one TVF that can't use the fixed-arity helper. */
  /** `graft_fact_point(store_dir, key1 [, key2 …])` — the q140h
    * Bloom-pruned primary-key probe from SQL: variadic key list after
    * the store path. */
  private def factPointTvf: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) =
    (new FunctionIdentifier("graft_fact_point"),
      new ExpressionInfo("graft.functions.TableFunctions", "graft_fact_point",
        "graft_fact_point(store_dir, key, ...) — Bloom-pruned point lookup over the versioned lake"),
      (args: Seq[Expression]) => {
        require(args.length >= 2,
          "graft_fact_point takes a store path plus at least one key")
        val dir = strArg(args, 0, "graft_fact_point")
        val keys = (1 until args.length).map(longArg(args, _, "graft_fact_point"))
        graft.sources.FactStore.readPoint(SparkSession.active, dir, keys)
          .queryExecution.logical
      })

  private def factBoxTvf: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) =
    (new FunctionIdentifier("graft_fact_box"),
      new ExpressionInfo("graft.functions.TableFunctions", "graft_fact_box",
        "graft_fact_box(store_dir, col, lo, hi, ...) — pruned box read over the versioned lake"),
      (args: Seq[Expression]) => {
        require(args.length >= 4 && (args.length - 1) % 3 == 0,
          "graft_fact_box takes a store path plus (column, lo, hi) triples")
        val dir = strArg(args, 0, "graft_fact_box")
        val bounds = (1 until args.length by 3).map { i =>
          strArg(args, i, "graft_fact_box") ->
            (longArg(args, i + 1, "graft_fact_box"),
              longArg(args, i + 2, "graft_fact_box"))
        }.toMap
        graft.sources.FactStore.readBox(SparkSession.active, dir, bounds)
          .queryExecution.logical
      })
}
