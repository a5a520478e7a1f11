package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: derive partition-pruning predicates for the
  * time-bucketed event-log layout ([[graft.sources.EventLogStore]]).
  *
  * The layout invariant is `t_bucket = ts_us div B` (non-negative
  * times). Catalyst cannot see through that derivation, so a query
  * filtering only on `ts_us` scans every partition — the delta scan
  * degrades from O(delta) to O(log), which at 100 TB is the whole
  * ballgame. This rule closes the gap: for any Filter over a relation
  * exposing both columns, each `ts_us` range conjunct with a literal
  * bound contributes the implied `t_bucket` bound, which the planner's
  * partition pruning then consumes (it lands in the scan's
  * PartitionFilters).
  *
  * Soundness: the added conjuncts are implied by the originals under
  * the layout invariant, so rows satisfying the original filter always
  * satisfy the derived ones — results are unchanged, only I/O shrinks.
  * The invariant itself is layout metadata Spark has no place for, so
  * it is declared via session conf ([[BucketRangeInference.BucketConf]]
  * = the bucket width B in microseconds); the rule is inert unless the
  * conf is set, and skips filters that already constrain `t_bucket`
  * (also what makes the rule idempotent under fixpoint iteration).
  */
class BucketRangeInference(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  import BucketRangeInference._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val b = session.conf.getOption(BucketConf).map(_.toLong).getOrElse(0L)
    if (b <= 0) plan
    else plan.transform {
      case f @ Filter(cond, child) =>
        val ts = child.output.find(a => a.name == TimeCol && a.dataType == LongType)
        val tb = child.output.find(a => a.name == BucketCol &&
          (a.dataType == LongType || a.dataType == IntegerType))
        (ts, tb) match {
          case (Some(tsAttr), Some(tbAttr)) =>
            val conjuncts = splitConjunctivePredicates(cond)
            if (conjuncts.exists(_.references.contains(tbAttr))) f
            else {
              val derived = conjuncts.flatMap(derive(_, tsAttr, tbAttr, b))
              if (derived.isEmpty) f
              else Filter(And(derived.reduce(And), cond), child)
            }
          case _ => f
        }
    }
  }

  /** Map one `ts_us`-vs-literal conjunct to the implied `t_bucket`
    * bound. Bounds are kept in the non-negative domain where Long
    * division is floor division (times before epoch would need floorDiv
    * care; the log's domain is epoch-us, always positive).
    */
  private def derive(
      p: Expression, ts: Attribute, tb: Attribute, b: Long): Option[Expression] = {
    def lit(v: Long): Literal =
      if (tb.dataType == LongType) Literal(v) else Literal(v.toInt)
    p match {
      case GreaterThan(a: Attribute, Literal(v: Long, LongType)) if a.semanticEquals(ts) && v >= -1 =>
        Some(GreaterThanOrEqual(tb, lit((v + 1) / b)))
      case GreaterThanOrEqual(a: Attribute, Literal(v: Long, LongType)) if a.semanticEquals(ts) && v >= 0 =>
        Some(GreaterThanOrEqual(tb, lit(v / b)))
      case LessThan(a: Attribute, Literal(v: Long, LongType)) if a.semanticEquals(ts) && v >= 1 =>
        Some(LessThanOrEqual(tb, lit((v - 1) / b)))
      case LessThanOrEqual(a: Attribute, Literal(v: Long, LongType)) if a.semanticEquals(ts) && v >= 0 =>
        Some(LessThanOrEqual(tb, lit(v / b)))
      case EqualTo(a: Attribute, Literal(v: Long, LongType)) if a.semanticEquals(ts) && v >= 0 =>
        Some(EqualTo(tb, lit(v / b)))
      // Mirrored literal-first forms.
      case LessThan(Literal(v: Long, LongType), a: Attribute) if a.semanticEquals(ts) && v >= -1 =>
        Some(GreaterThanOrEqual(tb, lit((v + 1) / b)))
      case LessThanOrEqual(Literal(v: Long, LongType), a: Attribute) if a.semanticEquals(ts) && v >= 0 =>
        Some(GreaterThanOrEqual(tb, lit(v / b)))
      case GreaterThan(Literal(v: Long, LongType), a: Attribute) if a.semanticEquals(ts) && v >= 1 =>
        Some(LessThanOrEqual(tb, lit((v - 1) / b)))
      case GreaterThanOrEqual(Literal(v: Long, LongType), a: Attribute) if a.semanticEquals(ts) && v >= 0 =>
        Some(LessThanOrEqual(tb, lit(v / b)))
      case EqualTo(Literal(v: Long, LongType), a: Attribute) if a.semanticEquals(ts) && v >= 0 =>
        Some(EqualTo(tb, lit(v / b)))
      case _ => None
    }
  }
}

object BucketRangeInference {
  /** Session conf declaring the layout's bucket width in microseconds;
    * unset/0 disables the rule. */
  val BucketConf = "spark.graft.eventlog.bucketUs"
  val TimeCol = "ts_us"
  val BucketCol = "t_bucket"
}
