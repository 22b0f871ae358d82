package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, TimestampType}

/** Optimizer rule: make the engine's central predicate family sargable.
  *
  * Every reference query filters on `CAST(ts AS DATE) <cmp> date`
  * (ballcone/dao.py:354-369). Spark pushes no parquet filter for a
  * casted column, so at 100 TB a 7-day report would scan every
  * row-group. This rule rewrites, under a UTC session zone:
  *
  *   to_date(ts) >= d   →  ts >= d::timestamp
  *   to_date(ts) <= d   →  ts <  (d+1)::timestamp
  *   to_date(ts) >  d   →  ts >= (d+1)::timestamp
  *   to_date(ts) <  d   →  ts <  d::timestamp
  *   to_date(ts) =  d   →  ts >= d AND ts < d+1
  *
  * after which the raw `ts` comparisons reach the parquet scan as
  * PushedFilters and min/max row-group stats prune. (Spark's own
  * UnwrapCastInBinaryComparison handles numeric casts, not the
  * timestamp→date truncation family — SURVEY §4.4.1.)
  */
object SargableDates extends Rule[LogicalPlan] {

  private val MicrosPerDay = 86400L * 1000000L

  private def isUtc(tz: Option[String]): Boolean =
    tz.exists(z => z == "UTC" || z == "Etc/UTC" || z == "Z" || z == "GMT")

  /** Matches Cast(ts: timestamp, date) under a UTC zone. */
  private object DayCast {
    def unapply(e: Expression): Option[Expression] = e match {
      // timestamp→date truncation can never fail, so eval mode is moot
      case Cast(child, DateType, tz, _)
          if child.dataType == TimestampType && isUtc(tz) =>
        Some(child)
      case _ => None
    }
  }

  private def tsLit(days: Int): Literal =
    Literal(days.toLong * MicrosPerDay, TimestampType)

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // literal on the right
    case GreaterThanOrEqual(DayCast(ts), Literal(d: Int, DateType)) =>
      GreaterThanOrEqual(ts, tsLit(d))
    case GreaterThan(DayCast(ts), Literal(d: Int, DateType)) =>
      GreaterThanOrEqual(ts, tsLit(d + 1))
    case LessThanOrEqual(DayCast(ts), Literal(d: Int, DateType)) =>
      LessThan(ts, tsLit(d + 1))
    case LessThan(DayCast(ts), Literal(d: Int, DateType)) =>
      LessThan(ts, tsLit(d))
    case EqualTo(DayCast(ts), Literal(d: Int, DateType)) =>
      And(GreaterThanOrEqual(ts, tsLit(d)), LessThan(ts, tsLit(d + 1)))
    // literal on the left
    case GreaterThanOrEqual(Literal(d: Int, DateType), DayCast(ts)) =>
      LessThan(ts, tsLit(d + 1))
    case GreaterThan(Literal(d: Int, DateType), DayCast(ts)) =>
      LessThan(ts, tsLit(d))
    case LessThanOrEqual(Literal(d: Int, DateType), DayCast(ts)) =>
      GreaterThanOrEqual(ts, tsLit(d))
    case LessThan(Literal(d: Int, DateType), DayCast(ts)) =>
      GreaterThanOrEqual(ts, tsLit(d + 1))
    case EqualTo(Literal(d: Int, DateType), DayCast(ts)) =>
      And(GreaterThanOrEqual(ts, tsLit(d)), LessThan(ts, tsLit(d + 1)))
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => SargableDates)
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      graft.functions.DotProductExpr.info,
      (children: Seq[Expression]) =>
        graft.functions.DotProductExpr(children(0), children(1))))
  }
}
