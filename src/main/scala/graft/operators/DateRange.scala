package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** O9 — date-range predicate builder.
  *
  * Reference semantics (ballcone/dao.py:354-369): every predicate is over
  * `CAST(ts AS DATE)`; boundaries are inclusive; `start == stop` collapses
  * to an equality test. Session timezone is pinned to UTC so `to_date` is
  * timezone-free, mirroring the reference's UTC normalization at ingest
  * (ballcone/syslog_protocol.py:67).
  *
  * Scale note: `to_date(ts) >= d` defeats parquet min/max row-group pruning
  * because the cast wraps the column. [[graft.plans.SargableDates]] rewrites
  * these predicates to raw-timestamp ranges so pushdown fires; operators
  * here stay declarative.
  */
object DateRange {
  private def d(s: String): Column = lit(s).cast("date")

  def pred(ts: Column, start: Option[String], stop: Option[String]): Column =
    (start, stop) match {
      case (Some(a), Some(b)) if a == b => to_date(ts) === d(a)
      case (Some(a), Some(b))           => to_date(ts).between(d(a), d(b))
      case (Some(a), None)              => to_date(ts) >= d(a)
      case (None, Some(b))              => to_date(ts) <= d(b)
      case (None, None)                 => lit(true)
    }
}
