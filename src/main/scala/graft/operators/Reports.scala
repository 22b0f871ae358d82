package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The fixed report-query family of the reference engine, re-expressed as
  * declarative DataFrame pipelines (reference: ballcone/dao.py:236-342,
  * ballcone/web_ballcone.py:27-94).
  *
  * Everything here is built-in Catalyst surface: hash aggregates get
  * partial/final phases (map-side combine) for free, `orderBy.limit`
  * plans as TakeOrderedAndProject (a true distributed top-k), and the
  * single window function partitions by day — at 100 TB the daily
  * partition count stays small and bounded, so WindowExec's per-partition
  * sort is cheap. No custom physical operators are needed for parity.
  */
object Reports {

  /** The central expression: every aggregate keys on the event day
    * (reference: `CAST(datetime AS DATE)`, ballcone/dao.py:255,280,307).
    */
  def day(ts: Column): Column = to_date(ts)

  /** O8 — raw select with inclusive date filter, sort, limit
    * (ballcone/dao.py:236-249). `tieBreak` columns make the limit
    * deterministic under timestamp ties (the reference leaves those
    * unspecified).
    */
  def selectRange(df: DataFrame, tsCol: String, start: Option[String],
                  stop: Option[String], limit: Int,
                  tieBreak: Seq[String] = Nil): DataFrame = {
    val sortCols = (tsCol +: tieBreak).map(col)
    df.filter(DateRange.pred(col(tsCol), start, stop))
      .orderBy(sortCols: _*)
      .limit(limit)
  }

  /** O10 — per-day AVG/SUM/COUNT of one field (ballcone/dao.py:251-275). */
  def dailyAverage(df: DataFrame, tsCol: String, field: String,
                   start: Option[String] = None,
                   stop: Option[String] = None): DataFrame =
    df.filter(DateRange.pred(col(tsCol), start, stop))
      .groupBy(day(col(tsCol)).as("d"))
      .agg(avg(col(field)).as(s"avg_$field"),
           sum(col(field)).as(s"sum_$field"),
           count(col(field)).as(s"cnt_$field"))
      .orderBy("d")

  /** O11 — per-day COUNT(*) ("visits") or COUNT(DISTINCT field)
    * ("unique") (ballcone/dao.py:277-301). Exact distinct, as the
    * reference requires; `approx_count_distinct` is the documented
    * relaxation at scale.
    */
  def dailyCount(df: DataFrame, tsCol: String,
                 distinctField: Option[String] = None,
                 start: Option[String] = None,
                 stop: Option[String] = None): DataFrame = {
    val cnt = distinctField.map(f => count_distinct(col(f)))
      .getOrElse(count(lit(1)))
    df.filter(DateRange.pred(col(tsCol), start, stop))
      .groupBy(day(col(tsCol)).as("d"))
      .agg(cnt.as("cnt"))
      .orderBy("d")
  }

  /** O12 — per-(day, group) COUNT[(DISTINCT)] with the reference's exact
    * ordering `(day, count asc|desc, group)` (ballcone/dao.py:303-321).
    */
  def dailyGroupCount(df: DataFrame, tsCol: String, field: String,
                      group: String, distinct: Boolean, ascending: Boolean,
                      start: Option[String] = None,
                      stop: Option[String] = None): DataFrame = {
    val cnt = if (distinct) count_distinct(col(field)) else count(col(field))
    val dir = if (ascending) col("cnt").asc else col("cnt").desc
    df.filter(DateRange.pred(col(tsCol), start, stop))
      .groupBy(day(col(tsCol)).as("d"), col(group).as("grp"))
      .agg(cnt.as("cnt"))
      .orderBy(col("d"), dir, col("grp"))
  }

  /** O13 — top-N groups per day: O12 wrapped in
    * `ROW_NUMBER() OVER (PARTITION BY d ORDER BY cnt [ASC|DESC], grp)`
    * (ballcone/dao.py:323-330). The `grp` tiebreaker makes row_number
    * deterministic under count ties, exactly like the reference.
    */
  def topNPerDay(df: DataFrame, tsCol: String, field: String, group: String,
                 distinct: Boolean, ascending: Boolean, n: Int,
                 start: Option[String] = None,
                 stop: Option[String] = None): DataFrame = {
    val grouped =
      dailyGroupCount(df, tsCol, field, group, distinct, ascending, start, stop)
    val dir = if (ascending) col("cnt").asc else col("cnt").desc
    val w = Window.partitionBy(col("d")).orderBy(dir, col("grp"))
    grouped
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .drop("rn")
      .orderBy(col("d"), dir, col("grp"))
  }

  /** O17 — align the "visits" and "unique" daily series on day
    * (ballcone/web_ballcone.py:66-73). Spark coalesces the using-column
    * on a full-outer join, matching the reference's insertion-ordered
    * dict merge.
    */
  def alignByDate(visits: DataFrame, unique: DataFrame): DataFrame =
    // full-outer joins cannot broadcast in Spark; the sort-merge here
    // is over two day-keyed aggregate series (≤ the day count rows
    // even at 100 TB), so the shuffle is bounded and tiny
    visits.withColumnRenamed("cnt", "visits")
      .join(unique.withColumnRenamed("cnt", "uniq"), Seq("d"), "full_outer")
      .orderBy("d")

  /** O18 — dashboard: one day's COUNT(DISTINCT field) per service, sorted
    * by (-count, service) (ballcone/web_ballcone.py:27-36). The reference
    * loops one query per service table; with a service column this is a
    * single grouped aggregate — one shuffle instead of N queries.
    */
  /** Traffic-anomaly days: each day's visit count against its trailing
    * `trail`-day mean, flagged when the ratio leaves [1/factor, factor]
    * — the spike/drop alarm a monitoring dashboard derives from the
    * O11 daily series. The deliberately ratio-based form (no stddev)
    * keeps every derived column EXACT rational arithmetic over integer
    * counts, so the flag can never flip between engines on a last-ulp
    * variance difference.
    *
    * Scale shape: one daily aggregate (partial+final), then a window
    * over the day series — which is one row per day, thousands of rows
    * at any corpus size; the window cost is nil and the series fits
    * one partition by construction.
    */
  def anomalyDays(df: DataFrame, tsCol: String, trail: Int = 7,
                  factor: Double = 1.5): DataFrame = {
    val w = Window.orderBy(col("d")).rowsBetween(-trail, -1)
    dailyCount(df, tsCol)
      .withColumn("trail_avg", avg(col("cnt")).over(w))
      .withColumn("n_trail", count(col("cnt")).over(w))
      .filter(col("n_trail") === trail)
      .withColumn("ratio", col("cnt") / col("trail_avg"))
      .select(col("d"), col("cnt"), col("trail_avg"), col("ratio"),
        (col("ratio") > factor || col("ratio") < 1.0 / factor)
          .as("is_anomaly"))
  }

  /** Exponentially-weighted moving average of the daily visit series
    * (pandas `ewm(adjust=True)` semantics): the smoothed trend line a
    * dashboard overlays on raw counts. With `alpha = 0.5` every weight
    * is a power of two, so the running weighted sum stays EXACT integer
    * arithmetic in doubles (counts ≤ 2^23 over ≤ 30 days stay under
    * 2^53) and both engines agree bit-for-bit.
    *
    * ewma_n = Σ_{i≤n} r^{n-i}·x_i / Σ_{j<n} r^j with r = 1−α, computed
    * as a single ordered running sum of x_i·r^{−i} (rescaled by r^n),
    * never a per-row re-scan. Same one-row-per-day window-cost argument
    * as [[anomalyDays]].
    */
  def ewmaDaily(df: DataFrame, tsCol: String): DataFrame = {
    val run = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rn = Window.orderBy(col("d"))
    dailyCount(df, tsCol)
      .withColumn("i", row_number().over(rn))
      .withColumn("s", sum(col("cnt") * pow(lit(2.0), col("i"))).over(run))
      .select(col("d"), col("cnt"),
        (col("s") * pow(lit(2.0), -col("i")) * lit(0.5) /
          (lit(1.0) - pow(lit(2.0), -col("i")))).as("ewma"))
  }

  def dashboard(df: DataFrame, tsCol: String, serviceCol: String,
                field: String, dayStr: String): DataFrame =
    df.filter(DateRange.pred(col(tsCol), Some(dayStr), Some(dayStr)))
      .groupBy(col(serviceCol).as("service"))
      .agg(count_distinct(col(field)).as("cnt"))
      .orderBy(col("cnt").desc, col("service"))
}
