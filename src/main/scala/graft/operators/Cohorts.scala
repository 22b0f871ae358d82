package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral analytics beyond the reference's fixed report family:
  * retention cohorts and conversion funnels — the two queries every
  * product-analytics consumer of an events store runs next.
  */
object Cohorts {

  /** Retention triangle: users grouped by first-seen day (cohort),
    * counted distinct on each subsequent activity day offset.
    *
    * Scale shape: one groupBy(user) for first-seen (map-side partials
    * collapse each user's events), one equi-join back on user_id, one
    * grouped distinct count — three shuffles total, all on keys whose
    * cardinality is users/days, never events².
    */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firstSeen = events
      .groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort"))
    events
      .join(firstSeen, userCol)
      .groupBy(col("cohort"),
        datediff(to_date(col(tsCol)), col("cohort")).cast("long")
          .as("day_offset"))
      .agg(countDistinct(col(userCol)).as("active"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  /** Top navigation transitions: the (from → to) event-type bigram
    * counts over each user's time-ordered stream — the first-order
    * Markov view ("where do users go next") a paths report draws.
    * `tieCol` breaks equal timestamps deterministically.
    *
    * Scale shape: ONE per-user window (lead) — partitions are
    * user-bounded, no global sort — then a bigram count whose key
    * space is |event types|², tiny by construction, and a distributed
    * top-k (TakeOrderedAndProject). Nothing event² anywhere.
    */
  def topTransitions(events: DataFrame, userCol: String, tsCol: String,
                     typeCol: String, tieCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn("to_step", lead(col(typeCol), 1).over(w))
      .filter(col("to_step").isNotNull)
      .groupBy(col(typeCol).as("from_step"), col("to_step"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("from_step"), col("to_step"))
      .limit(k)
  }

  /** Two-step conversion funnel: users whose earliest `stepA` event
    * strictly precedes their earliest `stepB` event, per cohort day of
    * the A step. Min-per-user aggregates + one join — no event-level
    * self-join.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stepA: String, stepB: String): DataFrame = {
    val a = events.filter(col(typeCol) === stepA)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t_a"))
    val b = events.filter(col(typeCol) === stepB)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t_b"))
    a.join(b, Seq(userCol), "left_outer")
      .groupBy(to_date(col("t_a")).as("d"))
      .agg(count(lit(1)).as("entered"),
        count(when(col("t_b") > col("t_a"), 1)).as("converted"))
      .orderBy(col("d"))
  }
}
