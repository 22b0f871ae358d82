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

  /** N-step funnel — [[funnel]] generalized to an ordered step chain
    * (same earliest-occurrence semantics: a user reaches step i when
    * their first step-i event is strictly after their first step-i−1
    * event, chained). ONE conditional-min aggregate computes every
    * per-user step time in a single corpus pass — no per-step scans,
    * no event-level self-joins — then a per-cohort-day count of how
    * deep each user's chain reaches.
    *
    * Output: (d = day of first step-1 event, step_1 … step_N counts).
    */
  def funnelSteps(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "need at least two steps")
    val mins = steps.zipWithIndex.map { case (s, i) =>
      min(when(col(typeCol) === s, col(tsCol))).as(s"t${i + 1}")
    }
    val perUser = events.groupBy(col(userCol)).agg(mins.head, mins.tail: _*)
    // reached_i = every consecutive pair up to i is strictly ordered
    val reached = (2 to steps.size).map { i =>
      (2 to i).map(j => col(s"t$j") > col(s"t${j - 1}"))
        .reduce(_ && _)
    }
    perUser.filter(col("t1").isNotNull)
      .groupBy(to_date(col("t1")).as("d"))
      .agg(count(lit(1)).as("step_1"),
        reached.zipWithIndex.map { case (c, i) =>
          count(when(c, 1)).as(s"step_${i + 2}")
        }: _*)
      .orderBy(col("d"))
  }

  /** Per-day session quality stats over [[Temporal.sessionize]]'s
    * output: session count, events per session, mean duration, bounce
    * rate — the GA-style rollup. All ratios divide exact integer sums
    * as doubles AFTER aggregation, so the numbers are bit-deterministic
    * under any partitioning.
    */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   idCol: String, gapSeconds: Long): DataFrame = {
    val sess = Temporal.sessionize(events, userCol, tsCol, idCol, gapSeconds)
    sess
      .groupBy(to_date(col("sess_start")).as("d"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("total_events"),
        sum(unix_micros(col("sess_end")) - unix_micros(col("sess_start")))
          .as("total_dur_us"),
        count(when(col("n_events") === 1, 1)).as("bounces"))
      .select(col("d"), col("n_sessions"),
        (col("total_events").cast("double") / col("n_sessions").cast("double"))
          .as("events_per_session"),
        (col("total_dur_us").cast("double") / lit(1000000.0) /
          col("n_sessions").cast("double")).as("avg_duration_sec"),
        (col("bounces").cast("double") / col("n_sessions").cast("double"))
          .as("bounce_rate"))
      .orderBy(col("d"))
  }

  /** Time-constrained funnel: per cohort day, users who entered at
    * their first `stepA`, converted EVER (first later `stepB`), and
    * converted WITHIN `windowSeconds` of entering — the
    * attribution-window variant every funnel consumer asks for next
    * (a purchase three weeks after the view is a different product
    * question than one within the hour). Gap arithmetic in
    * microseconds, the [[graft.operators.Temporal]] discipline.
    *
    * Scale shape: one user-keyed min for entries, one user-keyed join
    * against stepB events (per-user fanout only), a user-level
    * conditional min, and a day rollup — every shuffle on user or
    * day, nothing events².
    */
  def funnelWindowed(events: DataFrame, userCol: String, tsCol: String,
                     typeCol: String, stepA: String, stepB: String,
                     windowSeconds: Long): DataFrame = {
    val a = events.filter(col(typeCol) === stepA)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t_a"))
    val b = events.filter(col(typeCol) === stepB)
      .select(col(userCol), col(tsCol).as("t_b"))
    a.join(b, Seq(userCol), "left")
      .groupBy(col(userCol), col("t_a"))
      .agg(min(when(col("t_b") > col("t_a"), col("t_b"))).as("t_conv"))
      .groupBy(to_date(col("t_a")).as("d"))
      .agg(count(lit(1)).as("entered"),
        count(when(col("t_conv").isNotNull, 1)).as("converted_ever"),
        count(when(col("t_conv").isNotNull &&
            unix_micros(col("t_conv")) - unix_micros(col("t_a")) <=
              windowSeconds * 1000000L, 1)).as("converted_in_window"))
      .orderBy(col("d"))
  }
}
