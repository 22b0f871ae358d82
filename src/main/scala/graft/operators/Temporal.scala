package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators Spark lacks as primitives, composed from
  * built-ins per the preference ladder (SURVEY §7.3: compose before
  * custom plans): as-of join, range join, sessionization.
  */
object Temporal {

  /** AS-OF join: for each left row, the latest right timestamp with
    * `rts <= lts` within the same key — composed as ONE union + ONE
    * window (a running max over the interleaved stream), instead of a
    * non-equi join that would explode into a per-key cross product.
    * Equal timestamps match (ASOF `>=` semantics): right rows sort
    * before left rows at the same instant.
    *
    * Scale shape: one shuffle on the key, one per-partition sort — the
    * same cost as a groupBy; no range-join quadratic blowup.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               idCol: String): DataFrame =
    asOfJoinDir(left, right, key, ts, idCol, forward = false, None)

  /** AS-OF with direction and tolerance (the pandas `merge_asof`
    * surface): `forward = true` matches the EARLIEST right timestamp
    * with `rts >= lts` (same single union + window, ordered
    * descending, running min); `toleranceSeconds` drops matches
    * farther than the bound — correctly equivalent to filtering after
    * the nearest-match join, because if the nearest right row violates
    * the tolerance no farther one can satisfy it.
    */
  def asOfJoinDir(left: DataFrame, right: DataFrame, key: String, ts: String,
                  idCol: String, forward: Boolean,
                  toleranceSeconds: Option[Long]): DataFrame = {
    val tagged =
      right.select(col(key), col(ts), lit(0).as("__kind"),
          lit(null).cast("long").as(idCol))
        .unionByName(
          left.select(col(key), col(ts), lit(1).as("__kind"), col(idCol)))
    val ordering =
      if (forward) Seq(col(ts).desc, col("__kind").asc, col(idCol).desc)
      else Seq(col(ts).asc, col("__kind").asc, col(idCol).asc)
    val w = Window.partitionBy(col(key))
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val asof =
      if (forward) min(when(col("__kind") === 0, col(ts))).over(w)
      else max(when(col("__kind") === 0, col(ts))).over(w)
    val matched = tagged
      .withColumn("__asof", asof)
      .filter(col("__kind") === 1 && col("__asof").isNotNull)
    val bounded = toleranceSeconds match {
      case Some(tol) =>
        val gap =
          if (forward) unix_micros(col("__asof")) - unix_micros(col(ts))
          else unix_micros(col(ts)) - unix_micros(col("__asof"))
        matched.filter(gap <= tol * 1000000L)
      case None => matched
    }
    bounded.select(col(idCol), col(key), col(ts), col("__asof").as(s"asof_$ts"))
  }

  /** NEAREST as-of (the pandas `merge_asof(direction="nearest")`
    * surface): for each left row, the right timestamp with the
    * smallest absolute gap — backward wins ties, matching pandas.
    * Composed from the backward and forward [[asOfJoinDir]] passes
    * full-outer-joined on the left id, so a row matched in only one
    * direction still appears; rows matched in neither direction drop
    * (the inner semantics of the other as-of variants here).
    *
    * Scale: two as-of window passes (each one shuffle on the key) and
    * one id-keyed join of left-sized results — no new quadratic term.
    */
  def asOfNearest(left: DataFrame, right: DataFrame, key: String,
                  ts: String, idCol: String): DataFrame = {
    val b = asOfJoinDir(left, right, key, ts, idCol, forward = false, None)
      .select(col(idCol), col(key).as("__kb"), col(ts).as("__tb"),
        col(s"asof_$ts").as("b_ts"))
    val f = asOfJoinDir(left, right, key, ts, idCol, forward = true, None)
      .select(col(idCol), col(key).as("__kf"), col(ts).as("__tf"),
        col(s"asof_$ts").as("f_ts"))
    b.join(f, Seq(idCol), "full_outer")
      .select(col(idCol),
        coalesce(col("__kb"), col("__kf")).as(key),
        coalesce(col("__tb"), col("__tf")).as(ts),
        when(col("b_ts").isNull, col("f_ts"))
          .when(col("f_ts").isNull, col("b_ts"))
          .when(unix_micros(coalesce(col("__tb"), col("__tf"))) -
              unix_micros(col("b_ts")) <=
            unix_micros(col("f_ts")) -
              unix_micros(coalesce(col("__tb"), col("__tf"))),
            col("b_ts"))
          .otherwise(col("f_ts")).as(s"nearest_$ts"))
  }

  /** Range join: classify facts into [lo, hi) bands from a small
    * broadcast dimension — a BroadcastNestedLoopJoin where the inner
    * side is tiny by construction, so the fact table streams through
    * map-side without a shuffle.
    */
  def rangeJoin(facts: DataFrame, bands: DataFrame,
                value: Column): DataFrame =
    facts.join(broadcast(bands),
      value >= col("lo") && value < col("hi"), "inner")

  /** Sessionization (gaps-and-islands): a new session starts when the
    * gap to the previous event of the same user exceeds `gapSeconds`;
    * session ids are per-user ordinals. One shuffle on the user key,
    * two window passes.
    */
  def sessionize(events: DataFrame, key: String, ts: String,
                 idCol: String, gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(col(key)).orderBy(col(ts), col(idCol))
    val running = Window.partitionBy(col(key))
      .orderBy(col(ts), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev", lag(col(ts), 1).over(order))
      .withColumn("__new",
        // microsecond arithmetic (unix_timestamp would truncate to
        // seconds and disagree with the oracle's epoch_us)
        when(col("__prev").isNull ||
          unix_micros(col(ts)) - unix_micros(col("__prev")) > gapSeconds * 1000000L,
          1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(running))
      .groupBy(col(key), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
           min(col(ts)).as("sess_start"), max(col(ts)).as("sess_end"))
      .orderBy(col(key), col("session_id"))
  }

  /** Inter-arrival gap distribution: per-key lag deltas (microsecond
    * arithmetic, same discipline as [[sessionize]]) bucketed into a
    * log₂ histogram of gap seconds — the traffic-shape audit behind
    * session-gap threshold choices (the knee in this histogram IS the
    * right `gapSeconds`). Bucket = floor(log₂(gap_s + 1)) computed by
    * BIGINT bit-length, not floating log, so both engines agree on
    * every boundary exactly.
    *
    * Scale shape: one per-key window (partitioned, never global), one
    * hash aggregate over ≤ 64 buckets per key-universe — output is
    * O(buckets), corpus-independent.
    */
  def interArrival(events: DataFrame, key: String, ts: String,
                   idCol: String): DataFrame = {
    val order = Window.partitionBy(col(key)).orderBy(col(ts), col(idCol))
    // Spark long/long is DOUBLE division: cast back to long (truncate
    // == floor for the non-negative ordered-ts deltas), matching the
    // oracle's `//`
    val gapS = ((unix_micros(col(ts)) -
      unix_micros(lag(col(ts), 1).over(order))) / lit(1000000L))
      .cast("long")
    // floor(log2(n+1)) via the bit length of (gap_s + 1): BIGINT-exact
    // (Spark conv(x,10,2) and DuckDB bin(x) both render without
    // leading zeros, so string length IS the bit length)
    val bucket = expr("length(conv(gap_s + 1, 10, 2))") - lit(1L)
    events
      .withColumn("gap_s", gapS)
      .filter(col("gap_s").isNotNull)
      .withColumn("bucket", bucket.cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap_s")).as("min_gap_s"), max(col("gap_s")).as("max_gap_s"))
  }
}
