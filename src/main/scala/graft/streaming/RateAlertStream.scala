package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming rate-anomaly alerts — the batch
  * [[graft.operators.Reports.anomalyDays]] signal computed AT INGEST:
  * per service, events bucket into fixed event-time windows, and every
  * closed bucket emits a row comparing its count to the trailing
  * `trail` closed buckets, flagged when the smoothed ratio
  * (cnt+1)/(mean+1) leaves [1/factor, factor]. Spikes AND silent drops
  * alert: buckets with no events still close (count 0) once the
  * watermark passes them, because "traffic stopped" is exactly the
  * page an on-call wants.
  *
  * State per service is O(trail + open buckets): the ring of recent
  * closed counts plus the currently-open bucket counts — never events.
  * Buckets close only when the event-time watermark passes their end
  * (late events within the watermark still land in their bucket), and
  * a watermark jump synthesizes at most `trail * 4` missed zero
  * buckets so an idle service resuming after a week does not replay
  * thousands of empty alerts. Events shuffle once on the service key.
  */
object RateAlertStream {

  final case class Hit(service: String, ts: Timestamp)

  /** lastClosed = start (epoch s) of the newest closed bucket, or
    * Long.MinValue before any close; trail = recent closed counts,
    * oldest first; open = bucket start (epoch s) → count.
    */
  final case class RateState(lastClosed: Long, trail: Seq[Long],
                             open: Map[Long, Long])

  final case class Alert(service: String, bucket_start: Timestamp, cnt: Long,
                         n_trail: Int, trail_avg: Double, ratio: Double,
                         is_anomaly: Boolean)

  def stateFn(bucketSeconds: Long, trail: Int, factor: Double)(
      service: String, hits: Iterator[Hit],
      state: GroupState[RateState]): Iterator[Alert] = {
    var st = state.getOption.getOrElse(
      RateState(Long.MinValue, Vector.empty, Map.empty))
    // fold new events into their open buckets
    hits.foreach { h =>
      val sec = h.ts.getTime / 1000L
      val b = sec - java.lang.Math.floorMod(sec, bucketSeconds)
      st = st.copy(open = st.open + (b -> (st.open.getOrElse(b, 0L) + 1L)))
    }
    val wmSec = state.getCurrentWatermarkMs() / 1000L
    // everything strictly before this bucket start is closable
    val wmBucket = wmSec - java.lang.Math.floorMod(wmSec, bucketSeconds)
    val out = Seq.newBuilder[Alert]
    def close(b: Long): Unit = {
      val cnt = st.open.getOrElse(b, 0L)
      val tr = st.trail
      val avg = if (tr.isEmpty) 0.0 else tr.sum.toDouble / tr.size
      val ratio = (cnt + 1.0) / (avg + 1.0)
      val flag = tr.size >= trail && (ratio > factor || ratio < 1.0 / factor)
      out += Alert(service, new Timestamp(b * 1000L), cnt, tr.size, avg,
        ratio, flag)
      st = st.copy(lastClosed = b,
        trail = (tr :+ cnt).takeRight(trail),
        open = st.open - b)
    }
    if (st.lastClosed == Long.MinValue) {
      // never closed anything: close only buckets that saw events
      st.open.keys.toSeq.sorted.filter(_ + bucketSeconds <= wmSec)
        .foreach(close)
    } else {
      // close every bucket (incl. empty ones) up to the watermark,
      // capping a long idle gap at trail*4 synthesized zero buckets
      val floor = math.max(st.lastClosed + bucketSeconds,
        wmBucket - bucketSeconds * (trail.toLong * 4))
      // a watermark jump can strand REAL-event buckets below the
      // synthesized-zero floor: close them first (oldest first) or
      // their alerts are never emitted, the entries leak in st.open
      // forever, and nextClose keeps pointing at the orphan firing a
      // no-op timeout every trigger. Only the gap's EMPTY buckets are
      // skipped by the cap — never ones that saw traffic.
      st.open.keys.filter(_ < floor).toSeq.sorted.foreach(close)
      var b = floor
      while (b + bucketSeconds <= wmSec) { close(b); b += bucketSeconds }
    }
    state.update(st)
    // wake when the watermark can close the next bucket
    val nextClose = (st.open.keys.toSeq.sorted.headOption
      .getOrElse(if (st.lastClosed == Long.MinValue) wmBucket
                 else st.lastClosed + bucketSeconds) + bucketSeconds) * 1000L
    state.setTimeoutTimestamp(math.max(nextClose,
      state.getCurrentWatermarkMs() + 1000L))
    out.result().iterator
  }

  /** hits (with an event-time watermark already applied upstream) →
    * append-mode stream of closed-bucket rate rows with alert flags.
    */
  def alerts(hits: Dataset[Hit], bucketSeconds: Long, trail: Int,
             factor: Double): Dataset[Alert] = {
    implicit val alertEnc = Encoders.product[Alert]
    implicit val stateEnc = Encoders.product[RateState]
    implicit val strEnc = Encoders.STRING
    hits
      .groupByKey(_.service)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        stateFn(bucketSeconds, trail, factor))
  }
}
