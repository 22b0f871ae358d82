package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with CUSTOM state — the
  * `flatMapGroupsWithState` tier of SURVEY §2.10: the same
  * gaps-and-islands semantics as the batch [[graft.operators.Temporal.sessionize]]
  * (a session closes when the gap to the next event of the same user
  * exceeds `gapSeconds`), computed incrementally so a 100 TB/day event
  * stream emits finished sessions minutes after they close instead of
  * at end-of-day batch.
  *
  * State per user is O(1) — (start, end, count) of the OPEN session
  * only, never the events — and is dropped via event-time timeout as
  * soon as the watermark passes `end + gap`, so state size tracks
  * concurrently-active users, not history. Events are shuffled once on
  * the user key, exactly like the batch operator's window.
  *
  * Late events beyond the watermark are dropped by the engine; events
  * late WITHIN the watermark but older than the open session are
  * folded into it conservatively (they can only extend the session
  * backwards via `min(start)`), mirroring the batch operator up to
  * watermark-order effects — the documented streaming relaxation.
  */
object SessionStream {

  final case class Event(user_id: Long, ts: Timestamp)

  /** The open session per user (epoch micros). */
  final case class OpenSession(startUs: Long, endUs: Long, n: Long)

  final case class Session(user_id: Long, sess_start: Timestamp,
                           sess_end: Timestamp, n_events: Long)

  private def us(t: Timestamp): Long = t.getTime * 1000L + t.getNanos / 1000 % 1000

  /** Fold a batch of events for one user into the open-session state,
    * emitting every session that CLOSED (either because the in-batch
    * gap exceeded `gapSeconds`, or because the event-time timeout
    * fired with no new events).
    */
  def stateFn(gapSeconds: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[Session] = {
    val gapUs = gapSeconds * 1000000L
    def toSession(s: OpenSession): Session =
      Session(userId, new Timestamp(s.startUs / 1000),
        new Timestamp(s.endUs / 1000), s.n)

    if (events.isEmpty && state.hasTimedOut) {
      // watermark passed end + gap with no further events: closed
      val out = state.getOption.map(toSession).iterator
      state.remove()
      return out
    }

    val sorted = events.map(e => us(e.ts)).toArray.sorted
    var open = state.getOption
    val closed = Seq.newBuilder[OpenSession]
    sorted.foreach { t =>
      open = open match {
        case None => Some(OpenSession(t, t, 1))
        case Some(s) if t - s.endUs > gapUs =>
          closed += s
          Some(OpenSession(t, t, 1))
        case Some(s) =>
          Some(OpenSession(math.min(s.startUs, t), math.max(s.endUs, t), s.n + 1))
      }
    }
    open.foreach { s =>
      state.update(s)
      // the session is closed once the watermark passes end + gap
      state.setTimeoutTimestamp(s.endUs / 1000 + gapSeconds * 1000L)
    }
    closed.result().map(toSession).iterator
  }

  /** events (with an event-time watermark already applied upstream) →
    * append-mode stream of CLOSED sessions.
    */
  def sessions(events: Dataset[Event], gapSeconds: Long): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(stateFn(gapSeconds))
  }
}
