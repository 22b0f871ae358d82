package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.SessionStream
import graft.streaming.SessionStream.{Event, Session}

/** flatMapGroupsWithState sessionization: in-batch gap splits, state
  * carry-over across batches, and timeout-driven close when the
  * watermark passes the gap.
  */
class SessionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2020-01-01 10:$minute%02d:00")

  test("sessions split on gap, carry open state, and close by timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val out = SessionStream.sessions(
      input.toDS().withWatermark("ts", "0 seconds"), gapSeconds = 600)
    val sink = Files.createTempDirectory("graft-sess-sink").toString
    val q = out.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sess-ckpt").toString)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try {
      def collected(): Seq[Session] =
        spark.table("sessions_out").as[Session].collect().toSeq

      // batch 1: user 1 has two bursts separated by > 10 min — the
      // first closes IN-BATCH; the second stays open in state.
      // user 2 has one open burst.
      input.addData(
        Event(1, ts(0)), Event(1, ts(5)),
        Event(1, ts(20)), Event(1, ts(22)),
        Event(2, ts(21)))
      q.processAllAvailable()
      val afterB1 = collected()
      assert(afterB1.map(s => (s.user_id, s.sess_start, s.sess_end, s.n_events))
        === Seq((1L, ts(0), ts(5), 2L)))

      // batch 2: user 1's open session continues (30' is within the
      // gap of 22'); user 3's first event hoists the watermark to 50'.
      // processAllAvailable also runs the ensuing no-data micro-batch,
      // where EventTimeTimeout fires for user 2 (21'+10' < 50') and
      // user 1 (30'+10' < 50') — both sessions close; user 3's stays
      // open (50'+10' > watermark)
      input.addData(Event(1, ts(30)), Event(3, ts(50)))
      q.processAllAvailable()
      val afterB2 = collected()
      assert(afterB2.exists(s => s.user_id == 2 && s.n_events == 1 &&
        s.sess_start == ts(21) && s.sess_end == ts(21)), afterB2.toString)
      assert(afterB2.exists(s => s.user_id == 1 && s.sess_start == ts(20) &&
        s.sess_end == ts(30) && s.n_events == 3), afterB2.toString)
      assert(!afterB2.exists(s => s.user_id == 3))

      // the timed-out state was REMOVED: a later in-gap event for
      // user 1 starts a fresh session rather than resurrecting state
      input.addData(Event(1, ts(52)), Event(9, ts(70)))
      q.processAllAvailable()
      val afterB3 = collected()
      assert(afterB3.exists(s => s.user_id == 1 && s.sess_start == ts(52) &&
        s.sess_end == ts(52) && s.n_events == 1), afterB3.toString)
    } finally q.stop()
  }

  test("streaming sessions equal batch gaps-and-islands on full replay") {
    implicit val sqlCtx = spark.sqlContext
    // deterministic corpus: 5 users × 30 events, gap pattern crossing
    // the 30-minute session boundary several times per user
    val base = Timestamp.valueOf("2020-01-01 00:00:00").getTime
    val events = for (u <- 1 to 5; i <- 0 until 30) yield {
      val gaps = (0 until i).map(j =>
        if (j % 7 == u % 3 + 2) 2400L else 60L + u * 7 + j)
      Event(u.toLong, new Timestamp(base + gaps.sum * 1000L))
    }

    // batch reference: the oracle-gated gaps-and-islands operator
    val batchDf = events.zipWithIndex
      .map { case (e, i) => (e.user_id, e.ts, i.toLong) }
      .toDF("user_id", "ts", "event_id")
    val expected = graft.operators.Temporal
      .sessionize(batchDf, "user_id", "ts", "event_id", 1800L)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("sess_start"),
        r.getAs[Timestamp]("sess_end"), r.getAs[Long]("n_events")))
      .toSet

    val input = MemoryStream[Event]
    val out = SessionStream.sessions(
      input.toDS().withWatermark("ts", "0 seconds"), gapSeconds = 1800)
    val q = out.writeStream
      .format("memory").queryName("sessions_eq")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sess-eq-ckpt").toString)
      .start()
    try {
      // replay in two chunks (state must carry over), then a far
      // sentinel event pushes the watermark past every open session
      val (first, rest) = events.sortBy(_.ts.getTime).splitAt(events.size / 2)
      input.addData(first: _*)
      q.processAllAvailable()
      input.addData(rest: _*)
      q.processAllAvailable()
      input.addData(Event(999L, new Timestamp(base + 365L * 86400 * 1000)))
      q.processAllAvailable()
      val got = spark.table("sessions_eq").as[Session].collect()
        .filter(_.user_id != 999L)
        .map(s => (s.user_id, s.sess_start, s.sess_end, s.n_events))
        .toSet
      assert(got === expected,
        s"missing=${expected -- got} extra=${got -- expected}")
    } finally q.stop()
  }
}
