package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.RateAlertStream
import graft.streaming.RateAlertStream.{Alert, Hit}

/** Streaming rate alerts: buckets close at the watermark, trailing
  * ratios flag a spike, silent buckets emit drop alerts, and state
  * carries across micro-batches.
  */
class RateAlertStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2020-01-01 10:$minute%02d:$sec%02d")

  test("spike and silent-drop buckets alert; steady buckets don't") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Hit]
    val out = RateAlertStream.alerts(
      input.toDS().withWatermark("ts", "0 seconds"),
      bucketSeconds = 60, trail = 3, factor = 1.5)
    val q = out.writeStream
      .format("memory").queryName("rate_alerts")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-rate-ckpt").toString)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try {
      def collected(): Map[Timestamp, Alert] =
        spark.table("rate_alerts").as[Alert].collect()
          .map(a => a.bucket_start -> a).toMap

      // one batch: minutes 0-3 steady at 4 events, minute 4 spikes to
      // 40, and a minute-5 heartbeat hoists the watermark past bucket 4
      // (a 0 s watermark drops anything older than max-seen, so the
      // spike must ride the same batch as the steady traffic)
      val steady = (0 to 3).flatMap(m => (0 until 4).map(i => Hit("api", ts(m, i))))
      val spike40 = (0 until 40).map(i => Hit("api", ts(4, i % 59)))
      input.addData(steady ++ spike40 :+ Hit("api", ts(5, 59)): _*)
      q.processAllAvailable()
      val afterB1 = collected()
      // buckets 0-4 closed; only the spike bucket flags
      assert(afterB1.size === 5, afterB1.keys.toString)
      val b3 = afterB1(ts(3))
      assert(b3.n_trail === 3 && b3.cnt === 4L && b3.trail_avg === 4.0 &&
        !b3.is_anomaly)
      val spike = afterB1(ts(4))
      assert(spike.cnt === 40L && spike.is_anomaly, s"spike not flagged: $spike")
      assert(afterB1.values.count(_.is_anomaly) === 1, afterB1.toString)

      // a minute-7 heartbeat closes bucket 5 (the lone heartbeat) and
      // the fully SILENT bucket 6 — the drop-to-zero alert
      input.addData(Hit("api", ts(7, 30)))
      q.processAllAvailable()
      val after = collected()
      val b5 = after(ts(5))
      assert(b5.cnt === 1L, s"heartbeat bucket wrong: $b5")
      val drop = after(ts(6))
      assert(drop.cnt === 0L && drop.is_anomaly, s"drop not flagged: $drop")
    } finally q.stop()
  }

  test("a watermark jump past the zero-cap still closes stranded real-event buckets") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Hit]
    val out = RateAlertStream.alerts(
      input.toDS().withWatermark("ts", "0 seconds"),
      bucketSeconds = 60, trail = 3, factor = 1.5)
    val q = out.writeStream
      .format("memory").queryName("rate_alerts_jump")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-rate-jump-ckpt").toString)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try {
      def buckets(): Map[Timestamp, Alert] =
        spark.table("rate_alerts_jump").as[Alert].collect()
          .map(a => a.bucket_start -> a).toMap
      // bucket 10:00 closes (lastClosed set); bucket 10:01 holds one
      // real event and stays OPEN (watermark at 10:01:30)
      input.addData(
        (0 until 4).map(i => Hit("api", ts(0, i))) :+ Hit("api", ts(1, 30)): _*)
      q.processAllAvailable()
      assert(buckets().keySet === Set(ts(0)), buckets().keys.toString)
      // the watermark then JUMPS one hour — far past the trail*4 = 12
      // synthesized-zero cap. The stranded 10:01 bucket must still
      // close and emit; the empty gap is capped, not the real bucket.
      input.addData(Hit("api", Timestamp.valueOf("2020-01-01 11:00:30")))
      q.processAllAvailable()
      val after = buckets()
      val stranded = after(ts(1))
      assert(stranded.cnt === 1L, s"stranded bucket lost: $after")
      // the synthesized-zero window is the 12 buckets before 11:00
      // (10:48..10:59) — 10:02..10:47 are skipped by the cap
      assert(!after.contains(ts(2)) && !after.contains(ts(47)))
      assert(after.contains(ts(48)) && after.contains(ts(59)))
      assert(after(ts(48)).cnt === 0L)
      assert(after.size === 1 + 1 + 12, after.keys.toSeq.sortBy(_.getTime).toString)
    } finally q.stop()
  }

  test("trailing state survives a checkpoint restart") {
    val in = Files.createTempDirectory("graft-rate-in").toString
    val out = Files.createTempDirectory("graft-rate-out").toString
    val ckpt = Files.createTempDirectory("graft-rate-ckpt3").toString
    def writeHits(name: String, lines: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(in, name),
        lines.mkString("\n").getBytes)
    // memory sinks can't recover a checkpoint — use a parquet sink with
    // AvailableNow, the DailyAggStream restore discipline
    def runOnce(): Unit = RateAlertStream.alerts(
        spark.readStream.schema("service STRING, ts TIMESTAMP").json(in)
          .as[Hit].withWatermark("ts", "0 seconds"),
        bucketSeconds = 60, trail = 2, factor = 1.5)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination(120000)

    def line(m: Int, s: Int) =
      s"""{"service":"api","ts":"2020-01-01T10:${"%02d".format(m)}:${"%02d".format(s)}"}"""
    // run 1: two steady minutes + a heartbeat that closes them
    writeHits("a.json",
      (0 until 4).map(s => line(0, s)) ++ (0 until 4).map(s => line(1, s)) :+
        line(2, 30))
    runOnce()
    val run1 = spark.read.parquet(out).as[Alert].collect()
    assert(run1.map(_.bucket_start).toSet === Set(ts(0), ts(1)), run1.toSeq)

    // run 2 (same checkpoint): a minute-4 heartbeat closes the
    // pre-restart heartbeat bucket 2 AND the silent bucket 3 — bucket
    // 2's trailing average of 4.0 proves the ring survived the restart
    writeHits("b.json", Seq(line(4, 10)))
    runOnce()
    val run2 = spark.read.parquet(out).as[Alert].collect()
      .map(a => a.bucket_start -> a).toMap
    val b2 = run2(ts(2))
    assert(b2.cnt === 1L && b2.n_trail === 2 && b2.trail_avg === 4.0 &&
      b2.is_anomaly, s"restored-trail bucket wrong: $b2")
    val b3 = run2(ts(3))
    assert(b3.cnt === 0L && b3.is_anomaly, s"silent bucket wrong: $b3")
  }

  test("services keep independent state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Hit]
    val out = RateAlertStream.alerts(
      input.toDS().withWatermark("ts", "0 seconds"),
      bucketSeconds = 60, trail = 2, factor = 1.5)
    val q = out.writeStream
      .format("memory").queryName("rate_alerts2")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-rate-ckpt2").toString)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try {
      input.addData(
        Seq(Hit("a", ts(0)), Hit("a", ts(1)), Hit("b", ts(0)),
          Hit("b", ts(0, 1)), Hit("b", ts(0, 2)), Hit("a", ts(2, 30)),
          Hit("b", ts(2, 30))): _*)
      q.processAllAvailable()
      val got = spark.table("rate_alerts2").as[Alert].collect()
        .groupBy(_.service)
      // a saw 1 event in each of buckets 0 and 1; b saw 3 in bucket 0
      assert(got("a").map(a => (a.bucket_start, a.cnt))
        .sortBy(_._1.getTime).toSeq === Seq((ts(0), 1L), (ts(1), 1L)))
      assert(got("b").map(a => (a.bucket_start, a.cnt)).toSeq
        === Seq((ts(0), 3L)))
    } finally q.stop()
  }
}
