package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.DedupStream

/** Streaming dedup: duplicates within the watermark horizon drop;
  * state expires past it so a far-later copy passes again.
  */
class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2020-01-01 10:$minute%02d:00")

  test("duplicates drop within the horizon and pass after state expiry") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val out = DedupStream.dedupped(
      input.toDS().toDF("ts", "text"), "ts", "text", "10 minutes")
    val q = out.writeStream
      .format("memory").queryName("dedup_out")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-dedup-ckpt").toString)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try {
      def rows(): Seq[(Timestamp, String)] =
        spark.table("dedup_out").select("ts", "text").as[(Timestamp, String)]
          .collect().toSeq

      // batch 1: "aaa" twice (in-batch dup), "bbb" once
      input.addData((ts(0), "aaa"), (ts(1), "aaa"), (ts(0), "bbb"))
      q.processAllAvailable()
      assert(rows().map(_._2).sorted === Seq("aaa", "bbb"))

      // batch 2: "aaa" again at minute 5 — inside the 10' horizon of
      // the minute-0 copy: dropped
      input.addData((ts(5), "aaa"))
      q.processAllAvailable()
      assert(rows().count(_._2 == "aaa") === 1)

      // advance event time far past minute 0 + 10' so "aaa" state
      // expires, then send a fresh copy: it passes as a new first-seen
      input.addData((ts(40), "ccc"))
      q.processAllAvailable()
      input.addData((ts(41), "aaa"))
      q.processAllAvailable()
      assert(rows().count(_._2 == "aaa") === 2, rows().toString)
    } finally q.stop()
  }
}
