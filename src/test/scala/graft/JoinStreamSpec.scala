package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.JoinStream
import graft.streaming.JoinStream.{Click, Impression}

/** Time-bounded stream-stream join: in-horizon matching, out-of-horizon
  * rejection, watermark-driven null emission for the outer variant, and
  * batch parity on full replay.
  */
class JoinStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2020-01-01 10:$minute%02d:$second%02d")

  private def startQuery(out: org.apache.spark.sql.DataFrame, name: String) =
    out.writeStream.format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-$name-ckpt").toString)
      .start()

  test("inner join matches clicks inside the horizon only") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Impression]
    val clks = MemoryStream[Click]
    val out = JoinStream.attributed(imps.toDS(), clks.toDS(),
      horizonSeconds = 300)
    val q = startQuery(out, "attr_inner")
    try {
      imps.addData(Impression(1, ts(0)), Impression(2, ts(0)))
      clks.addData(
        Click(10, 1, ts(3)),   // in horizon → match
        Click(11, 2, ts(9)),   // 9 min > 5 min horizon → no match
        Click(12, 9, ts(2)))   // unknown impression → no match
      q.processAllAvailable()
      val got = spark.table("attr_inner")
        .select("imp_id", "click_id").as[(Long, Long)].collect().toSeq
      assert(got === Seq((1L, 10L)))

      // a click arriving in a LATER batch than its impression still
      // matches — the impression was buffered in the join state
      clks.addData(Click(13, 2, ts(4)))
      q.processAllAvailable()
      val got2 = spark.table("attr_inner")
        .select("imp_id", "click_id").as[(Long, Long)].collect().toSet
      assert(got2 === Set((1L, 10L), (2L, 13L)))
    } finally q.stop()
  }

  test("left outer emits unmatched impressions after the horizon expires") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Impression]
    val clks = MemoryStream[Click]
    val out = JoinStream.attributed(imps.toDS(), clks.toDS(),
      horizonSeconds = 300, joinType = "left_outer")
    val q = startQuery(out, "attr_outer")
    try {
      imps.addData(Impression(1, ts(0)), Impression(2, ts(0)))
      clks.addData(Click(10, 1, ts(3)))
      q.processAllAvailable()
      // impression 2 is still inside its horizon: only the match so far
      val afterB1 = spark.table("attr_outer")
        .select("imp_id", "click_id").as[(Long, Option[Long])]
        .collect().toSet
      assert(afterB1 === Set((1L, Some(10L))))

      // advance both watermarks past imp_ts + horizon; the no-data
      // batch after processAllAvailable flushes the expired state and
      // impression 2 surfaces with null click columns
      imps.addData(Impression(3, ts(30)))
      clks.addData(Click(19, 999, ts(30)))
      q.processAllAvailable()
      val afterB2 = spark.table("attr_outer")
        .select("imp_id", "click_id").as[(Long, Option[Long])]
        .collect().toSet
      assert(afterB2.contains((2L, None)), afterB2.toString)
    } finally q.stop()
  }

  test("streaming inner join equals the batch join on full replay") {
    implicit val sqlCtx = spark.sqlContext
    // 40 impressions a minute apart; clicks at +2' (even ids, match)
    // and +7' (odd ids, outside the 5' horizon)
    val imps = (0 until 40).map(i => Impression(i.toLong, ts(i % 60)))
    val clks = (0 until 40).map { i =>
      val off = if (i % 2 == 0) 2 else 7
      Click(100L + i, i.toLong, ts((i + off) % 60))
    }
    val impStream = MemoryStream[Impression]
    val clkStream = MemoryStream[Click]
    val out = JoinStream.attributed(impStream.toDS(), clkStream.toDS(),
      horizonSeconds = 300)
    val q = startQuery(out, "attr_replay")
    try {
      impStream.addData(imps)
      clkStream.addData(clks)
      q.processAllAvailable()
      val streamed = spark.table("attr_replay")
        .select("imp_id", "click_id").as[(Long, Long)].collect().toSet
      val batch = JoinStream.attributed(imps.toDS(), clks.toDS(),
        horizonSeconds = 300)
        .select("imp_id", "click_id").as[(Long, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed.size === 20)
      assert(streamed.forall { case (imp, clk) => clk === imp + 100 && imp % 2 == 0 })
    } finally q.stop()
  }
}
