package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream


import graft.streaming.HeavyHittersStream
import graft.streaming.HeavyHittersStream.{HH, Tok}

/** Misra–Gries streaming heavy hitters: the k-counter bound, the
  * est ≤ true ≤ est + max_err guarantee measured against exact
  * counts, exactness below k distinct, and cross-batch state carry.
  */
class HeavyHittersStreamSpec extends SparkSpec {
  import spark.implicits._

  /** 80 × "hot", 40 × "warm", and 2 × each of 60 tail tokens, in a
    * deterministic interleaved order (tail between heavy runs so the
    * decrement rounds actually fire against the heavies).
    */
  private val stream: Seq[Tok] = {
    val hot = Seq.fill(80)("hot")
    val warm = Seq.fill(40)("warm")
    val tail = (0 until 60).flatMap(i => Seq(s"t$i", s"t$i"))
    // interleave: h w t h w t ... then leftovers
    val mixed = hot.zipAll(warm, "", "").zipAll(tail, ("", ""), "")
      .flatMap { case ((h, w), t) => Seq(h, w, t).filter(_.nonEmpty) }
    mixed.map(Tok("a", _))
  }
  private val n = stream.size.toLong
  private val trueHot = 80L

  private def run(batches: Seq[Seq[Tok]], k: Int): Map[String, HH] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tok]
    val q = HeavyHittersStream.summaries(input.toDS(), k)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-hh-ckpt").toString)
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val rows = spark.table("hh_out").as[HH].collect()
    val last = rows.map(_.n_seen).max
    spark.sql("DROP TABLE IF EXISTS hh_out")
    rows.filter(_.n_seen == last).map(h => h.token -> h).toMap
  }

  test("guarantee holds in one batch: est ≤ true ≤ est + max_err ≤ est + n/(k+1)") {
    val k = 8
    val got = run(Seq(stream), k)
    assert(got.size <= k)
    val hot = got("hot") // freq 80 > n/(k+1) = 244/9 ≈ 27 → must be present
    assert(hot.est <= trueHot && trueHot <= hot.est + hot.max_err,
      hot.toString)
    assert(hot.max_err <= n / (k + 1), hot.toString)
    assert(hot.n_seen === n)
  }

  test("guarantee holds across micro-batches (mergeable summaries)") {
    val k = 8
    val batches = stream.grouped(50).toSeq // 5 uneven batches
    val got = run(batches, k)
    assert(got.size <= k)
    val hot = got("hot")
    assert(hot.est <= trueHot && trueHot <= hot.est + hot.max_err,
      hot.toString)
    assert(hot.max_err <= n / (k + 1), hot.toString)
    assert(hot.n_seen === n, "state did not carry across batches")
    // warm (40 > n/9) must also survive
    assert(got.contains("warm"), got.keys.toString)
  }

  test("exact counts and zero error when distinct tokens fit in k") {
    val toks = Seq.fill(5)(Tok("b", "x")) ++ Seq.fill(3)(Tok("b", "y")) ++
      Seq(Tok("b", "z"))
    val got = run(Seq(toks), k = 8)
    assert(got("x").est === 5L && got("y").est === 3L && got("z").est === 1L)
    assert(got.values.forall(_.max_err === 0L))
  }

  test("sources keep independent summaries") {
    val toks = Seq.fill(10)(Tok("a", "hot")) ++ Seq.fill(7)(Tok("b", "cold"))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tok]
    val q = HeavyHittersStream.summaries(input.toDS(), 4)
      .writeStream.format("memory").queryName("hh_src")
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-hh-ckpt2").toString)
      .start()
    try { input.addData(toks: _*); q.processAllAvailable() } finally q.stop()
    val rows = spark.table("hh_src").as[HH].collect()
    assert(rows.filter(_.source == "a").map(h => h.token -> h.est).toMap
      === Map("hot" -> 10L))
    assert(rows.filter(_.source == "b").map(h => h.token -> h.est).toMap
      === Map("cold" -> 7L))
    assert(rows.forall(h => h.n_seen == (if (h.source == "a") 10L else 7L)))
  }
}
