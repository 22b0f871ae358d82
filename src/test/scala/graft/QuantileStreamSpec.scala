package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.QuantileStream
import graft.streaming.QuantileStream.{Obs, Quant}

/** Greenwald–Khanna streaming quantiles: the ε-rank guarantee
  * measured against exact sorted data (one batch and across five),
  * exact order statistics below the 1/(2ε) degeneracy threshold,
  * bounded summary size, and per-source isolation.
  */
class QuantileStreamSpec extends SparkSpec {
  import spark.implicits._

  /** 1..1000 in a deterministic pseudo-shuffled arrival order (37 is
    * coprime to 1000, so i*37 mod 1000 walks every slot).
    */
  private val values: Seq[Double] =
    (0 until 1000).map(i => ((i * 37) % 1000 + 1).toDouble)

  private def run(batches: Seq[Seq[Obs]], eps: Double): Seq[Quant] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Obs]
    val q = QuantileStream.deciles(input.toDS(), eps)
      .writeStream.format("memory").queryName("gk_out")
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-gk-ckpt").toString)
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val rows = spark.table("gk_out").as[Quant].collect().toSeq
    spark.sql("DROP TABLE IF EXISTS gk_out")
    rows
  }

  /** Latest emitted summary rows per (source, phi). */
  private def latest(rows: Seq[Quant]): Map[(String, Double), Quant] =
    rows.groupBy(r => (r.source, r.phi))
      .map { case (k, rs) => k -> rs.maxBy(_.n_seen) }

  /** 1-based rank of v in the sorted data (count of values ≤ v). */
  private def rankOf(data: Seq[Double], v: Double): Long =
    data.count(_ <= v).toLong

  test("rank guarantee in one batch: every decile within eps*n of its target") {
    val eps = 0.05
    val got = latest(run(Seq(values.map(Obs("a", _))), eps))
    val n = 1000L
    QuantileStream.Phis.foreach { phi =>
      val q = got(("a", phi))
      assert(q.n_seen === n)
      val r = math.ceil(phi * n).toLong
      val e = (eps * n).toLong
      val rank = rankOf(values, q.q)
      assert(math.abs(rank - r) <= e,
        s"phi=$phi q=${q.q} rank=$rank target=$r budget=$e")
    }
  }

  test("guarantee survives five micro-batches; summary stays two decades under n") {
    val eps = 0.05
    val batches = values.grouped(200).map(_.map(Obs("a", _))).toSeq
    val got = latest(run(batches, eps))
    QuantileStream.Phis.foreach { phi =>
      val q = got(("a", phi))
      val r = math.ceil(phi * 1000).toLong
      val rank = rankOf(values, q.q)
      assert(math.abs(rank - r) <= 50L,
        s"phi=$phi q=${q.q} rank=$rank target=$r")
      assert(q.n_tuples <= 100,
        s"summary ballooned: ${q.n_tuples} tuples for 1000 values")
      assert(q.max_rank_err === 50L)
    }
  }

  test("below 1/(2*eps) the summary is exact order statistics") {
    val eps = 0.01 // degeneracy threshold 50; feed 40 values
    val data = (1 to 40).map(i => ((i * 13) % 40 + 1).toDouble)
    val got = latest(run(Seq(data.map(Obs("a", _))), eps))
    val sorted = data.sorted
    QuantileStream.Phis.foreach { phi =>
      val r = math.ceil(phi * 40).toInt
      assert(got(("a", phi)).q === sorted(r - 1),
        s"phi=$phi expected exact ${sorted(r - 1)}")
    }
    assert(got(("a", 0.5)).n_tuples === 40)
  }

  test("sources keep independent summaries") {
    val eps = 0.05
    val a = (1 to 200).map(i => Obs("a", i.toDouble))
    val b = (1 to 200).map(i => Obs("b", 1000.0 + i))
    val got = latest(run(Seq(a ++ b), eps))
    assert(got(("a", 0.5)).q < 250.0)
    assert(got(("b", 0.5)).q > 1000.0)
    assert(got(("a", 0.5)).n_seen === 200L)
    assert(got(("b", 0.5)).n_seen === 200L)
  }
}
