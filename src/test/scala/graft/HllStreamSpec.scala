package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.HllStream
import graft.streaming.HllStream.{HllEst, Item}

/** Streaming HLL: bit-compatibility with the batch operator on the
  * same elements, batch-split invariance of the register state,
  * per-group isolation, and linear-counting accuracy at small
  * cardinality.
  */
class HllStreamSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[Item]]): Map[String, HllEst] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Item]
    val q = HllStream.estimates(input.toDS())
      .writeStream.format("memory").queryName("hll_out")
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-hll-ckpt").toString)
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val rows = spark.table("hll_out").as[HllEst].collect().toSeq
    spark.sql("DROP TABLE IF EXISTS hll_out")
    rows.groupBy(_.group).map { case (g, rs) => g -> rs.maxBy(_.n_seen) }
  }

  test("streaming estimate agrees with the batch operator on the same elements") {
    // 700 distinct uids with duplicates, one logical day
    val uids = (1 to 700).map(_.toLong)
    val items = (uids ++ uids.take(300)).map(u => Item("d1", u.toString))
    val got = run(Seq(items))("d1")
    assert(got.n_seen === 1000L)
    val ts = java.sql.Timestamp.valueOf("2020-01-01 10:00:00")
    val batch = graft.operators.Reports.dailyUniqueHll(
        (uids ++ uids.take(300)).map(u => (ts, u)).toDF("t", "uid"),
        "t", "uid")
      .collect().head
    assert(got.v_zero === batch.getAs[Long]("v_zero"))
    // same registers, same fixed-order arithmetic -> same double (the
    // only cross-path op is ln/÷ on identical inputs; allow 1 ulp-ish)
    assert(math.abs(got.hll_est - batch.getAs[Double]("hll_est")) <= 1e-9,
      s"stream ${got.hll_est} vs batch ${batch.getAs[Double]("hll_est")}")
  }

  test("register state is batch-split invariant: 1 batch == 4 batches, bit-exact") {
    val items = (1 to 800).map(i => Item("g", ((i * 31) % 500 + 1).toString))
    val one = run(Seq(items))("g")
    val four = run(Seq(items.grouped(200).toSeq: _*))("g")
    assert(one.n_seen === four.n_seen)
    assert(one.n_regs === four.n_regs)
    assert(one.v_zero === four.v_zero)
    assert(one.hll_est === four.hll_est) // identical registers -> identical double
  }

  test("register merge: sharded estimates combine to the single-pass estimate") {
    val all = (1 to 600).map(i => s"u${(i * 17) % 400}")
    val (shard1, shard2) = all.splitAt(250)
    def regsOf(items: Seq[String]): Map[Int, Int] =
      items.foldLeft(Map.empty[Int, Int]) { (m, it) =>
        val (idx, rho) = HllStream.registerOf(it)
        if (m.getOrElse(idx, 0) < rho) m.updated(idx, rho) else m
      }
    val merged = HllStream.merge(regsOf(shard1), regsOf(shard2))
    assert(merged === regsOf(all)) // max-merge == single pass, bit-exact
    assert(HllStream.estimate(merged) === HllStream.estimate(regsOf(all)))
    // commutative + idempotent
    assert(HllStream.merge(regsOf(shard2), regsOf(shard1)) === merged)
    assert(HllStream.merge(merged, merged) === merged)
  }

  test("groups keep independent registers; small cardinality hits linear counting") {
    val a = (1 to 5).map(i => Item("small", s"u$i"))
    val b = (1 to 2000).map(i => Item("big", s"v$i"))
    val got = run(Seq(a ++ b))
    val small = got("small")
    // 5 distinct: linear counting is near-exact
    assert(math.abs(small.hll_est - 5.0) < 0.5, small.toString)
    assert(got("big").hll_est > 1500.0 && got("big").hll_est < 2500.0)
  }
}
