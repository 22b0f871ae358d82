package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Sampling
import graft.streaming.ReservoirStream

/** Streaming per-language weighted reservoir: the E-S keys are pure
  * row functions, so stream-fold ≡ one-shot batch sampling is an
  * EXACT equality, not a statistical one — proven here across a
  * three-way split, replay, and the pure fold function.
  */
class ReservoirStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString

  private def writeJson(dir: String, name: String,
                        docs: Seq[(Long, String, Long)]): Unit = {
    val lines = docs.map { case (id, lang, n) =>
      s"""{"doc_id":$id,"lang":"$lang","n_chars":$n}"""
    }.mkString("", "\n", "\n")
    Files.write(Paths.get(dir, name), lines.getBytes("UTF-8"),
      StandardOpenOption.CREATE)
  }

  // 60 docs over two languages, varied weights, plus a zero-weight row
  private val corpus: Seq[(Long, String, Long)] =
    (1L to 30L).map(i => (i, "en", 50L + 7L * i)) ++
      (31L to 60L).map(i => (i, "de", 30L + 11L * (i - 30L))) :+
      (61L, "en", 0L)

  /** One-shot batch reference: per-lang weightedSample top-k. */
  private def batchReference(k: Int): Set[(Long, String)] = {
    val df = corpus.toDF("doc_id", "lang", "n_chars")
    Seq("en", "de").flatMap { l =>
      Sampling.weightedSample(df.filter(col("lang") === l),
          "doc_id", col("n_chars"), k)
        .select(col("doc_id")).as[Long].collect().map(_ -> l)
    }.toSet
  }

  test("stream over three batches equals the one-shot batch sample") {
    val in = tmp("graft-res-in")
    val res = tmp("graft-res-state") + "/reservoir"
    val ckpt = tmp("graft-res-ckpt")
    val (b1, rest) = corpus.splitAt(20)
    val (b2, b3) = rest.splitAt(20)
    for ((batch, name) <- Seq(b1 -> "b1.json", b2 -> "b2.json",
        b3 -> "b3.json")) {
      writeJson(in, name, batch)
      ReservoirStream.start(spark, in, res, ckpt, k = 5,
        Trigger.AvailableNow()).awaitTermination(120000)
    }
    val got = ReservoirStream.read(spark, res).get
      .select(col("doc_id"), col("lang")).as[(Long, String)]
      .collect().toSet
    assert(got === batchReference(5))
    // state is k-bounded per language
    assert(got.count(_._2 == "en") === 5)
    assert(got.count(_._2 == "de") === 5)
    // the zero-weight row can never occupy a slot
    assert(!got.exists(_._1 == 61L))
    // the snapshot chain is pruned to at most two committed versions
    val vs = new java.io.File(res).listFiles()
      .filter(_.getName.matches("v\\d{9}")).map(_.getName).sorted
    assert(vs.length <= 2 && vs.last == "v%09d".format(2))
  }

  test("an uncommitted (crash-torn) snapshot is invisible to readers") {
    val res = tmp("graft-res-crash") + "/reservoir"
    val df = corpus.toDF("doc_id", "lang", "n_chars")
    // commit v0 through the public fold + parquet path
    ReservoirStream.foldBatch(df, None, 5)
      .write.parquet(res + "/v%09d".format(0))
    // simulate a crash mid-write of v1: dir exists, no _SUCCESS marker
    val torn = Paths.get(res, "v%09d".format(1))
    Files.createDirectories(torn)
    Files.write(torn.resolve("part-00000.parquet"),
      Array[Byte](0, 1, 2, 3), StandardOpenOption.CREATE)
    val (v, _) = ReservoirStream.currentSnapshot(spark, res).get
    assert(v === 0L, "resolution must skip the uncommitted snapshot")
    val rows = ReservoirStream.read(spark, res).get.count()
    assert(rows === 10L)
  }

  test("foldBatch is idempotent under replay and order-insensitive") {
    val df = corpus.toDF("doc_id", "lang", "n_chars")
    val (h1, h2) = corpus.splitAt(30)
    val d1 = h1.toDF("doc_id", "lang", "n_chars")
    val d2 = h2.toDF("doc_id", "lang", "n_chars")
    def ids(r: org.apache.spark.sql.DataFrame) =
      r.select(col("doc_id"), col("lang")).as[(Long, String)].collect().toSet
    val oneShot = ids(ReservoirStream.foldBatch(df, None, 5))
    val ab = ReservoirStream.foldBatch(d2,
      Some(ReservoirStream.foldBatch(d1, None, 5)), 5)
    val ba = ReservoirStream.foldBatch(d1,
      Some(ReservoirStream.foldBatch(d2, None, 5)), 5)
    assert(ids(ab) === oneShot)
    assert(ids(ba) === oneShot)
    // replaying a batch into a converged reservoir changes nothing
    val replay = ReservoirStream.foldBatch(d1, Some(ab), 5)
    assert(ids(replay) === oneShot)
  }
}
