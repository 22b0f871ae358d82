package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.NearDupStream

/** Near-dup curate-at-ingest: MinHash/LSH against the at-rest corpus
  * with exact-Jaccard verification, across multiple micro-batch runs
  * over the same corpus + bands directories.
  */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString

  // 30 distinct words — long enough that a one-word edit keeps
  // Jaccard ≈ 25/31 ≈ 0.81, above the 0.7 bar, and identical band
  // keys in most of the 8 bands
  private def baseText(seed: String): String =
    (1 to 30).map(i => s"$seed$i").mkString(" ")

  private def editedText(seed: String): String =
    (1 to 30).map(i => if (i == 15) "CHANGED" else s"$seed$i").mkString(" ")

  private def writeJson(dir: String, name: String,
                        docs: Seq[(Long, String)]): Unit = {
    val lines = docs.map { case (id, t) =>
      s"""{"doc_id":$id,"text":"$t"}"""
    }.mkString("", "\n", "\n")
    Files.write(Paths.get(dir, name), lines.getBytes("UTF-8"),
      StandardOpenOption.CREATE)
  }

  test("near-copies die at the door: in-batch, cross-batch, replay") {
    val in = tmp("graft-nd-in")
    val corpus = tmp("graft-nd-corpus") + "/corpus"
    val bands = tmp("graft-nd-bands") + "/bands"
    val ckpt = tmp("graft-nd-ckpt")
    val state = NearDupStream.bandsBloom()

    def run(): Unit =
      NearDupStream.start(spark, in, corpus, bands, ckpt,
        Trigger.AvailableNow(), minJaccard = 0.7, state = state)
        .awaitTermination(120000)
    def corpusIds: Seq[Long] = spark.read.parquet(corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq

    // batch 1: a doc and its one-word-edited near-copy IN THE SAME
    // batch — the within-batch LSH keeps the smaller doc_id
    writeJson(in, "b1.json", Seq(
      1L -> baseText("alpha"),
      2L -> editedText("alpha")))
    run()
    assert(corpusIds === Seq(1L))
    // bands landed for the survivor: 8 rows (NumBands)
    assert(spark.read.parquet(bands).count() === 8L)

    // batch 2: a near-copy of the AT-REST doc 1 is dropped; a genuinely
    // novel doc is kept
    writeJson(in, "b2.json", Seq(
      3L -> editedText("alpha"),
      4L -> baseText("beta")))
    run()
    assert(corpusIds === Seq(1L, 4L))
    assert(spark.read.parquet(bands).count() === 16L)
    // the cached filter was built once and fed by recordAppended
    assert(state.rebuilds === 1)

    // batch 3: an EXACT replay of doc 4 (restart semantics: identical
    // signatures → Jaccard 1.0) plus another alpha near-copy
    writeJson(in, "b3.json", Seq(
      5L -> baseText("beta"),
      6L -> editedText("alpha")))
    run()
    assert(corpusIds === Seq(1L, 4L))
  }

  test("backfillBands protects a corpus that predates the stream") {
    val in = tmp("graft-nd2-in")
    val corpus = tmp("graft-nd2-corpus") + "/corpus"
    val bands = tmp("graft-nd2-bands") + "/bands"
    val ckpt = tmp("graft-nd2-ckpt")
    // history written WITHOUT this stream (CurationStream-style corpus)
    Seq((1L, baseText("gamma"), "fp1"))
      .toDF("doc_id", "text", "fp")
      .write.parquet(corpus)
    NearDupStream.backfillBands(spark, corpus, bands)
    assert(spark.read.parquet(bands).count() === 8L)
    // a near-copy of the pre-existing doc is now caught at the door
    writeJson(in, "b1.json", Seq(
      10L -> editedText("gamma"),
      11L -> baseText("delta")))
    NearDupStream.start(spark, in, corpus, bands, ckpt,
        Trigger.AvailableNow(), minJaccard = 0.7)
      .awaitTermination(120000)
    val ids = spark.read.parquet(corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 11L))
  }
}
