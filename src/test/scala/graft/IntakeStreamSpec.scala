package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{IntakeStream, NearDupStream}

/** The streaming intake door: quality gate + near-dedup against the
  * at-rest corpus + eval decontamination, per micro-batch.
  */
class IntakeStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString

  private def text(seed: String): String =
    (1 to 30).map(i => s"$seed$i").mkString(" ")

  private def writeJson(dir: String, name: String,
                        docs: Seq[(Long, String)]): Unit = {
    val lines = docs.map { case (id, t) =>
      s"""{"doc_id":$id,"text":"$t"}"""
    }.mkString("", "\n", "\n")
    Files.write(Paths.get(dir, name), lines.getBytes("UTF-8"),
      StandardOpenOption.CREATE)
  }

  test("intake drops corpus near-dups AND eval-contaminated docs; novel lands") {
    val in = tmp("graft-it-in")
    val corpusDir = tmp("graft-it-c") + "/corpus"
    val bandsDir = tmp("graft-it-b") + "/bands"
    val evalDir = tmp("graft-it-e") + "/eval"
    val ckpt = tmp("graft-it-k")

    // at-rest corpus: one doc, with its bands backfilled (the contract
    // for a corpus that predates the stream)
    Seq(1L -> text("corp")).toDF("doc_id", "text")
      .withColumn("fp", org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.lower($"text")))
      .write.parquet(corpusDir)
    NearDupStream.backfillBands(spark, corpusDir, bandsDir)

    // eval set: one benchmark doc; a contaminated intake doc shares a
    // 6-word run with it (4 shared trigram shingles >= minOverlap 2)
    val evalRun = (1 to 6).map(i => s"bench$i").mkString(" ")
    Seq(500L -> (text("ev") + " " + evalRun)).toDF("doc_id", "text")
      .write.parquet(evalDir)

    val state = NearDupStream.bandsBloom()
    def run(): Unit =
      IntakeStream.start(spark, in, corpusDir, bandsDir, evalDir, ckpt,
        Trigger.AvailableNow(), minJaccard = 0.7, minOverlap = 2,
        state = state).awaitTermination(180000)
    def corpusIds: Seq[Long] = spark.read.parquet(corpusDir)
      .select("doc_id").as[Long].collect().sorted.toSeq

    writeJson(in, "b1.json", Seq(
      100L -> text("corp"),                          // corpus near-dup
      101L -> ((1 to 24).map(i => s"cont$i").mkString(" ") + " " + evalRun),
      102L -> text("novel")))                        // clean
    run()
    assert(corpusIds === Seq(1L, 102L),
      s"expected only the novel doc to land: $corpusIds")
    // the survivor's bands landed too (8 per doc: backfill + novel)
    assert(spark.read.parquet(bandsDir).count() === 16L)

    // a later batch replaying the novel doc's content near-dups
    // against the NOW-grown corpus and is dropped
    writeJson(in, "b2.json", Seq(200L -> text("novel")))
    run()
    assert(corpusIds === Seq(1L, 102L))
  }
}
