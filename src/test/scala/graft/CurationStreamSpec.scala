package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.CurationStream

/** Curate-at-ingest stream: quality gate + within-batch dedup +
  * against-corpus dedup, across two micro-batch runs over the same
  * corpus directory.
  */
class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString

  // 25 distinct words: n_tokens in [20, 2000], ttr 1.0 → "keep"
  private def goodText(seed: String): String =
    (1 to 25).map(i => s"$seed$i").mkString(" ")

  private def writeJson(dir: String, name: String,
                        docs: Seq[(Long, String)]): Unit = {
    val lines = docs.map { case (id, t) =>
      s"""{"doc_id":$id,"text":"$t"}"""
    }.mkString("", "\n", "\n")
    Files.write(Paths.get(dir, name), lines.getBytes("UTF-8"),
      StandardOpenOption.CREATE)
  }

  test("stream lands only novel, quality-kept, deduplicated docs") {
    val in = tmp("graft-cur-in")
    val corpus = tmp("graft-cur-corpus") + "/corpus"
    val ckpt = tmp("graft-cur-ckpt")

    // batch 1: one good doc, an in-batch duplicate of it, one too-short
    writeJson(in, "b1.json", Seq(
      1L -> goodText("alpha"),
      2L -> goodText("alpha"),      // same text, higher id → dropped
      3L -> "too short to keep"))   // < 20 tokens → quality drop
    CurationStream.start(spark, in, corpus, ckpt, Trigger.AvailableNow())
      .awaitTermination(120000)
    val after1 = spark.read.parquet(corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(after1 === Seq(1L))

    // batch 2: a corpus duplicate of doc 1 and a novel good doc
    writeJson(in, "b2.json", Seq(
      4L -> goodText("alpha"),      // fingerprint already at rest → dropped
      5L -> goodText("beta")))
    CurationStream.start(spark, in, corpus, ckpt, Trigger.AvailableNow())
      .awaitTermination(120000)
    val after2 = spark.read.parquet(corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(after2 === Seq(1L, 5L))

    // fingerprints at rest are unique
    val fps = spark.read.parquet(corpus).select("fp").as[String].collect()
    assert(fps.distinct.length === fps.length)
  }

  test("semantic decon at ingest: benchmark-adjacent docs drop at the door, replay converges") {
    val in = tmp("graft-cur3-in")
    val corpus = tmp("graft-cur3-corpus") + "/corpus"
    val ckpt = tmp("graft-cur3-ckpt")
    val evalSet = Seq((100L, Seq(1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    def writeEmb(name: String,
                 docs: Seq[(Long, String, Option[Seq[Float]])]): Unit = {
      val lines = docs.map { case (id, t, e) =>
        val emb = e.fold("")(v => s""","embedding":[${v.mkString(",")}]""")
        s"""{"doc_id":$id,"text":"$t"$emb}"""
      }.mkString("", "\n", "\n")
      Files.write(Paths.get(in, name), lines.getBytes("UTF-8"),
        StandardOpenOption.CREATE)
    }
    def runOnce(): Unit =
      CurationStream.start(spark, in, corpus, ckpt, Trigger.AvailableNow(),
          new graft.streaming.CorpusBloom(), Some(evalSet), deconTau = 0.95)
        .awaitTermination(120000)

    // run 1: doc 1 points exactly along the eval vector (cos 1.0 ≥
    // tau → dropped at the door), doc 2 is orthogonal (cos 0 →
    // survives), doc 3 has no embedding (the gate only judges what it
    // can see → survives)
    writeEmb("b1.json", Seq(
      (1L, goodText("alpha"), Some(Seq(0.5f, 0f, 0f))),
      (2L, goodText("beta"), Some(Seq(0f, 1f, 0f))),
      (3L, goodText("gamma"), None)))
    runOnce()
    val after1 = spark.read.parquet(corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(after1 === Seq(2L, 3L))

    // run 2: a corpus duplicate of the clean doc (fingerprint dedup
    // drops it), a NOVEL benchmark-adjacent doc (door drops it), and
    // a novel clean doc (lands) — the stream converges to exactly the
    // decontaminated content across runs
    writeEmb("b2.json", Seq(
      (4L, goodText("beta"), Some(Seq(0f, 0f, 1f))),
      (5L, goodText("delta"), Some(Seq(0.9f, 0.01f, 0f))),
      (6L, goodText("epsilon"), Some(Seq(0f, 0.3f, 0.7f)))))
    runOnce()
    val after2 = spark.read.parquet(corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(after2 === Seq(2L, 3L, 6L))
  }

  test("cross-batch Bloom state rebuilds only on material corpus growth") {
    val in = tmp("graft-cur2-in")
    val corpus = tmp("graft-cur2-corpus") + "/corpus"
    val ckpt = tmp("graft-cur2-ckpt")
    // headroom=1, minCapacity=1: every appended survivor exceeds the
    // design capacity, forcing the rebuild path a real corpus would
    // only hit after ~doubling
    val state = new graft.streaming.CorpusBloom(headroom = 1, minCapacity = 1)

    writeJson(in, "b1.json", Seq(1L -> goodText("alpha")))
    CurationStream.start(spark, in, corpus, ckpt, Trigger.AvailableNow(), state)
      .awaitTermination(120000)
    // no corpus existed when batch 1 was filtered: nothing built yet
    assert(state.rebuilds === 0)

    writeJson(in, "b2.json", Seq(
      2L -> goodText("beta"),
      3L -> goodText("alpha"))) // at-rest duplicate → dropped
    CurationStream.start(spark, in, corpus, ckpt, Trigger.AvailableNow(), state)
      .awaitTermination(120000)
    // first build, sized from the 1-doc corpus; doc 2's fingerprint
    // folded in afterwards with no rebuild
    assert(state.rebuilds === 1)
    assert(state.trackedRows === 2L)

    writeJson(in, "b3.json", Seq(
      4L -> goodText("gamma"),
      5L -> goodText("beta")))  // at-rest duplicate → dropped
    CurationStream.start(spark, in, corpus, ckpt, Trigger.AvailableNow(), state)
      .awaitTermination(120000)
    // tracked growth (2) exceeded capacity (1): batch 3 resized from
    // the corpus — and the dedup stayed exact throughout
    assert(state.rebuilds === 2)
    val ids = spark.read.parquet(corpus)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 2L, 4L))
  }
}
