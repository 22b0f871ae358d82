package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.streaming.Trigger

import graft.operators.TextAnalysis
import graft.streaming.LmGateStream

/** Model-broadcast LM gate: the shipped pruned-bigram model must
  * reproduce the batch operator exactly when nothing is pruned, degrade
  * predictably under pruning, and gate a two-run stream
  * deterministically (checkpoint + replay-stable scores).
  */
class LmGateStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString

  private val corpusDocs = Seq(
    1L -> "the cat sat on the mat",
    2L -> "the cat sat on the hat",
    3L -> "a dog ran in the park",
    4L -> "colorless green ideas sleep furiously")

  test("unpruned shipped model reproduces the batch operator bit-for-bit") {
    val docs = corpusDocs.toDF("doc_id", "text")
    val model =
      LmGateStream.train(docs, maxBigrams = 1000000, maxContexts = 1000000)
    val bc = spark.sparkContext.broadcast(model)
    val batchScores = TextAnalysis.bigramLmScore(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val shipped = LmGateStream.scoreBatch(docs, bc, minPpm = 0.0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(shipped.keySet === batchScores.keySet)
    shipped.foreach { case (id, (n, ppm)) =>
      assert(n === batchScores(id)._1, s"doc $id n_bigrams")
      assert(ppm === batchScores(id)._2, s"doc $id ppm (must be EXACT)")
    }
  }

  test("pruning keeps denominators exact and only floors pruned bigrams") {
    val docs = corpusDocs.toDF("doc_id", "text")
    val full =
      LmGateStream.train(docs, maxBigrams = 1000000, maxContexts = 1000000)
    val pruned =
      LmGateStream.train(docs, maxBigrams = 3, maxContexts = 1000000)
    assert(pruned.bigrams.size === 3)
    // four bigrams tie at count 2 ("the cat", "cat sat", "sat on",
    // "on the"); the (count desc, w1, w2) tie-break keeps the first
    // three alphabetically by w1 — deterministic truncation
    assert(pruned.bigrams.keySet ===
      Set(("cat", "sat"), ("on", "the"), ("sat", "on")))
    // with an uncapped context budget the denominators stay exact
    assert(pruned.contexts === full.contexts)
    assert(pruned.vocab === full.vocab)
    // a pruned-model score never exceeds the full model's
    val bcF = spark.sparkContext.broadcast(full)
    val bcP = spark.sparkContext.broadcast(pruned)
    val f = LmGateStream.scoreBatch(docs, bcF, 0.0).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val p = LmGateStream.scoreBatch(docs, bcP, 0.0).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    f.keys.foreach(id => assert(p(id) <= f(id), s"doc $id"))
  }

  test("capped contexts keep exact denominators for retained bigrams, " +
       "floor pruned contexts at 1/V, and the stream agrees with the " +
       "shipped-batch scorer exactly") {
    val docs = corpusDocs.toDF("doc_id", "text")
    val m = LmGateStream.train(docs, maxBigrams = 3, maxContexts = 1)
    // context head keeps only "the" (count 5); the w1 set of the three
    // retained bigrams is unioned in with EXACT counts — model size is
    // bounded by maxBigrams + maxContexts, not vocabulary
    assert(m.contexts ===
      Map("the" -> 5L, "cat" -> 2L, "on" -> 2L, "sat" -> 2L))
    assert(m.vocab === 16L)
    val bc = spark.sparkContext.broadcast(m)
    val scored = LmGateStream.scoreBatch(docs, bc, 0.0).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 4: every bigram AND every context pruned → each of its 4
    // bigrams scores the documented 1/V floor exactly:
    // 4 × (1/16) × 1e6 / 4 = 62500 ppm, exact in binary
    assert(scored(4L) === 62500.0)
    // doc 3 mixes pruned contexts (1/V) with a retained context whose
    // bigram was pruned ((0+1)/(5+16)) — strictly below doc 4
    assert(scored(3L) < scored(4L))

    // the STREAM with the same capped model must land the identical
    // scores (the degradation is deterministic, not path-dependent)
    val in = tmp("graft-lmctx-in")
    val corpus = tmp("graft-lmctx-c") + "/c"
    val quarantine = tmp("graft-lmctx-q") + "/q"
    val ckpt = tmp("graft-lmctx-ck")
    val lines = Seq(3L -> "a dog ran in the park",
        4L -> "colorless green ideas sleep furiously")
      .map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
      .mkString("", "\n", "\n")
    Files.write(Paths.get(in, "b1.json"), lines.getBytes("UTF-8"),
      StandardOpenOption.CREATE)
    LmGateStream.start(spark, in, m, minPpm = 60000.0, corpus,
        quarantine, ckpt, Trigger.AvailableNow())
      .awaitTermination(120000)
    val kept = spark.read.parquet(corpus)
      .select("doc_id", "lm_ppm").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rejected = spark.read.parquet(quarantine)
      .select("doc_id", "lm_ppm").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(kept === Map(4L -> scored(4L)))
    assert(rejected === Map(3L -> scored(3L)))
  }

  test("stream gates docs into corpus and quarantine across two runs") {
    val in = tmp("graft-lm-in")
    val corpus = tmp("graft-lm-corpus") + "/corpus"
    val quarantine = tmp("graft-lm-q") + "/q"
    val ckpt = tmp("graft-lm-ckpt")
    val model = LmGateStream.train(
      corpusDocs.toDF("doc_id", "text"), 1000000, 1000000)
    // threshold between the in-distribution docs and word salad:
    // score the training docs offline to pick it
    val bc = spark.sparkContext.broadcast(model)
    val trained = LmGateStream.scoreBatch(
        corpusDocs.toDF("doc_id", "text"), bc, 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // the Laplace floor 1/V is high when V is tiny (16 words here), so
    // the gate sits AT the weakest in-distribution doc: anything whose
    // every bigram and context is unseen scores 1/V-ish, strictly less
    val minPpm = trained.values.min

    def writeJson(name: String, docs: Seq[(Long, String)]): Unit = {
      val lines = docs.map { case (id, t) =>
        s"""{"doc_id":$id,"text":"$t"}"""
      }.mkString("", "\n", "\n")
      Files.write(Paths.get(in, name), lines.getBytes("UTF-8"),
        StandardOpenOption.CREATE)
    }

    // batch 1: one fluent doc (reuses trained bigrams), one word salad
    writeJson("b1.json", Seq(
      10L -> "the cat sat on the mat",
      11L -> "zq xv bn mk lp qw er ty"))
    LmGateStream.start(spark, in, model, minPpm, corpus, quarantine,
        ckpt, Trigger.AvailableNow())
      .awaitTermination(120000)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSeq === Seq(10L))
    assert(spark.read.parquet(quarantine).select("doc_id").as[Long]
      .collect().toSeq === Seq(11L))

    // batch 2 (restart from checkpoint): a short doc keeps with
    // n_bigrams = 0 (no evidence), more salad quarantines
    writeJson("b2.json", Seq(
      12L -> "single",
      13L -> "vv uu zz yy xx ww qq pp"))
    LmGateStream.start(spark, in, model, minPpm, corpus, quarantine,
        ckpt, Trigger.AvailableNow())
      .awaitTermination(120000)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq === Seq(10L, 12L))
    assert(spark.read.parquet(quarantine).select("doc_id").as[Long]
      .collect().sorted.toSeq === Seq(11L, 13L))
    // scores ride along for auditability
    val cols = spark.read.parquet(quarantine).columns.toSet
    assert(cols === Set("doc_id", "text", "n_bigrams", "lm_ppm"))
  }
}
