package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, TextAnalysis}

/** Unit behavior of the retrieval/privacy tier: BM25 scoring,
  * inverted-index posting heads, stride chunking, and the k-anonymity
  * audit. Oracle parity is covered by the declared queries; these pin
  * the hand-checkable semantics and the partitioning invariances.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "rare common common common common common"),
    (2L, "common common common common common common"),
    (3L, "common other other other other other"),
    (4L, "other other other other other other")
  ).toDF("doc_id", "text")

  test("bm25: rare query term outweighs a common one at equal tf and dl") {
    val got = TextAnalysis.bm25(corpus, Seq("rare", "common"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // docs 1-3 all hit; doc 4 has no query term at all
    assert(got.keySet === Set(1L, 2L, 3L))
    // doc 1 (1×rare + 5×common) must outrank doc 2 (6×common): the
    // idf of df=1 'rare' dwarfs the tf-saturated 6th 'common'
    assert(got(1L)._3 > got(2L)._3)
    // doc 2 (tf=6) outranks doc 3 (tf=1) on the same term
    assert(got(2L)._3 > got(3L)._3)
    // hit accounting: (terms hit, total occurrences)
    assert((got(1L)._1, got(1L)._2) === (2L, 6L))
    assert((got(3L)._1, got(3L)._2) === (1L, 1L))
    // every weight is positive under the 1+odds idf
    assert(got.values.forall(_._3 > 0.0))
  }

  test("bm25 is partitioning-invariant (decimal-quantized term sums)") {
    val base = TextAnalysis.bm25(corpus, Seq("rare", "common"))
    val spread = TextAnalysis.bm25(corpus.repartition(7), Seq("rare", "common"))
    assert(base.exceptAll(spread).count() === 0L &&
      spread.exceptAll(base).count() === 0L)
  }

  test("postingHeads caps the head at headLen ascending ids, df uncapped") {
    val docs = (0 until 30).map(i =>
      (i.toLong, if (i % 3 == 0) "hot word" else "hot")).toDF("doc_id", "text")
    val got = TextAnalysis.postingHeads(docs, k = 2, headLen = 5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got.keySet === Set("hot", "word"))
    // df counts ALL postings even though the head page stops at 5
    assert(got("hot")._1 === 30L && got("word")._1 === 10L)
    assert(got("hot")._3 === "0,1,2,3,4")
    // 'word' appears in docs 0,3,6,9,12,…: head = first five
    assert(got("word")._3 === "0,3,6,9,12")
  }

  test("chunkStride at stride=chunk partitions tokens exactly") {
    val docs = Seq((1L, (0 until 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkStride(docs, chunk = 4, stride = 4)
      .orderBy("chunk_id").collect()
    assert(got.map(_.getLong(1)).toSeq === Seq(0L, 1L, 2L))
    // token conservation and order-preserving reconstruction
    assert(got.map(_.getLong(2)).sum === 10L)
    assert(got.map(_.getString(3)).mkString(" ") ===
      (0 until 10).map(i => s"t$i").mkString(" "))
  }

  test("chunkStride on empty text emits one empty chunk, not an error") {
    // tokens() splits with limit -1, so "" tokenizes to [""] (size 1)
    // and the guarded sequence upper bound stays 0 — this pins both
    // today's behavior and the greatest(size-1, 0) guard that keeps a
    // future empty-filtering tokenizer from throwing "illegal
    // sequence boundaries"
    val got = TextAnalysis.chunkStride(
        Seq((1L, "")).toDF("doc_id", "text"), chunk = 4, stride = 4)
      .collect()
    assert(got.map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq === Seq((0L, 1L, "")))
  }

  test("chunkStride overlap covers every token and repeats the seam") {
    val docs = Seq((1L, (0 until 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    // chunk 6 / stride 4: starts 0,4,8 → [0..5], [4..9], [8..9]
    val got = TextAnalysis.chunkStride(docs, chunk = 6, stride = 4)
      .orderBy("chunk_id").collect()
    assert(got.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 6L), (1L, 6L), (2L, 2L)))
    assert(got(1).getString(3) === "t4 t5 t6 t7 t8 t9")
    // the 2-token overlap appears in both neighbors
    assert(got(0).getString(3).endsWith("t4 t5") &&
      got(1).getString(3).startsWith("t4 t5"))
  }

  test("kAnonymityAudit: class sizes sum to N, risky iff under k") {
    val docs = (0 until 40).map { i =>
      val lang = if (i < 36) "en" else "de" // de is a 4-doc class
      (i.toLong, lang, "src", 100 + (i % 2), s"text $i")
    }.toDF("doc_id", "lang", "source", "n_chars", "text")
    val got = Curation.kAnonymityAudit(docs, k = 5, band = 256).collect()
    assert(got.map(_.getLong(3)).sum === 40L)
    got.foreach { r =>
      assert(r.getBoolean(4) === (r.getLong(3) < 5L),
        s"risky flag wrong for $r")
    }
    // the 4-doc de class is the risky one
    val risky = got.filter(_.getBoolean(4))
    assert(risky.length === 1 && risky.head.getString(0) === "de")
  }
}
