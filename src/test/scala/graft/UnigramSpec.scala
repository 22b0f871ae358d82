package graft

import org.apache.spark.sql.functions._
import graft.operators.Unigram

/** Unigram-LM tokenizer: Viterbi optimality and tiebreaks, coverage,
  * prune invariants, and encode/model consistency.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("viterbi picks the min-cost segmentation") {
    // "abc": a+bc = 10+5 = 15, ab+c = 3+20 = 23, a+b+c = 10+9+20 = 39,
    // abc = 16 → winner is a+bc (15)
    val costs = Map("a" -> 10L, "b" -> 9L, "c" -> 20L, "ab" -> 3L,
      "bc" -> 5L, "abc" -> 16L)
    val (cost, path) = Unigram.viterbi("abc", costs)
    assert(cost === 15L && path === " a bc")
  }

  test("equal-cost segmentations break ties by UTF-8 path order") {
    // "ab": a+b = 10, ab = 10 — ' a b' < ' ab' byte-wise (space < 'b')
    val costs = Map("a" -> 5L, "b" -> 5L, "ab" -> 10L)
    val (cost, path) = Unigram.viterbi("ab", costs)
    assert(cost === 10L && path === " a b")
  }

  test("single-char coverage keeps every corpus word segmentable") {
    val docs = Seq((1L, "zq zq xkcd"), (2L, "xkcd row row row"))
      .toDF("doc_id", "text")
    val enc = Unigram.encode(docs).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(enc.keySet === Set("zq", "xkcd", "row"))
    // concatenating the chosen pieces reconstructs each word
    enc.foreach { case (w, pieces) =>
      assert(pieces.split(" ").mkString("") === w, s"$w -> $pieces")
    }
  }

  test("model respects the vocab budget and floors single-char counts") {
    val docs = Seq((1L, "alpha beta gamma alpha beta alpha"))
      .toDF("doc_id", "text")
    val model = Unigram.train(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(model.length <= Unigram.VocabSize + model.count(_._1.length == 1))
    assert(model.filter(_._1.length == 1).forall(_._2 >= 1L))
    // only USED multi-char pieces survive the prune (chars are the
    // coverage floor; everything else must have earned usage)
    assert(model.filter(_._1.length > 1).forall(_._2 > 0L))
    assert(model.forall(_._1.length <= Unigram.MaxPieceLen))
    // every piece's cost is the integer grid value for its count
    val total = model.map(_._2).sum
    model.foreach { case (_, cnt, cost) =>
      assert(cost ===
        Math.round(Math.log(total.toDouble / cnt.toDouble) * 1e6))
    }
  }

  test("encode cost equals the sum of chosen piece costs") {
    val docs = Seq((1L, "delta echo delta foxtrot echo delta"))
      .toDF("doc_id", "text")
    val model = Unigram.train(docs).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    Unigram.encode(docs).collect().foreach { r =>
      val pieces = r.getString(2).split(" ")
      assert(r.getLong(4) === pieces.map(model).sum, r.toString)
      assert(r.getLong(3) === pieces.length.toLong)
    }
  }
}
