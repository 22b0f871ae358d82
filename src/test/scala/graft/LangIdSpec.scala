package graft

import org.apache.spark.sql.functions._
import graft.functions.LangIdModel
import graft.operators.TextAnalysis

/** Fixture-trained char-bigram NB language ID: model hygiene (splits
  * disjoint, weights deterministic and integer), a perfect diagonal on
  * the held-out split, and honest behavior on signal-free text.
  */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  test("train and held-out splits are disjoint and cover all languages") {
    val train = LangIdModel.Train.map(_._2).toSet
    val held = LangIdModel.HeldOut.map(_._2).toSet
    assert(train.intersect(held).isEmpty, "evaluation rows leaked into train")
    assert(LangIdModel.Train.map(_._1).toSet === LangIdModel.Langs.toSet)
    assert(LangIdModel.HeldOut.map(_._1).toSet === LangIdModel.Langs.toSet)
  }

  test("model weights are deterministic, sorted, and negative log-probs") {
    val (vocab, oov) = (LangIdModel.vocab, LangIdModel.oov)
    assert(vocab.map(_._1) === vocab.map(_._1).sorted)
    assert(vocab.map(_._1).distinct.size === vocab.size)
    // every weight is a ln-probability scaled by 2^20: strictly negative,
    // and never below the OOV floor for its language
    vocab.foreach { case (g, ws) =>
      ws.zipWithIndex.foreach { case (w, i) =>
        assert(w < 0L, s"gram $g lang ${LangIdModel.Langs(i)}: weight $w")
        assert(w >= oov(i), s"gram $g below OOV floor")
      }
    }
  }

  test("held-out fixture classifies with a perfect diagonal") {
    val conf = TextAnalysis.langIdFixtureConfusion(spark)
      .select(col("lang_true"), col("lang_pred"), col("n"))
      .as[(String, String, Long)].collect()
    assert(conf.length === 5, s"off-diagonal rows present: ${conf.toSeq}")
    conf.foreach { case (t, p, n) =>
      assert(t === p && n === 5L, s"confusion row ($t, $p, $n)")
    }
  }

  test("single-language free text routes to its language") {
    val rows = Seq(
      (1L, "das haus steht seit vielen jahren neben dem alten fluss"),
      (2L, "the house has been standing beside the old river for years"),
      (3L, "la casa lleva muchos años junto al viejo río"),
      (4L, "la maison se trouve depuis des années près du vieux fleuve"),
      (5L, "这座房子在老河边已经很多年了"))
      .toDF("doc_id", "text")
    val pred = TextAnalysis.langIdOn(rows, "doc_id", "text")
      .select(col("doc_id"), col("lang_pred"))
      .as[(Long, String)].collect().toMap
    assert(pred === Map(1L -> "de", 2L -> "en", 3L -> "es",
      4L -> "fr", 5L -> "zh"))
  }

  test("scores are exact integers so ties cannot drift between engines") {
    val docs = Seq((1L, "abc abc abc")).toDF("doc_id", "text")
    val row = TextAnalysis.langId(docs)
      .select(col("s_de"), col("s_en"), col("s_es"), col("s_fr"), col("s_zh"))
      .head()
    (0 until 5).foreach(i => assert(row.get(i).isInstanceOf[Long]))
  }
}
