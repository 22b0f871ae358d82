package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, Similarity, TextAnalysis}

/** Unit behavior of the round-3 curation operators: stratified
  * sampling, repetition-quality stats, PII scrubbing, and int8
  * quantization. Oracle parity is covered by the declared queries;
  * these pin the hand-checkable semantics.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("stratified draws exactly k per stratum, deterministically") {
    val docs = (0 until 200).map(i => (i.toLong, s"lang${i % 4}"))
      .toDF("doc_id", "lang")
    val got = Sampling.stratified(docs, "lang", "doc_id", 5)
    val perStratum = got.groupBy("lang").count().collect()
    assert(perStratum.length === 4)
    assert(perStratum.forall(_.getLong(1) === 5L))
    // deterministic: same input → same member set
    val again = Sampling.stratified(docs, "lang", "doc_id", 5)
    assert(got.select("doc_id").except(again.select("doc_id")).count() === 0L)
    // ranks are 1..k within each stratum
    assert(got.agg(min("sample_rank"), max("sample_rank")).head()
      .toSeq === Seq(1L, 5L))
  }

  test("stratified with k >= stratum size returns the whole stratum") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "lang")
    assert(Sampling.stratified(docs, "lang", "doc_id", 10).count() === 3L)
  }

  test("repetitionStats flags a repeated-bigram doc, keeps a clean one") {
    val docs = Seq(
      (1L, "spam spam spam spam spam"),          // one bigram repeated 4x
      (2L, "one two three four five six seven"), // all bigrams unique
      (3L, "solo")                                // < 2 tokens: no row
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.size === 2)
    val r1 = got(1L)
    assert(r1.getAs[Long]("n_grams") === 4L)
    assert(r1.getAs[Long]("top_gram") === 4L)
    assert(r1.getAs[Double]("top_frac") === 1.0)
    assert(r1.getAs[Double]("dup_frac") === 1.0)
    assert(r1.getAs[String]("verdict") === "drop")
    val r2 = got(2L)
    assert(r2.getAs[Long]("n_grams") === 6L)
    assert(r2.getAs[Long]("dup_grams") === 0L)
    assert(r2.getAs[String]("verdict") === "keep")
  }

  test("scrubPii redacts and counts emails, IPs, digit runs in stages") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org from 192.168.1.250 call 5551234567"),
      (2L, "nothing sensitive here"),
      (3L, "two mails a@b.co c@d.io ip 10.0.0.1 and 8.8.8.8")
    ).toDF("id", "text")
    val got = TextAnalysis.scrubPii(df, "id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert(r1.getAs[Long]("n_emails") === 1L)
    assert(r1.getAs[Long]("n_ips") === 1L)
    assert(r1.getAs[Long]("n_digit_runs") === 1L)
    assert(r1.getAs[String]("scrubbed") ===
      "mail <EMAIL> from <IP> call <NUM>")
    assert(got(2L).getAs[String]("scrubbed") === "nothing sensitive here")
    val r3 = got(3L)
    assert(r3.getAs[Long]("n_emails") === 2L)
    assert(r3.getAs[Long]("n_ips") === 2L)
    assert(r3.getAs[String]("scrubbed") ===
      "two mails <EMAIL> <EMAIL> ip <IP> and <IP>")
  }

  test("quantizeInt8 bounds values to [-127,127] and zeroes zero vectors") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert(r1.getAs[Double]("scale") === 1.0 / 127)
    // max-magnitude element maps to ±127; others scale linearly
    assert(r1.getAs[Seq[Long]]("qvec") === Seq(64L, -127L, 32L, 0L))
    val r2 = got(2L)
    assert(r2.getAs[Double]("scale") === 0.0)
    assert(r2.getAs[Seq[Long]]("qvec") === Seq(0L, 0L, 0L, 0L))
  }

  test("int8TopK ranks a near-identical vector above an orthogonal one") {
    val corpus = Seq(
      (10L, Array(1.0f, 0.01f, 0.0f, 0.0f)),
      (11L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (12L, Array(0.9f, 0.1f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val query = Seq((1L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.int8TopK(corpus, query, 2)
      .orderBy("rn").select("vec_id").as[Long].collect()
    assert(got.toSeq === Seq(10L, 12L))
  }
}
