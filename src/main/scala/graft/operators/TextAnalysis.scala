package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Text-analysis operators for a training-data pipeline: token/char
  * stats, heuristic language ID, quality scoring, and document
  * fingerprinting — each a narrow projection over the `documents` table.
  *
  * Scale design: every operator here is a pure per-row map (no shuffle,
  * no UDF, fully codegen'd), so it scales linearly with input splits;
  * column pruning means only `doc_id` + `text` are read from parquet.
  */
object TextAnalysis {

  /** Marker words per language for the n-gram-heuristic language ID.
    * Occurrence counting uses pure string arithmetic so the computation
    * is engine-portable (see oracle).
    */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> " the ", "de" -> " der ", "fr" -> " le ", "es" -> " el ")

  /** Token / character statistics incl. a BPE-ish regex token count. */
  def textStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("len_chars"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      size(array_distinct(tokens(col("text")))).cast("long").as("n_uniq_tokens"),
      regexp_count(col("text"), lit("[a-z0-9]+")).cast("long").as("n_word_tokens"))

  /** Heuristic language ID: count language-marker occurrences, then a
    * deterministic priority cascade (zh by CJK marker, then
    * en ≥ de ≥ fr ≥ es on ties).
    */
  def langId(docs: DataFrame): DataFrame = {
    val p = padded(col("text"))
    val scored = docs.select(
      (col("doc_id") +:
        occurrences(p, "的").as("s_zh") +:
        langMarkers.map { case (l, m) => occurrences(p, m).as(s"s_$l") }): _*)
    scored.withColumn(
      "lang_pred",
      when(col("s_zh") > 0, "zh")
        .when(col("s_en") >= greatest(col("s_de"), col("s_fr"), col("s_es")), "en")
        .when(col("s_de") >= greatest(col("s_fr"), col("s_es")), "de")
        .when(col("s_fr") >= col("s_es"), "fr")
        .otherwise("es"))
  }

  /** Quality scoring: type-token ratio, stopword ratio, length band.
    * Ratios are exact integer-over-integer double divisions — identical
    * bits in any IEEE-754 engine, so no rounding is needed for parity.
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("long")
    val nUniq = size(array_distinct(toks)).cast("long")
    val stops = occurrences(padded(col("text")), " the ")
    docs.select(
      col("doc_id"),
      nTok.as("n_tokens"),
      (nUniq.cast("double") / nTok.cast("double")).as("ttr"),
      (stops.cast("double") / nTok.cast("double")).as("stop_ratio"),
      when(nTok.between(20, 2000) &&
             (nUniq.cast("double") / nTok.cast("double")) > 0.2, "keep")
        .otherwise("drop").as("verdict"))
  }

  /** Document fingerprint: full md5 plus a 60-bit integer form usable as
    * a join/partition key.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(lower(col("text"))).as("fp"),
      hash60(lower(col("text"))).as("fp60"))
}
