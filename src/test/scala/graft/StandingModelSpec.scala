package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

import graft.operators.{Curation, TextAnalysis}

/** Standing-model layouts == their scan-time twins, bit for bit — the
  * contract that lets the declared queries resolve trained state from
  * fingerprint-keyed layouts (NB vote table, the shared bigram/KN
  * count tables) instead of re-aggregating per query: the stored
  * counts ARE the aggregates, so every downstream double is the same
  * fixed-shape tree over the same integers. Staleness: a regenerated
  * corpus (same ids, changed text) must retrain, never score under
  * stale counts.
  */
class StandingModelSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = graft.core.Tables.read(spark, sf, "documents")
  private lazy val label =
    expr("size(split(text, ' '))").between(50, 100000)

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("NB standing score and AUC equal the scan-time forms, and retrain on regeneration") {
    val path = Files.createTempDirectory("graft-nbmodel").toString
    val scan = Curation.nbQualityScore(docs, 64, label)
    val standing = Curation.nbQualityScoreStanding(docs, 64, path, label)
    assert(rows(standing) === rows(scan))
    assert(rows(standing).nonEmpty)
    assert(Curation.nbModelFresh(spark, path, docs, 64))
    // a different bucket count must not reuse the layout
    assert(!Curation.nbModelFresh(spark, path, docs, 32))
    assert(rows(Curation.nbAucStanding(docs, 64, path, label)) ===
      rows(Curation.nbAuc(docs, 64, label)))
    // regeneration: same ids, changed text — stale, retrains, and the
    // standing result tracks the NEW corpus
    val regen = docs.withColumn("text",
      expr("concat(text, ' zz')"))
    assert(!Curation.nbModelFresh(spark, path, regen, 64))
    assert(rows(Curation.nbQualityScoreStanding(regen, 64, path, label))
      === rows(Curation.nbQualityScore(regen, 64, label)))
    assert(Curation.nbModelFresh(spark, path, regen, 64))
  }

  test("add-one LM, CCNet buckets, and KN score share one standing layout and equal scan-time") {
    val path = Files.createTempDirectory("graft-lmmodel").toString
    assert(rows(TextAnalysis.bigramLmScoreAtRest(docs, path)) ===
      rows(TextAnalysis.bigramLmScore(docs)))
    // the first call built the layout; the KN and tier forms resolve
    // from it without retraining (fingerprint-fresh)
    assert(TextAnalysis.knModelFresh(spark, path, docs))
    assert(rows(TextAnalysis.knSmoothedLmScoreStanding(docs, path)) ===
      rows(TextAnalysis.knSmoothedLmScore(docs)))
    assert(rows(TextAnalysis.ccnetBucketsAtRest(docs, path)) ===
      rows(TextAnalysis.ccnetBuckets(docs)))
  }

  test("cross-corpus LM standing model keys on the TRAIN slice and equals scan-time") {
    val path = Files.createTempDirectory("graft-lmcross").toString
    val isTrain = expr("cast(substr(source, 4) as int) < 10")
    val (tr, sc) = (docs.filter(isTrain), docs.filter(!isTrain))
    assert(rows(TextAnalysis.bigramLmCrossScoreAtRest(tr, sc, path)) ===
      rows(TextAnalysis.bigramLmCrossScore(tr, sc)))
    assert(TextAnalysis.knModelFresh(spark, path, tr))
    // scoring a DIFFERENT slice against the standing reference model
    // reuses it (the deployed-CCNet shape: one reference, many crawls)
    val sc2 = sc.limit(50)
    assert(rows(TextAnalysis.bigramLmCrossScoreAtRest(tr, sc2, path)) ===
      rows(TextAnalysis.bigramLmCrossScore(tr, sc2)))
  }

  test("a pre-vocab layout reads stale and rebuilds (format migration)") {
    val path = Files.createTempDirectory("graft-lmlegacy").toString
    TextAnalysis.knModelWrite(docs, path)
    assert(TextAnalysis.knModelFresh(spark, path, docs))
    // strip the vocab table — the pre-r17 format
    val vocabP = new org.apache.hadoop.fs.Path(s"$path/vocab")
    vocabP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(vocabP, true)
    assert(!TextAnalysis.knModelFresh(spark, path, docs))
    // the build-if-stale convenience recovers it
    assert(rows(TextAnalysis.bigramLmScoreAtRest(docs, path)) ===
      rows(TextAnalysis.bigramLmScore(docs)))
  }
}
