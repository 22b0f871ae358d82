package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Dedup

/** Full intake-at-the-door: the STREAMING form of the
  * `pipeline_intake_dump` capstone — every micro-batch of a landing
  * dump is quality-gated, exact- and NEAR-deduplicated within the
  * batch and against the at-rest corpus ([[NearDupStream]]'s whole
  * chain), then DECONTAMINATED against a held-out benchmark/eval set
  * before anything is appended. The corpus stays clean AND
  * leakage-free by construction; no nightly decontamination sweep ever
  * has to rewrite history.
  *
  * The eval set is static and benchmark-sized (thousands of docs vs a
  * growing corpus): its distinct shingles are computed ONCE at stream
  * construction and pinned (eager localCheckpoint), so each batch pays
  * one broadcast hash join against a cached frame — the eval parquet
  * is never re-read and never re-shingled. A batch document sharing
  * `minOverlap`+ distinct `n`-grams with ANY eval document is dropped
  * (the GPT-3-style collision rule, same shingling as the dedup tier
  * so the two gates agree on tokenization).
  *
  * Everything else — at-least-once replay converging to exactly-once
  * content, the bands table contract, the cross-batch
  * [[CorpusBloom]] — is inherited unchanged from [[NearDupStream]].
  */
object IntakeStream {

  private def bandKey = concat_ws(":", col("band"), col("bkey"))

  def start(spark: SparkSession, inputDir: String, corpusDir: String,
            bandsDir: String, evalDir: String, checkpoint: String,
            trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
            minJaccard: Double = 0.7, minOverlap: Int = 2, n: Int = 3,
            state: CorpusBloom = NearDupStream.bandsBloom()): StreamingQuery = {
    val evalSh = Dedup.shingleRows(
        spark.read.parquet(evalDir).select(col("doc_id"), col("text")), n)
      .select(col("doc_id").as("eval_id"), col("shingle"))
      .localCheckpoint(eager = true)
    spark.readStream
      .schema("doc_id LONG, text STRING")
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val afterDedup = NearDupStream.dropNearDups(spark,
          CurationStream.curateBatch(batch), corpusDir, bandsDir,
          state, minJaccard, n)
        val contaminated = Dedup.shingleRows(
            afterDedup.select(col("doc_id"), col("text")), n)
          .join(broadcast(evalSh), "shingle")
          .groupBy(col("doc_id"), col("eval_id"))
          .agg(count(lit(1)).as("n_overlap"))
          .filter(col("n_overlap") >= minOverlap)
          .select(col("doc_id")).distinct()
        val survivors = afterDedup
          .join(contaminated, Seq("doc_id"), "left_anti")
          .localCheckpoint()
        survivors.write.mode("append").parquet(corpusDir)
        val newBands = Dedup.lshBands(Dedup.minhashSignatures(
            survivors.select(col("doc_id"), col("text")), n))
          .localCheckpoint()
        newBands.write.mode("append").parquet(bandsDir)
        state.recordAppendedFrom(newBands, bandKey)
      }
      .start()
  }
}
