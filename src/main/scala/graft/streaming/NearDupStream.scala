package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Dedup

/** NEAR-duplicate curate-at-ingest: [[CurationStream]]'s front door
  * upgraded from exact fingerprints to MinHash/LSH — a batch document
  * is dropped when its exact shingle Jaccard against an at-rest corpus
  * document (or a batch-mate) reaches `minJaccard`, so boilerplate
  * rewrites and near-copies die at the door, not in a nightly job.
  *
  * At-rest state is TWO parquet datasets, both append-only and written
  * by this stream: the corpus `(doc_id, text, fp)` (shared with
  * [[CurationStream]]) and a bands table `(doc_id, band, bkey)` — 8
  * rows per document, the precomputed LSH keys. The signatures are
  * computed ONCE per document at ingest; no batch ever re-shingles the
  * corpus.
  *
  * Per-batch shape (inside `foreachBatch`):
  *  1. quality gate + within-batch exact dedup ([[CurationStream
  *     .curateBatch]] — batch-sized);
  *  2. within-batch NEAR dedup ([[Dedup.minhashLshDedup]] on the batch
  *     alone: linear bucket→representative edges, exact-verified);
  *  3. against-corpus candidates: batch band keys that survive a
  *     [[CorpusBloom]] keyed on `band:bkey` (batches of novel content
  *     drop out map-side — the filter is sized from the bands table,
  *     updated in place with this stream's own appends) equi-join the
  *     at-rest bands table; the corpus is scanned, never shuffled —
  *     the batch side broadcasts;
  *  4. exact verify: candidate pairs fetch ONLY the implicated corpus
  *     docs (left-semi on doc_id) and re-shingle pair-scoped
  *     ([[Dedup.pairOverlap]] — the same verified-precision path every
  *     batch LSH operator uses); `jaccard >= minJaccard` drops the
  *     batch doc;
  *  5. append survivors to the corpus AND their bands to the bands
  *     table; fold the new band keys into the cached filter.
  *
  * Exactness: dropped docs are always verified by true Jaccard (LSH
  * and Bloom only PROPOSE); recall inherits MinHash banding — a pair
  * below the band-collision curve can slip through, the standard LSH
  * trade. Replayed batches land on identical signatures → identical
  * band keys → Jaccard 1.0 → dropped, so restarts converge like the
  * exact stream. Batch doc_ids must not collide with corpus doc_ids
  * (the ingest contract). A corpus that predates this stream has no
  * bands — run [[backfillBands]] once before `start`, or near-dups of
  * that untracked history are admitted.
  */
object NearDupStream {

  /** `band:bkey` as one filter key string. */
  private def bandKey = concat_ws(":", col("band"), col("bkey"))

  /** A [[CorpusBloom]] keyed for the bands table. */
  def bandsBloom(fpp: Double = 0.01, headroom: Long = 4,
                 minCapacity: Long = 1024L): CorpusBloom =
    new CorpusBloom(fpp, headroom, minCapacity, keyExpr = bandKey)

  /** One-time bands backfill for a corpus that PREDATES this stream
    * (e.g. built by [[CurationStream]]): without it, history has no
    * band keys, so near-dups of pre-existing documents would be
    * silently admitted. One corpus pass; run before `start`.
    */
  def backfillBands(spark: SparkSession, corpusDir: String,
                    bandsDir: String): Unit =
    Dedup.lshBands(Dedup.minhashSignatures(
        spark.read.parquet(corpusDir).select(col("doc_id"), col("text"))))
      .write.mode("overwrite").parquet(bandsDir)

  /** Drop near-duplicates from a curated batch: within-batch pairs
    * always; against the at-rest bands/corpus when they exist.
    */
  def dropNearDups(spark: SparkSession, curated: DataFrame,
                   corpusDir: String, bandsDir: String,
                   state: CorpusBloom, minJaccard: Double,
                   n: Int = 3): DataFrame = {
    val batchDocs = curated.select(col("doc_id"), col("text"))
    val selfDups = Dedup.minhashLshDedup(batchDocs, n, minJaccard)
      .select(col("doc_b").as("doc_id")).distinct()
    val afterSelf = curated.join(selfDups, Seq("doc_id"), "left_anti")

    val path = new Path(bandsDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasBands = fs.exists(path) &&
      fs.listStatus(path).exists(_.getPath.getName.endsWith(".parquet"))
    if (!hasBands) afterSelf
    else {
      val atRest = spark.read.parquet(bandsDir)
      val bloomBc = spark.sparkContext.broadcast(state.filterFor(atRest))
      val mightContain =
        udf((s: String) => s != null && bloomBc.value.mightContainString(s))
      val batchBands =
        Dedup.lshBands(Dedup.minhashSignatures(
            afterSelf.select(col("doc_id"), col("text")), n))
          .filter(mightContain(bandKey))
          .select(col("doc_id").as("doc_b"), col("band"), col("bkey"))
      // batch side broadcasts; the bands table streams past it
      val pairs = atRest
        .join(broadcast(batchBands), Seq("band", "bkey"))
        .select(col("doc_id").as("doc_a"), col("doc_b"))
        .distinct()
      // fetch only the implicated corpus docs, verify pair-scoped
      val corpusDocs = spark.read.parquet(corpusDir)
        .select(col("doc_id"), col("text"))
        .join(pairs.select(col("doc_a").as("doc_id")).distinct(),
          Seq("doc_id"), "left_semi")
      val union = corpusDocs
        .unionByName(afterSelf.select(col("doc_id"), col("text")))
      val confirmed = Dedup.pairOverlap(pairs, union, n)
        .withColumn("jaccard",
          col("common").cast("double") / col("uni").cast("double"))
        .filter(col("jaccard") >= minJaccard)
        .select(col("doc_b").as("doc_id")).distinct()
      afterSelf.join(confirmed, Seq("doc_id"), "left_anti")
    }
  }

  /** File-based JSON-lines source (`doc_id`, `text`) → quality gate →
    * exact in-batch dedup → near-dup (batch + corpus) → append docs +
    * bands. `state` must be [[bandsBloom]]-keyed.
    */
  def start(spark: SparkSession, inputDir: String, corpusDir: String,
            bandsDir: String, checkpoint: String,
            trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
            minJaccard: Double = 0.7,
            state: CorpusBloom = bandsBloom()): StreamingQuery =
    spark.readStream
      .schema("doc_id LONG, text STRING")
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val survivors = dropNearDups(spark,
            CurationStream.curateBatch(batch), corpusDir, bandsDir,
            state, minJaccard)
          .localCheckpoint()
        survivors.write.mode("append").parquet(corpusDir)
        val newBands = Dedup.lshBands(Dedup.minhashSignatures(
            survivors.select(col("doc_id"), col("text"))))
          .localCheckpoint()
        newBands.write.mode("append").parquet(bandsDir)
        // executor-side fold of the new band keys (one bit-array
        // merge); the band-key column never transits the driver
        state.recordAppendedFrom(newBands, bandKey)
      }
      .start()
}
