package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.{Decontaminate, Dedup, TextAnalysis}

/** Curate-at-ingest: the streaming front door of the training-data
  * pipeline. Each micro-batch of raw documents is quality-gated,
  * deduplicated within the batch, deduplicated against the AT-REST
  * corpus, and only the survivors are appended — so the corpus parquet
  * is duplicate-free by construction and downstream batch jobs never
  * re-clean history.
  *
  * Per-batch shape (all inside `foreachBatch`):
  *  1. quality verdicts ([[TextAnalysis.qualityScore]]) — stateless
  *     codegen projections, embarrassingly parallel;
  *  2. within-batch exact dedup — keep the smallest doc_id per
  *     fingerprint (one batch-local shuffle, batch-sized);
  *  3. corpus dedup via [[Dedup.dedupAgainstCorpus]] — Bloom
  *     prefilter broadcast from the at-rest side, confirm join kills
  *     false positives; the CORPUS IS NEVER SHUFFLED, so batch cost
  *     stays proportional to batch size as the corpus grows to 100 TB
  *     (one corpus scan per batch for the Bloom build; cache the
  *     filter across batches when the corpus only grows through this
  *     stream);
  *  4. append survivors `(doc_id, text, fp)`.
  *
  * Semantics are at-least-once on restart (foreachBatch may replay the
  * in-flight batch), but replayed rows are duplicates BY FINGERPRINT of
  * what step 4 already landed — step 3 drops them on the replay, so
  * the corpus converges to exactly-once content; only a crash INSIDE
  * step 4's append can leave a partial batch, the standard
  * foreachBatch caveat.
  */
object CurationStream {

  /** Keep verdicts + fingerprint for one raw batch: (doc_id, text, fp),
    * quality-kept and batch-locally deduplicated (smallest doc_id per
    * fingerprint wins, matching [[Dedup.exact]]'s keeper policy).
    */
  def curateBatch(batch: DataFrame): DataFrame = {
    val kept = batch
      .join(TextAnalysis.qualityScore(batch)
        .select(col("doc_id"), col("verdict")), "doc_id")
      .filter(col("verdict") === "keep")
      .select(col("doc_id"), col("text"),
        md5(lower(col("text"))).as("fp"))
    kept.join(
      kept.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id")),
      Seq("fp", "doc_id"), "left_semi")
  }

  /** Drop batch rows whose fingerprint already exists in the corpus
    * parquet at `corpusDir` (no-op when the corpus doesn't exist yet).
    *
    * With `state` (the streaming path), the Bloom prefilter comes from
    * the cross-batch [[CorpusBloom]] — sized from the corpus, updated
    * with this stream's own appends, rebuilt only on material growth —
    * so steady-state batches pay no corpus scan for the filter.
    * Without it (the pure-function path), the filter is rebuilt from
    * the corpus on every call.
    */
  def dropKnown(spark: SparkSession, curated: DataFrame,
                corpusDir: String,
                state: Option[CorpusBloom] = None): DataFrame = {
    val path = new Path(corpusDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasCorpus = fs.exists(path) &&
      fs.listStatus(path).exists(_.getPath.getName.endsWith(".parquet"))
    if (!hasCorpus) curated
    else {
      val corpus = spark.read.parquet(corpusDir)
      val newDocs = curated.select(col("doc_id"), col("text"))
      val dupes = state match {
        case Some(cb) =>
          Dedup.dedupAgainstCorpus(newDocs, corpus, cb.filterFor(corpus))
        case None => Dedup.dedupAgainstCorpus(newDocs, corpus)
      }
      curated.join(dupes.select(col("doc_id")), Seq("doc_id"), "left_anti")
    }
  }

  /** File-based JSON-lines source (`doc_id`, `text`) → curate →
    * dedup-against-corpus → append. A DSv2 or Kafka source slots in
    * unchanged — only `readStream` differs.
    *
    * `state` carries the corpus Bloom filter ACROSS micro-batches:
    * each batch's survivor fingerprints are folded in after the
    * append via an executor-built filter merged bitwise
    * ([[CorpusBloom.recordAppendedFrom]] — nothing row-sized crosses
    * the driver), so the filter stays a superset of the corpus with
    * no per-batch rebuild and gets resized from an actual corpus scan
    * only when growth exceeds its design capacity.
    */
  def start(spark: SparkSession, inputDir: String, corpusDir: String,
            checkpoint: String,
            trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
            state: CorpusBloom = new CorpusBloom(),
            evalSet: Option[DataFrame] = None,
            deconTau: Double = 0.95): StreamingQuery = {
    // with an eval set, the ingest schema carries the document's
    // embedding and step 0 is the SEMANTIC DECONTAMINATION gate
    // ([[graft.operators.Decontaminate.semanticKeep]]): eval vectors
    // inline as literals (≤4096, the broadcast-the-eval-side
    // discipline), so benchmark-adjacent documents are dropped at the
    // door by one zero-shuffle projection+filter — the same replay
    // story as quality (a pure function of the row), so at-least-once
    // replays converge identically
    val schema =
      if (evalSet.isDefined)
        "doc_id LONG, text STRING, embedding ARRAY<FLOAT>"
      else "doc_id LONG, text STRING"
    spark.readStream
      .schema(schema)
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val gated = evalSet.fold(batch)(ev =>
          Decontaminate.semanticKeep(batch, ev, deconTau))
        // survivors feed the append AND the filter update: pin them so
        // the curate+dedup pipeline runs once, not once per consumer
        val survivors =
          dropKnown(spark, curateBatch(gated), corpusDir, Some(state))
            .localCheckpoint()
        survivors.write.mode("append").parquet(corpusDir)
        // executor-side fold: one bit-array merge, never a raw-column
        // collect — batch fingerprints stay off the driver
        state.recordAppendedFrom(survivors, col("fp"))
      }
      .start()
  }
}
