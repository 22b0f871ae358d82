package graft.streaming

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TextAnalysis

/** Model-broadcast LM gating at the corpus door — the streaming half
  * of CCNet-style filtering (Wenzek et al. 2020 train KenLM offline
  * and SHIP THE MODEL to the workers that score incoming shards; the
  * model is never rebuilt per shard). Here the offline model is the
  * add-one-smoothed conditional bigram table behind
  * [[graft.operators.TextAnalysis.bigramLmScore]], pruned to the
  * top-`maxBigrams` bigrams by count, and each micro-batch of raw
  * documents is scored against the BROADCAST model — per-batch cost is
  * proportional to batch size, never to corpus or model-training size.
  *
  * Scoring semantics match the batch operator exactly for every bigram
  * the pruned model retains; pruned-away bigrams fall back to the
  * unsmoothed floor 1/(c(w₁·)+V) when the context survives pruning and
  * 1/V when even the context was pruned — the standard
  * stupid-backoff-style degradation of a shipped, size-bounded model.
  * Scores use the same quantize-to-DECIMAL(38,18)-then-sum discipline
  * (executor-side BigDecimal), so a batch scored twice (foreachBatch
  * replay) lands the identical ppm and the gate decision is
  * deterministic.
  *
  * 100 TB shape: the model is two hash maps totalling
  * O(maxBigrams + maxContexts) — BOTH tables are capped (round 8
  * collected every distinct w1, which is vocabulary-scaled and
  * unbounded on web text), so the broadcast stays megabytes no matter
  * the training corpus; scoring is a typed narrow map (zero shuffles,
  * zero state store); the gate verdict rides the same micro-batch
  * append discipline as the other door streams.
  */
object LmGateStream {

  /** A shipped bigram LM: pruned (w1,w2)→count, pruned context→count,
    * vocabulary size. Built offline, broadcast to score streams.
    */
  final case class BigramModel(bigrams: Map[(String, String), Long],
                               contexts: Map[String, Long],
                               vocab: Long) extends Serializable

  /** Train the model on a static corpus with BOTH tables capped:
    * bigrams pruned to the top-`maxBigrams` by (count desc, w1, w2),
    * contexts pruned to the top-`maxContexts` by (count desc, w1) —
    * deterministic truncations — UNIONED with the w1 set of retained
    * bigrams, so every retained bigram still scores with its EXACT
    * denominator (a retained numerator over a pruned denominator
    * would silently change the score). Model size is therefore
    * O(maxBigrams + maxContexts) regardless of corpus vocabulary; a
    * pruned-away context scores its bigrams at the documented 1/V
    * floor (c12 and c1 both read 0).
    */
  def train(docs: DataFrame, maxBigrams: Int,
            maxContexts: Int): BigramModel = {
    val toks = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("w"))
    val bg = toks.filter(size(col("w")) >= 2)
      .select(explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val top = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(maxBigrams)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ctxAll = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val ctxHead = ctxAll.orderBy(col("c1").desc, col("w1"))
      .limit(maxContexts)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact denominators for retained bigrams whose context fell
    // outside the head: ≤ maxBigrams extra entries, fetched with a
    // map-side InSet filter (no shuffle, no extra pass over bg)
    val missing = top.keysIterator.map(_._1).toSet.diff(ctxHead.keySet)
    val ctxTail =
      if (missing.isEmpty) Map.empty[String, Long]
      else ctxAll.filter(col("w1").isInCollection(missing))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val v = toks.select(explode(col("w")).as("word"))
      .agg(countDistinct(col("word"))).head().getLong(0)
    BigramModel(top, ctxHead ++ ctxTail, math.max(v, 1L))
  }

  /** Score one batch against the broadcast model: (doc_id, n_bigrams,
    * lm_ppm, verdict) with `keep` iff lm_ppm >= minPpm. Docs with
    * fewer than 2 tokens have no evidence either way — they keep with
    * n_bigrams = 0 (quality length-gates are a different operator's
    * job). Pure narrow map over the batch.
    */
  def scoreBatch(batch: DataFrame, model: Broadcast[BigramModel],
                 minPpm: Double): DataFrame = {
    import batch.sparkSession.implicits._
    val scored = batch.select(col("doc_id").cast("long").as[Long],
        col("text").as[String])
      .mapPartitions { rows =>
        val m = model.value
        rows.map { case (id, text) =>
          val w = text.split(" ", -1)
          if (w.length < 2) (id, 0L, -1.0)
          else {
            var sum = java.math.BigDecimal.ZERO
            var i = 0
            while (i < w.length - 1) {
              val c1 = m.contexts.getOrElse(w(i), 0L)
              val c12 = m.bigrams.getOrElse((w(i), w(i + 1)), 0L)
              val ratio = (c12 + 1.0) / (c1 + m.vocab)
              // same DECIMAL(38,18) quantization as the batch operator:
              // the sum is exact, order-free, replay-deterministic
              sum = sum.add(new java.math.BigDecimal(ratio)
                .setScale(18, java.math.RoundingMode.HALF_UP))
              i += 1
            }
            (id, (w.length - 1).toLong,
              sum.doubleValue() * 1000000.0 / (w.length - 1))
          }
        }
      }.toDF("doc_id", "n_bigrams", "lm_ppm")
    scored.withColumn("verdict",
      when(col("n_bigrams") === 0 || col("lm_ppm") >= minPpm, "keep")
        .otherwise("lm_reject"))
  }

  /** Run the gate as a stream over a JSONL drop directory (same
    * source convention as [[CurationStream]]): score each micro-batch
    * against the pre-trained broadcast model, append keepers to
    * `corpusDir` and rejects (with their scores) to `quarantineDir`.
    */
  def start(spark: SparkSession, inputDir: String, model: BigramModel,
            minPpm: Double, corpusDir: String, quarantineDir: String,
            checkpoint: String,
            trigger: Trigger = Trigger.ProcessingTime("5 seconds"))
      : StreamingQuery = {
    val bc = spark.sparkContext.broadcast(model)
    spark.readStream
      .schema("doc_id LONG, text STRING")
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // one scoring pass feeds both sinks: pin it (same discipline
        // as CurationStream's survivors)
        val scored = batch
          .join(scoreBatch(batch, bc, minPpm), "doc_id")
          .select(col("doc_id"), col("text"), col("n_bigrams"),
            col("lm_ppm"), col("verdict"))
          .localCheckpoint()
        scored.filter(col("verdict") === "keep")
          .drop("verdict").write.mode("append").parquet(corpusDir)
        scored.filter(col("verdict") =!= "keep")
          .drop("verdict").write.mode("append").parquet(quarantineDir)
        ()
      }
      .start()
  }
}
