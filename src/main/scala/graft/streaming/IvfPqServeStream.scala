package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Similarity

/** Online serving from the self-contained at-rest IVFPQ index — the
  * [[IvfServeStream]] story on the COMPRESSED tier (20th streaming
  * operator), the one a 100 TB deployment actually serves from: the
  * probed cells' bytes are `m` small ints per vector instead of the
  * full embedding. Every micro-batch is answered by the SAME
  * partition-pruned probe as the batch operator
  * ([[graft.operators.Similarity.ivfPqTopKAtRest]] against an
  * [[graft.operators.Similarity.ivfPqWriteIndex]] layout), with BOTH
  * trained components resolved from the layout — the stored coarse
  * quantizer assigns the query probes and the stored codebooks score
  * the codes; retraining either at serve time would decode the stored
  * codes under the wrong model (`IvfPqServeStreamSpec` pins the
  * streaming == batch twin and batch-split invariance).
  *
  * Scale: per-batch cost ∝ the batch — file-level PartitionFilters
  * prune to the batch's probed cells (≈ nProbe/√n of directories),
  * the codebooks are a ≤4096-row driver-side literal (the
  * [[graft.operators.Similarity.ivfPqStoredBooks]] read bound,
  * enforced at write time too), and the only other collect is the
  * probed-cell id set (≤1024 by the cell cap). Restart semantics are
  * at-least-once with replay pinned to the originally-resolved
  * version ([[GraphServeStream.pinnedVersion]]), exactly the graph
  * and IVF tiers' contract.
  */
object IvfPqServeStream {

  private def serveBatch(spark: SparkSession, batch: DataFrame,
                         indexPath: String, outDir: String,
                         nProbe: Int, k: Int, maxEpoch: Long,
                         indexVersion: Option[Int]): Unit = {
    import org.apache.spark.sql.functions.lit
    // ivfPqStoredBooks's default expectEncoding guards this read: a
    // residual layout resolved here refuses to serve rather than
    // silently scoring residual codes as raw
    val answered = Similarity.ivfPqTopKAtRest(spark, s"$indexPath/codes",
      batch, Similarity.ivfStoredCentroids(spark, indexPath),
      Similarity.ivfPqStoredBooks(spark, indexPath), nProbe, k, maxEpoch)
    indexVersion.fold(answered)(v =>
        answered.withColumn("index_version", lit(v)))
      .write.mode("append").parquet(outDir)
  }

  /** Wire a streaming query-vector relation (`vec_id`, `embedding`)
    * to the probe against a FIXED [[graft.operators.Similarity
    * .ivfPqWriteIndex]] layout; answers append to `outDir` as parquet.
    * Fixed but not static: [[graft.operators.Similarity
    * .ivfPqAppendDelta]] may grow the layout mid-stream — each batch
    * pins the current append epoch ([[GraphServeStream.pinnedRecord]])
    * and probes `epoch <=` it, so appended vectors are findable at
    * the next batch while checkpoint replays reproduce their original
    * rows exactly.
    */
  def start(spark: SparkSession, queries: DataFrame, indexPath: String,
            outDir: String, checkpoint: String, nProbe: Int, k: Int,
            trigger: Trigger = Trigger.ProcessingTime("5 seconds"))
      : StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val e = GraphServeStream.pinnedRecord(spark, outDir, batchId,
          Similarity.indexEpoch(spark, indexPath).toString).toLong
        serveBatch(spark, batch, indexPath, outDir, nProbe, k,
          maxEpoch = e, indexVersion = None)
      }
      .start()

  /** Serve from a VERSIONED index root
    * ([[graft.operators.Similarity.ivfPqPublishVersion]] layouts):
    * each micro-batch resolves the highest `_PUBLISHED` version ONCE,
    * pins it in the batchId-keyed sidecar
    * ([[GraphServeStream.pinnedVersion]]), probes under that
    * version's OWN stored quantizer and codebooks, and tags answers
    * `index_version`. A rebuild landing mid-stream — which may change
    * the cell count AND retrain every codebook — takes effect
    * atomically at the next batch; an in-flight batch never mixes
    * versions' models.
    */
  def startVersioned(spark: SparkSession, queries: DataFrame,
                     indexRoot: String, outDir: String,
                     checkpoint: String, nProbe: Int, k: Int,
                     trigger: Trigger = Trigger.ProcessingTime("5 seconds"))
      : StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // one atomic pin carries version AND append epoch — replay
        // sees neither a newer rebuild nor later-appended rows
        val rec = GraphServeStream.pinnedRecord(spark, outDir, batchId, {
          val v = Similarity.graphCurrentVersion(spark, indexRoot)
            .getOrElse(throw new IllegalStateException(
              s"no published index version under $indexRoot"))
          val e = Similarity.indexEpoch(spark,
            Similarity.graphVersionPath(indexRoot, v))
          s"$v:$e"
        })
        // tolerant parse (the GraphServeStream rule): a legacy
        // pinnedVersion sidecar holds "<version>" with no epoch —
        // replay of a pre-upgrade batch pins epoch 0 (the build)
        // instead of crashing on a MatchError
        val p = rec.split(":")
        val v = p(0).toInt
        val e = if (p.length > 1) p(1).toLong else 0L
        serveBatch(spark, batch,
          Similarity.graphVersionPath(indexRoot, v), outDir,
          nProbe, k, maxEpoch = e, indexVersion = Some(v))
      }
      .start()
}
