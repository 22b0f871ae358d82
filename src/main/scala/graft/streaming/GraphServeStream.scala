package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Online serving from the at-rest graph-ANN index — the query side
  * of the vector store gone streaming (18th streaming operator):
  * query vectors arrive as a stream, and every micro-batch is
  * answered by the SAME fixed-round greedy walk as the batch operator
  * ([[graft.operators.Similarity.graphTopKAtRest]] against a
  * [[graft.operators.Similarity.graphWriteAtRest]] layout), so a
  * query answered online and the same query answered in a batch job
  * return bit-identical rows (`GraphServeStreamSpec` pins the twin
  * and batch-split invariance — the answer depends only on the query
  * vector and the immutable index, never on batch boundaries).
  *
  * Scale: per-batch cost ∝ the batch — the walk reads bucket-pruned
  * adjacency and node files sized by the batch's frontier, never the
  * corpus; the ≤4096 anchor rule bounds each batch's query count
  * (size triggers accordingly). The index is immutable at rest;
  * [[IvfStream]] is the load-drift monitor that says when to rebuild
  * it. Restart semantics are at-least-once (the foreachBatch caveat
  * [[CurationStream]] documents): a replayed batch re-appends its
  * answers — identical rows, keyed (q_id, rn) downstream.
  */
object GraphServeStream {

  /** Wire a streaming query-vector relation (`vec_id`, `embedding`)
    * to the walk; answers append to `outDir` as parquet.
    */
  def start(spark: SparkSession, queries: DataFrame, indexPath: String,
            centroids: DataFrame, outDir: String, checkpoint: String,
            beam: Int, rounds: Int, k: Int,
            trigger: Trigger = Trigger.ProcessingTime("5 seconds"))
      : StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Similarity
          .graphTopKAtRest(spark, indexPath, batch, centroids,
            beam, rounds, k)
          .write.mode("append").parquet(outDir)
      }
      .start()
}
