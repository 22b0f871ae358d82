package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.TextFunctions.hash60

/** Streaming per-language weighted reservoir (Efraimidis & Spirakis
  * 2006 — the paper is literally ABOUT streams): maintain, per
  * language, the k documents with the largest weighted keys
  * u^(1/w) seen so far, where u is md5-derived from doc_id.
  *
  * Because the E-S key of a row depends on the ROW ALONE (no batch
  * randomness, no order dependence), the reservoir is an exact
  * distributive top-k: merging per-batch winners into the at-rest
  * reservoir and re-truncating to k is BIT-IDENTICAL to running the
  * batch sampler over the full corpus in one shot, in any batch
  * order, with any restarts. `ReservoirStreamSpec` proves stream ≡
  * batch on a three-way split, which is the whole correctness story —
  * no "approximately representative" hedging.
  *
  * Per-batch shape (inside `foreachBatch`):
  *  1. per-batch E-S keys — a pure projection;
  *  2. per-(lang) batch top-k via a window over BATCH rows only;
  *  3. merge with the ≤ |langs|·k at-rest reservoir rows and
  *     re-truncate per lang — the state side is bounded, the corpus
  *     never re-reads;
  *  4. atomically replace the reservoir parquet (write temp dir, then
  *     rename-swap) — the state is k-bounded so the rewrite is O(k),
  *     not corpus-sized.
  *
  * At 100 TB: batch cost is batch-sized, state is |langs|·k rows, and
  * nothing global ever sorts — the same TakeOrdered/window-over-
  * bounded-rows discipline as [[graft.operators.Sampling
  * .weightedSample]].
  */
object ReservoirStream {

  /** E-S rank key ln(u)/w from (doc_id, weight) — identical to
    * [[graft.operators.Sampling.weightedSample]]'s projection.
    */
  private def esKey(idCol: String, w: org.apache.spark.sql.Column) = {
    val u = greatest(
      (hash60(col(idCol).cast("string")) + 1L).cast("double") /
        lit(1152921504606846976.0),
      lit(8.673617379884035e-19))
    log(u) / w.cast("double")
  }

  /** Per-lang top-k by (es_key desc, doc_id) over whatever rows are
    * given — used for batch winners and for the merged state alike.
    */
  private def topKPerLang(rows: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("es_key").desc, col("doc_id"))
    rows.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .drop("rk")
  }

  /** One micro-batch fold: batch docs → keys → per-lang winners →
    * merge with the at-rest reservoir → re-truncated new reservoir.
    * Pure function of (batch, reservoir) — spec-testable without a
    * stream.
    */
  def foldBatch(batch: DataFrame, reservoir: Option[DataFrame],
                k: Int): DataFrame = {
    val keyed = batch
      .filter(col("n_chars") > 0L)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        esKey("doc_id", col("n_chars")).as("es_key"))
    val batchTop = topKPerLang(keyed, k)
    val merged = reservoir match {
      case Some(r) => batchTop.unionByName(r)
      case None => batchTop
    }
    // a REPLAYED batch re-submits rows already in the reservoir; the
    // duplicate copies are bit-identical (es_key is a pure row
    // function) but would each consume a top-k slot and evict real
    // members — dedup on the document key makes replay a no-op, which
    // is the restart-convergence guarantee
    topKPerLang(merged.dropDuplicates(Seq("doc_id")), k)
  }

  /** File-based JSON-lines source (`doc_id`, `lang`, `n_chars`) →
    * fold into the reservoir parquet at `reservoirDir` each batch.
    * The replace is write-new-then-swap so readers never observe a
    * half-written reservoir; replayed batches re-merge the same keys
    * and the top-k is idempotent, so restarts converge bit-exactly.
    */
  def start(spark: SparkSession, inputDir: String, reservoirDir: String,
            checkpoint: String, k: Int,
            trigger: Trigger = Trigger.ProcessingTime("5 seconds"))
      : StreamingQuery =
    spark.readStream
      .schema("doc_id LONG, lang STRING, n_chars LONG")
      .json(inputDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val path = new Path(reservoirDir)
        val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val hasState = fs.exists(path) &&
          fs.listStatus(path).exists(_.getPath.getName.endsWith(".parquet"))
        val prev =
          if (hasState) Some(spark.read.parquet(reservoirDir)) else None
        // materialize BEFORE touching the state dir: the new reservoir
        // reads the old one lazily, and k-bounded rows are tiny
        val next = foldBatch(batch, prev, k).localCheckpoint()
        val tmp = new Path(reservoirDir + ".tmp")
        next.write.mode("overwrite").parquet(tmp.toString)
        if (fs.exists(path)) fs.delete(path, true)
        fs.rename(tmp, path)
        ()
      }
      .start()
}
