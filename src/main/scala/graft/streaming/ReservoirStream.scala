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
  *  4. commit the new reservoir as the next VERSIONED snapshot dir
  *     (`v000000042/`), resolved by readers as "highest version whose
  *     parquet commit marker (`_SUCCESS`) exists" — no delete-then-
  *     rename window ever exposes a missing or half-written state, a
  *     crash mid-write leaves an uncommitted dir that the next batch
  *     clobbers, and the state is k-bounded so each snapshot is O(k),
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

  /** Highest COMMITTED snapshot under `reservoirDir`: a snapshot is a
    * `v%09d` child dir carrying the parquet commit marker (`_SUCCESS`),
    * so a crash mid-write (no marker yet) is invisible to readers and
    * simply overwritten by the next batch's commit at the same or a
    * later version. Resolution never depends on a pointer file or a
    * rename, so there is no instant at which state exists but cannot
    * be found.
    */
  def currentSnapshot(spark: SparkSession,
                      reservoirDir: String): Option[(Long, Path)] = {
    val dir = new Path(reservoirDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d{9}"))
      .filter(s => fs.exists(new Path(s.getPath, "_SUCCESS")))
      .map(s => (s.getPath.getName.drop(1).toLong, s.getPath))
      .sortBy(-_._1).headOption
  }

  /** Read the current reservoir state (None before the first commit). */
  def read(spark: SparkSession, reservoirDir: String): Option[DataFrame] =
    currentSnapshot(spark, reservoirDir).map { case (_, p) =>
      spark.read.parquet(p.toString) }

  /** File-based JSON-lines source (`doc_id`, `lang`, `n_chars`) →
    * fold into the reservoir snapshot chain at `reservoirDir` each
    * batch. Each commit is a NEW versioned dir (readers keep resolving
    * the previous one until the marker lands — never a half-written or
    * missing state); replayed batches re-merge the same keys and the
    * top-k is idempotent, so restarts converge bit-exactly. Snapshots
    * older than the previous one are pruned AFTER the new commit, so
    * the live chain is at most two O(k) dirs.
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
        val dir = new Path(reservoirDir)
        val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val cur = currentSnapshot(spark, reservoirDir)
        val prev = cur.map { case (_, p) => spark.read.parquet(p.toString) }
        // materialize BEFORE writing: the new reservoir reads the old
        // one lazily, and k-bounded rows are tiny
        val next = foldBatch(batch, prev, k).localCheckpoint()
        val v = cur.map(_._1 + 1L).getOrElse(0L)
        next.write.mode("overwrite")
          .parquet(new Path(dir, f"v$v%09d").toString)
        // prune: keep the new commit and its predecessor (reader grace)
        fs.listStatus(dir).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d{9}"))
          .filter(_.getPath.getName.drop(1).toLong < v - 1L)
          .foreach(s => fs.delete(s.getPath, true))
        ()
      }
      .start()
}
