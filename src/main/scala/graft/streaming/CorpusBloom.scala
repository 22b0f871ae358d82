package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Cross-batch corpus Bloom state for [[CurationStream]].
  *
  * The naive per-batch form (rebuild the filter from a full corpus
  * scan every trigger, at a fixed `expectedItems`) has two failure
  * modes at scale: a corpus scan every 5 s, and silent saturation —
  * once the corpus outgrows the fixed capacity the effective fpp
  * tends to 1, every batch row survives the prefilter, and the
  * "batch cost ∝ batch size" contract quietly dies (results stay
  * exact; throughput doesn't).
  *
  * This holder fixes both:
  *  - the filter is built ONCE, sized `headroom ×` the actual corpus
  *    row count (one count + one scan, amortized over many batches);
  *  - each batch's survivor fingerprints — which the stream itself
  *    appends to the corpus — are folded into the live filter via
  *    [[recordAppended]], so the filter tracks the growing corpus
  *    with no per-batch scan and no false negatives;
  *  - when tracked growth exceeds the design capacity, the NEXT
  *    [[filterFor]] call rebuilds from the corpus at the new size, so
  *    fpp stays bounded by construction (between rebuilds the filter
  *    holds at most `headroom ×` its sizing count).
  *
  * Assumes the corpus grows only through this stream (the
  * `foreachBatch` contract CurationStream documents); a foreign
  * writer's appends are invisible to the cached filter until
  * [[invalidate]] forces a rebuild. Driver-side state, one instance
  * per streaming query; all methods synchronized (micro-batches are
  * sequential anyway).
  *
  * @param headroom    capacity multiple over the sizing count — 4×
  *                    means a rebuild roughly every two corpus
  *                    doublings
  * @param minCapacity capacity floor so tiny corpora don't thrash
  *                    rebuilds (tests shrink it to force the path)
  * @param keyExpr     the string key the filter covers, evaluated over
  *                    the at-rest dataset: the text fingerprint by
  *                    default ([[CurationStream]] exact dedup); the
  *                    `band:bkey` LSH key for [[NearDupStream]]
  */
final class CorpusBloom(fpp: Double = 0.01, headroom: Long = 4,
                        minCapacity: Long = 1024L,
                        keyExpr: Column = md5(lower(col("text")))) {
  private var filter: BloomFilter = null
  private var capacity: Long = 0L
  private var tracked: Long = 0L
  private var rebuildCount: Int = 0

  /** Filter covering every corpus fingerprint, rebuilding if absent
    * or past design capacity. EAGER on the rebuild path (corpus count
    * + scan); a no-op when the cached filter is still within bounds.
    */
  def filterFor(corpus: DataFrame): BloomFilter = synchronized {
    if (filter == null || tracked > capacity) {
      val rows = corpus.count()
      capacity = math.max(rows * headroom, minCapacity)
      filter = corpus.select(keyExpr.as("fp"))
        .stat.bloomFilter("fp", capacity, fpp)
      tracked = rows
      rebuildCount += 1
    }
    filter
  }

  /** Fold fingerprints this stream just appended to the corpus into
    * the live filter (no-op before the first build — the next
    * [[filterFor]] scan will see those rows anyway).
    */
  def recordAppended(fps: IterableOnce[String]): Unit = synchronized {
    if (filter != null)
      fps.iterator.foreach { s => filter.putString(s); tracked += 1 }
  }

  /** Executor-side variant of [[recordAppended]]: build a Bloom over
    * `key` of the appended frame with the SAME (capacity, fpp) as the
    * live filter — structurally identical bit arrays — and merge it
    * bitwise. The driver receives ONE bit array (the size it already
    * broadcasts each batch) instead of the appended key column, so a
    * large batch never ships its raw fingerprints through the driver;
    * the per-task partial filters are Spark's own BloomFilterAggregate
    * machinery, tree-reduced. No-op before the first build. The whole
    * method holds the lock (micro-batches are sequential; this keeps a
    * concurrent [[filterFor]] rebuild from changing `capacity` between
    * the batch build and the merge, which would make the bit arrays
    * incompatible).
    *
    * The method runs TWO actions over `appended` (a count for
    * `tracked`, then the Bloom build), so it pins the frame with an
    * eager `localCheckpoint` first: a non-deterministic input (e.g. a
    * frame built on sampling or `rand`) would otherwise yield a count
    * inconsistent with the merged bits. Callers that already
    * materialized the frame pay one cheap re-persist of a batch-sized
    * relation.
    */
  def recordAppendedFrom(appended: DataFrame, key: Column): Unit =
    synchronized {
      if (filter != null) {
        val pinned = appended.select(key.as("k")).localCheckpoint(true)
        try {
          val n = pinned.count()
          if (n > 0) {
            val bf = pinned.stat.bloomFilter("k", capacity, fpp)
            filter.mergeInPlace(bf)
            tracked += n
          }
        } finally {
          // free the checkpointed RDD's persisted blocks directly:
          // Dataset.unpersist on a localCheckpoint'ed frame does not
          // drop the underlying RDD's storage (it would linger until
          // the ContextCleaner GCs the RDD), but that RDD is reachable
          // as the LogicalRDD leaf the checkpoint plan wraps
          pinned.queryExecution.analyzed match {
            case lr: org.apache.spark.sql.execution.LogicalRDD =>
              lr.rdd.unpersist(blocking = false)
            case _ => ()
          }
          pinned.unpersist()
        }
      }
    }

  /** Drop the cached filter — required after any append that did NOT
    * go through [[recordAppended]] (a foreign writer), else the
    * prefilter has false negatives for those rows and duplicates of
    * them would be readmitted.
    */
  def invalidate(): Unit = synchronized { filter = null }

  /** Builds so far — test/observability hook. */
  def rebuilds: Int = synchronized(rebuildCount)

  /** Rows the live filter is believed to cover — test/observability. */
  def trackedRows: Long = synchronized(tracked)
}
