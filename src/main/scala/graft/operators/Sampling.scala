package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash60

/** Deterministic sampling for training-data curation. The reproducible
  * complement to [[graft.Queries]]'s hash-split filter: where that
  * draws a FRACTION, these draw a fixed-size, class-balanced subset.
  */
object Sampling {

  /** Stratified top-k: the `k` rows per stratum with the smallest
    * md5-derived rank — the class-balancing subsample a pipeline draws
    * (e.g. equal documents per language). Membership depends only on
    * the row id, so the sample is stable across runs, engines, and
    * cluster sizes; the id itself breaks the (astronomically unlikely)
    * hash ties so the rank order is total.
    *
    * Scale shape: one hash-partition shuffle on the stratum, and the
    * `row_number ≤ k` filter triggers WindowGroupLimit — each map task
    * pre-truncates its partition to k rows per stratum BEFORE the
    * shuffle, so a billion-row stratum moves only k·tasks rows, never
    * the stratum.
    */
  def stratified(df: DataFrame, stratumCol: String, idCol: String,
                 k: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hash60(col(idCol).cast("string")), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** Per-source rate sampling — the data-mixing knob (Pile/DoReMi
    * style): each source keeps a deterministic `rate_permille / 1000`
    * fraction of its documents, so the training mix hits target
    * proportions reproducibly. Membership depends only on the doc id
    * (stable across runs, engines, partitionings); the weights table
    * is per-source — tiny by construction — and broadcasts, so the
    * whole operator is a map-side filter at any corpus size.
    */
  def mixSources(docs: DataFrame, weights: DataFrame,
                 idCol: String = "doc_id",
                 sourceCol: String = "source"): DataFrame =
    docs.join(broadcast(weights), sourceCol)
      .filter(hash60(col(idCol).cast("string")) % 1000 <
        col("rate_permille"))
      .select(col(idCol), col(sourceCol), col("rate_permille"))

  /** Deterministic global corpus shuffle — the "shuffle the training
    * data" step: a dense 1..N `shuffle_rank` in md5-derived key order,
    * reproducible across runs, engines, and partitionings (seed in,
    * same permutation out).
    *
    * A naive `row_number() OVER (ORDER BY key)` funnels the corpus
    * through ONE reducer; this is the two-level form instead (the
    * sequence-packing prefix-sum pattern): keys range-bucket by their
    * high bits (order-preserving by construction), per-bucket counts
    * produce bucket START OFFSETS via a cumulative window over the
    * BUCKET TABLE (`nBuckets` rows — bounded, broadcast back), and the
    * global rank is bucket offset + within-bucket `row_number`. Every
    * sort is bucket-local (expected corpus/`nBuckets` rows); scale
    * `nBuckets` with the corpus so buckets stay executor-sized.
    * Bit-identical to the single-reducer oracle form.
    */
  def deterministicShuffle(docs: DataFrame, seed: Long,
                           idCol: String = "doc_id",
                           nBuckets: Int = 4096): DataFrame = {
    val key = hash60(concat(col(idCol).cast("string"),
      lit(":"), lit(seed.toString)))
    // hash60 < 2^60; ceil-width so buckets stay monotone in the key
    val width = (1L << 60) / nBuckets + 1
    val keyed = docs.select(col(idCol), key.as("skey"))
      .withColumn("__bucket", expr(s"skey div $width"))
    val offsets = keyed.groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(
        sum(col("__n")).over(Window.orderBy(col("__bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__n")
    val within = Window.partitionBy(col("__bucket"))
      .orderBy(col("skey"), col(idCol))
    keyed.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("shuffle_rank",
        (col("__off") + row_number().over(within)).cast("long"))
      .select(col(idCol), col("skey"), col("shuffle_rank"))
  }
}
