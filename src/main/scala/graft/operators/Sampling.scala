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
}
