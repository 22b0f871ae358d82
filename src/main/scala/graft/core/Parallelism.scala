package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-parallelism floor for heavy per-row pipelines (r17, guide
  * §2.5 "input skew: one huge unsplittable file … repartition
  * immediately after the read").
  *
  * The local test tables ship as SINGLE-ROW-GROUP parquet files, which
  * no split setting can divide — every map-side-heavy chain (shingle
  * explosion, MinHash's 32 hash projections, PQ encode, token-pair
  * generation) runs its whole pre-shuffle stage in ONE task while the
  * other cores idle. When the planned scan parallelism is below the
  * session default, repartition once by a provided key right after
  * the read; at production scale the input arrives in many splits and
  * the condition never fires, so the at-scale plans (map-side partial
  * aggregation over narrow shuffles, no text bytes moved) are
  * untouched — the CONDITION ships, not the shuffle.
  *
  * Keyed (hash) repartition, not round-robin: deterministic under
  * task retry (SPARK-38388 does not apply), no sort-before-repartition
  * pass, and downstream aggregates/windows keyed on a superset of the
  * key inherit the partitioning (one exchange where distinct+window
  * used to pay two).
  */
object Parallelism {

  /** True when `df`'s physical plan already contains a shuffle — such
    * a plan's parallelism is the session shuffle-partition count, so
    * no floor is needed. Checked on the UNEXECUTED plan on purpose
    * (r18): probing `df.rdd.getNumPartitions` under AQE materializes
    * every intermediate query stage eagerly — each spread gate on a
    * post-join/post-repartition input was silently running its whole
    * upstream subtree as a throwaway job (one redundant corpus
    * scan+shuffle per shingleRows/PQ call; pipeline_intake_dump paid
    * it four times per run, the r17 verdict's only real regression).
    * With the shuffle short-circuit, `.rdd` is only consulted on
    * shuffle-free plans, where AQE has no stages to materialize.
    */
  private[graft] def planHasShuffle(df: DataFrame): Boolean =
    df.queryExecution.sparkPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])

  def spreadByKey(df: DataFrame, key: Column): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (!planHasShuffle(df) &&
        df.rdd.getNumPartitions < math.min(p, 16)) df.repartition(p, key)
    else df
  }
}
