package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the train/eval overlap scan every
  * serious training-data pipeline runs before a corpus ships: find
  * training documents that share enough word n-grams with an
  * evaluation/benchmark document to risk leaking test data into the
  * model (the GPT-3/PaLM-style n-gram collision check).
  *
  * Scale shape: the eval set is SMALL BY CONSTRUCTION (benchmarks are
  * thousands of docs, the corpus is billions), so its distinct
  * shingles broadcast and the train side streams past them map-side —
  * the train corpus is never self-joined and never shuffled on
  * content. The only shuffle is the (train doc, eval doc) pair
  * aggregation, whose volume is proportional to actual collisions,
  * not corpus size.
  */
object Decontaminate {

  /** (train doc, eval doc) pairs sharing ≥ `minOverlap` distinct
    * `n`-grams, with the overlap count. Shingling mirrors
    * [[Dedup.shingleRows]] exactly, so batch dedup and
    * decontamination agree on tokenization.
    */
  def overlaps(train: DataFrame, evalSet: DataFrame,
               n: Int = 3, minOverlap: Int = 2): DataFrame = {
    val trainSh = Dedup.shingleRows(train, n)
    val evalSh = Dedup.shingleRows(evalSet, n)
      .select(col("doc_id").as("eval_id"), col("shingle"))
    trainSh.join(broadcast(evalSh), "shingle")
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** Per-train-doc verdict: how many eval docs it collides with and
    * the worst overlap — the filter side for a cleaning pipeline
    * (`anti-join docs against contaminated`).
    */
  def contaminated(train: DataFrame, evalSet: DataFrame,
                   n: Int = 3, minOverlap: Int = 2): DataFrame =
    overlaps(train, evalSet, n, minOverlap)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_eval_docs"),
           max(col("n_overlap")).as("max_overlap"))
}
