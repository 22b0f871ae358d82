package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared bucket/local-rank step of the two-level global-rank idiom
  * ([[TextAnalysis.rankKeyed]], [[Dedup.snGlobalRank]]): after a range
  * exchange + within-partition sort, the global ROW_NUMBER is composed
  * from (partition id, within-partition row number) plus broadcast
  * bucket-prefix offsets — no corpus-sized relation ever passes
  * through one reducer.
  *
  * The within-partition counter comes from
  * `monotonically_increasing_id`'s low 33 bits — its documented
  * per-partition record number — but the bucket id does NOT read the
  * high bits of the same value: `spark_partition_id()` is a
  * first-class function, monotone in the range order by construction,
  * so the composition depends on the id's bit layout in exactly one
  * place. That place is guarded: the counter is 33 bits wide, so any
  * partition reaching 2^33 rows wraps the counter and repeats local
  * ranks — [[guardedBucketCount]] turns that into a runtime error at
  * the offsets aggregation instead of a silently wrong global rank.
  */
private[graft] object Ranks {

  /** Max value of monotonically_increasing_id's 33-bit per-partition
    * record counter; a partition may hold at most this many rows
    * before the counter wraps.
    */
  val MaxLocal: Long = (1L << 33) - 1

  /** Append (`__bucket`, `__lrk`) — partition id and the 1-based
    * within-partition row number — to an already range-partitioned,
    * within-partition-sorted relation.
    */
  def bucketLocal(sorted: DataFrame): DataFrame =
    sorted
      .withColumn("__bucket", spark_partition_id())
      .withColumn("__lrk",
        monotonically_increasing_id().bitwiseAND(lit(MaxLocal)) + lit(1L))

  /** `count(1)` for the per-bucket offsets table, raising when a
    * bucket exceeds [[MaxLocal]] rows (the local counter has wrapped;
    * `__lrk` values repeat). The guard rides the count expression the
    * offsets math consumes, so column pruning can never drop it.
    */
  def guardedBucketCount: Column = {
    val n = count(lit(1))
    when(n <= lit(MaxLocal), n).otherwise(raise_error(concat(
      lit("two-level rank bucket holds "), n.cast("string"),
      lit(" rows; the 33-bit local-rank counter wraps beyond "),
      lit(MaxLocal), lit(" - repartition into more buckets"))))
  }
}
