package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation: the two-phase salted shape for hot keys.
  *
  * At 100 TB a groupBy on a key with a dominant value (one service with
  * 90% of traffic, one event_type) funnels that key's rows into a
  * single reducer. Salting splits each key into `buckets` sub-keys for
  * the first (wide) aggregation, then combines the per-salt partials in
  * a second, tiny aggregation. Results are identical to the direct
  * groupBy — the oracle for these queries IS the plain GROUP BY — only
  * the shuffle distribution changes.
  *
  * (Spark's AQE skew-join handling covers joins; salting is the same
  * medicine applied to aggregations.)
  */
object Skew {

  /** Deterministic-enough salt: hash of the whole row modulo buckets.
    * The salt value never reaches the result, so any distribution
    * works; spreading by row content keeps hot keys uniform.
    */
  private def salt(df: DataFrame, buckets: Int): Column =
    pmod(hash(df.columns.map(col).toSeq: _*), lit(buckets))

  /** count(*) and sum(field) per key, salted into `buckets` partials. */
  def saltedAgg(df: DataFrame, key: String, field: String,
                buckets: Int = 32): DataFrame =
    df.withColumn("__salt", salt(df, buckets))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__cnt"), sum(col(field)).as("__sum"))
      .groupBy(col(key))
      .agg(sum(col("__cnt")).as("cnt"), sum(col("__sum")).as("sum"))
      .orderBy(col(key))

  /** Skew-safe equi-join for a hot fact key when the other side is too
    * big to broadcast: the fact side salts its key with a deterministic
    * shard (`hash(saltBy) mod buckets`) and the `dim` side replicates
    * each row across all `buckets` shards, so one dominant key's rows
    * spread over `buckets` reducers instead of one. Row-for-row
    * identical to `facts.join(dim, key)` — salting only reshapes the
    * shuffle. Cost: dim is sent `buckets`× (use the smallest bucket
    * count that flattens the skew; AQE's skew-join handles the
    * moderate cases without any of this).
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
                 saltBy: Column, buckets: Int = 32): DataFrame = {
    val sf = facts.withColumn("__salt", pmod(hash(saltBy), lit(buckets)))
    val sd = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    sf.join(sd, Seq(key, "__salt")).drop("__salt")
  }
}
