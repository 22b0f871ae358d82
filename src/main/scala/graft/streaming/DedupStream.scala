package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the incremental tier of
  * [[graft.operators.Dedup.exact]] for a document firehose: drop any
  * record whose normalized-content fingerprint was already seen within
  * the watermark horizon.
  *
  * `dropDuplicatesWithinWatermark` keys the state store on the md5
  * fingerprint and expires entries once the watermark passes their
  * event time + delay, so state is bounded by the duplicate horizon
  * (how far apart copies arrive), NOT by corpus history — the
  * unbounded-history dedup stays a batch job over the at-rest table.
  * The same md5(lower(text)) fingerprint feeds both tiers, so a batch
  * backfill and the stream agree on what is a duplicate.
  */
object DedupStream {

  /** fingerprint column shared with the batch tier. */
  def fingerprint(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(lower(text))

  /** `docs` must carry (`ts` event-time, `text`); emits the first copy
    * of each fingerprint within the watermark, dropping later ones.
    */
  def dedupped(docs: DataFrame, tsCol: String, textCol: String,
               delay: String): DataFrame =
    docs
      .withColumn("h", fingerprint(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("h")
}
