package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Time-bounded stream-stream join — click attribution: pair every
  * click with the impression it followed within an attribution
  * horizon. The canonical two-firehose join (reference's analytics
  * joins are batch-only; this is the incremental tier a live pipeline
  * needs).
  *
  * Scale shape: both streams shuffle once on the join key, so matching
  * is local to a state-store partition. The time-bound condition plus
  * per-side watermarks let the engine EVICT buffered rows as the
  * watermark passes `imp_ts + horizon`, so state is bounded by
  * (arrival rate × horizon) per side — never stream history. Without
  * the time bound, a stream-stream join's state grows forever; the
  * horizon is what makes attribution runnable 24/7.
  *
  * The left-outer variant additionally emits unmatched impressions
  * (null click columns) — but only once the watermark proves no
  * matching click can still arrive, i.e. an unmatched row appears one
  * micro-batch after the watermark passes its eviction bound.
  */
object JoinStream {

  final case class Impression(imp_id: Long, imp_ts: Timestamp)
  final case class Click(click_id: Long, click_imp_id: Long,
                         click_ts: Timestamp)

  /** Attribute clicks to impressions: equi-join on the impression id,
    * click time within `[imp_ts, imp_ts + horizonSeconds]`.
    *
    * @param delay    allowed out-of-orderness per side (watermark)
    * @param joinType "inner" (attributed clicks only) or "left_outer"
    *                 (impressions without a click surface with null
    *                 click columns after the horizon expires)
    */
  def attributed(impressions: Dataset[Impression], clicks: Dataset[Click],
                 horizonSeconds: Long, delay: String = "0 seconds",
                 joinType: String = "inner"): DataFrame = {
    val imp = impressions.toDF().withWatermark("imp_ts", delay)
    val clk = clicks.toDF().withWatermark("click_ts", delay)
    imp.join(clk,
      col("imp_id") === col("click_imp_id") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") +
          expr(s"INTERVAL $horizonSeconds SECONDS"),
      joinType)
      .select(col("imp_id"), col("imp_ts"), col("click_id"),
              col("click_ts"))
  }
}
