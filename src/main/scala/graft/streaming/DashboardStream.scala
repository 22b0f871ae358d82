package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.Ingest

/** Live dashboard counters as a streaming aggregation — the O18
  * dashboard maintained incrementally instead of recomputed per page
  * load: per-service visit and approximate-unique-IP counts over the
  * whole stream, surfaced as an in-memory table the web tier reads.
  *
  * Scale shape: running state is ONE row per service (count + HLL
  * sketch), bounded by the service catalog, not traffic; each
  * micro-batch contributes map-side partials and the complete-mode
  * output rewrites the tiny table. The exact per-day counters stay on
  * the query-time path (Reports.dashboard over the at-rest store);
  * this is the glanceable live view.
  */
object DashboardStream {

  def start(spark: SparkSession, inputDir: String, geoRanges: DataFrame,
            queryName: String, checkpoint: String,
            trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    Ingest.pipeline(
        spark.readStream.schema("value STRING").text(inputDir), geoRanges)
      .groupBy(col("service"))
      .agg(count(lit(1)).as("visits"),
           approx_count_distinct(col("ip")).as("approx_unique"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
