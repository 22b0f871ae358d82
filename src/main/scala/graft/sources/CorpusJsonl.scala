package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus ingestion — the wire format crawl dumps and published
  * datasets actually arrive in (one JSON document per line). The
  * reference ingests only its own syslog wire format; a training-data
  * pipeline's front door is this.
  *
  * Malformed lines are NEVER dropped silently: the reader runs in
  * PERMISSIVE mode with a corrupt-record column, and [[split]] returns
  * the valid documents alongside a quarantine frame holding every
  * unparseable raw line — at 100 TB "0.3% of the dump failed to parse"
  * is a signal someone must see, not a rounding error. Parsing is
  * Spark's native JSON scan (distributed, pushdown-friendly, no UDFs);
  * the quarantine split is one boolean filter over the same scan.
  */
object CorpusJsonl {

  /** documents-table schema + the corrupt-record capture column. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("_corrupt", StringType)))

  /** Batch read: every line of `path`, parsed or quarantined. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** Streaming read of a landing directory (new files per trigger) —
    * the same schema/quarantine contract, for curate-at-ingest chains
    * ([[graft.streaming.CurationStream]]) fed by dump deliveries.
    */
  def readStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** (valid documents, quarantine). A line is quarantined when it
    * failed to parse at all (corrupt column set) OR parsed to a
    * document missing its required identity/content fields — both are
    * operator-visible defects. Valid docs drop the capture column.
    */
  def split(parsed: DataFrame): (DataFrame, DataFrame) = {
    val bad = col("_corrupt").isNotNull ||
      col("doc_id").isNull || col("text").isNull
    val good = parsed.filter(!bad)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val quarantine = parsed.filter(bad)
      .select(coalesce(col("_corrupt"),
        to_json(struct(col("doc_id"), col("text"), col("lang"),
          col("source")))).as("raw_line"))
    (good, quarantine)
  }
}
