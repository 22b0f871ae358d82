package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * At cluster scale these would be catalog tables (partitioned parquet /
  * Delta); `read` is the single seam where that swap happens — every
  * operator takes a DataFrame, never a path.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The driver's events table has shipped ts as TIMESTAMP(NANOS)
    // (which Spark's reader rejects — read nanos as raw longs and
    // truncate to micros, exactly what DuckDB does) and, since the
    // 2026-08-13 regeneration, as TIMESTAMP(MICROS) without timezone
    // (Spark reads TIMESTAMP_NTZ). Both normalize here to session-tz
    // TIMESTAMP — the session is pinned UTC, so wall-clock values are
    // bit-identical to DuckDB's naive reading either way, and every
    // operator keeps one ts type.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
      df.withColumn("ts", col("ts").cast("timestamp"))
    else df
  }

  /** Register every table as a temp view — the raw-SQL console surface
    * (reference: ballcone/dao.py:344-352 forwards any SQL to the engine).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => read(spark, dir, n).createOrReplaceTempView(n))
}
