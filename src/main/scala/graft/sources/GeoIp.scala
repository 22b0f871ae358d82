package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GeoIP enrichment as a broadcast CIDR range join.
  *
  * The reference does a per-row point lookup into an embedded MaxMind
  * reader at ingest (ballcone/core.py:60-64) — classically a dimension
  * join. Spark-first, that IS a join: the CIDR table (start, end,
  * country) is broadcast and each event's numeric IP is range-matched
  * map-side (BroadcastNestedLoopJoin); no shuffle of the fact stream,
  * scales with executors. A real MaxMind CSV dump drops in as the
  * `ranges` DataFrame without code changes.
  */
object GeoIp {

  /** Dotted-quad IPv4 → numeric (null for anything else, incl. IPv6 —
    * those simply don't match any v4 range, like the reference's
    * AddressNotFoundError → None path).
    */
  def ipv4ToLong(ip: Column): Column = {
    // octets must be 0-255: a lax \d{1,3} would let "9.256.0.0" fold
    // to the same numeric as "10.0.0.0" and falsely match its range
    val octet = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[0-9][0-9]?)"
    when(ip.rlike(s"^($octet\\.){3}$octet$$"),
      aggregate(transform(split(ip, "\\."), o => o.cast("long")),
        lit(0L), (acc, o) => acc * 256 + o))
  }

  /** Left-join `country_iso_code` onto `df` by matching `ipCol` into the
    * broadcast `ranges` table (`ip_start`, `ip_end`, `country`).
    */
  def enrich(df: DataFrame, ipCol: String, ranges: DataFrame): DataFrame = {
    val withNum = df.withColumn("__ipnum", ipv4ToLong(col(ipCol)))
    withNum
      .join(broadcast(ranges),
        col("__ipnum") >= col("ip_start") && col("__ipnum") <= col("ip_end"),
        "left_outer")
      .withColumnRenamed("country", "country_iso_code")
      .drop("__ipnum", "ip_start", "ip_end")
  }

  /** Tiny built-in range table for tests/demos (private + doc ranges). */
  def demoRanges(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (ipNum("10.0.0.0"), ipNum("10.255.255.255"), "US"),
      (ipNum("192.168.0.0"), ipNum("192.168.255.255"), "DE"),
      (ipNum("203.0.113.0"), ipNum("203.0.113.255"), "JP")
    ).toDF("ip_start", "ip_end", "country")
  }

  private def ipNum(s: String): Long =
    s.split('.').foldLeft(0L)((acc, o) => acc * 256 + o.toLong)
}
