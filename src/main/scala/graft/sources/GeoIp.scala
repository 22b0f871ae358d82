package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GeoIP enrichment as a broadcast CIDR range join.
  *
  * The reference does a per-row point lookup into an embedded MaxMind
  * reader at ingest (ballcone/core.py:60-64) — classically a dimension
  * join. Spark-first, that IS a join — but a naive `BETWEEN` condition
  * plans as a BroadcastNestedLoopJoin that scans EVERY range per row:
  * harmless for a demo table, hopeless against the real GeoLite2 dump
  * (~3M ranges × the full ingest stream). So the ranges are exploded
  * into the /16 PREFIX BUCKETS they cover (CIDRs at /16 or longer —
  * almost all of GeoLite2 — land in exactly one bucket; a /8 lands in
  * 256) and each event equi-joins on its IP's bucket with the range
  * check left as a residual: a broadcast HASH join probing only the
  * handful of ranges sharing the /16, still zero shuffles of the fact
  * stream. A real MaxMind CSV dump drops in as the `ranges` DataFrame
  * without code changes.
  */
object GeoIp {

  /** Prefix-bucket width: /16 — one bucket per B-class. */
  private val BucketShift = 16

  /** Dotted-quad IPv4 → numeric (null for anything else, incl. IPv6 —
    * those simply don't match any v4 range, like the reference's
    * AddressNotFoundError → None path). IPv4-MAPPED IPv6 text
    * (`::ffff:1.2.3.4` — what nginx logs on a dual-stack listener) is
    * normalized to its embedded v4 address first, so those rows
    * geolocate through the v4 table like the reference's MaxMind
    * reader does.
    */
  def ipv4ToLong(ip: Column): Column = {
    // octets must be 0-255: a lax \d{1,3} would let "9.256.0.0" fold
    // to the same numeric as "10.0.0.0" and falsely match its range
    val octet = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[0-9][0-9]?)"
    val bare = regexp_replace(ip, "^(?i)::ffff:", "")
    // plain split + element_at + arithmetic (NOT a higher-order
    // aggregate/transform fold): lambda expressions are interpreted-
    // eval in Spark, and this runs per event on the ingest hot path —
    // the flat form keeps the whole projection inside codegen
    // (PlanShapeSpec pins the enrichment plan opaque-free)
    val arr = split(bare, "\\.")
    def oct(i: Int): Column = element_at(arr, i).cast("long")
    when(bare.rlike(s"^($octet\\.){3}$octet$$"),
      ((oct(1) * 256 + oct(2)) * 256 + oct(3)) * 256 + oct(4))
  }

  /** IPv6 textual form → 64-bit halves (hi, lo), two's-complement raw
    * bits. Handles the `::` compression (split once, pad the gap with
    * zero groups) entirely with codegen'd builtins — no lambdas, no
    * UDF — so the hot ingest path stays inside whole-stage codegen.
    * Non-IPv6 input (including dotted-quad v4) yields (null, null).
    * Lenient by design: a string with multiple `::` parses to garbage
    * halves that match no real range — the reference's
    * AddressNotFoundError → None path, not an error.
    */
  def ipv6ToLongs(ip: Column): (Column, Column) = {
    val isV6 = ip.rlike("^[0-9a-fA-F]{0,4}(:[0-9a-fA-F]{0,4}){1,7}$")
    val parts = split(ip, "::", 2)
    val leftArr = split(element_at(parts, 1), ":")
    val rightArr = coalesce(
      split(try_element_at(parts, lit(2)), ":"),
      array().cast("array<string>"))
    val nL = size(leftArr)
    val nR = size(rightArr)
    def grp(i: Int): Column = {
      // group i comes from the left run, the right run (right-aligned
      // at slot 8), or the zero gap the `::` stands for
      val raw = when(lit(i) < nL,
          coalesce(try_element_at(leftArr, lit(i + 1)), lit("0")))
        .when(lit(i) >= lit(8) - nR,
          coalesce(try_element_at(rightArr, lit(i) - (lit(8) - nR) + 1), lit("0")))
        .otherwise(lit("0"))
      coalesce(
        conv(when(raw === "", lit("0")).otherwise(raw), 16, 10).cast("long"),
        lit(0L))
    }
    def half(g0: Column, g1: Column, g2: Column, g3: Column): Column =
      shiftleft(g0, 48).bitwiseOR(shiftleft(g1, 32))
        .bitwiseOR(shiftleft(g2, 16)).bitwiseOR(g3)
    (when(isV6, half(grp(0), grp(1), grp(2), grp(3))),
      when(isV6, half(grp(4), grp(5), grp(6), grp(7))))
  }

  /** Flip the sign bit: maps unsigned 64-bit order onto signed long
    * order, so range comparisons on flipped keys are plain `<=`/`>=`.
    */
  def flipSign(c: Column): Column = c.bitwiseXOR(lit(Long.MinValue))

  /** Left-join `country_iso_code` onto `df` by matching `ipCol` into the
    * broadcast `ranges` table (`ip_start`, `ip_end`, `country`); when a
    * `v6Ranges` table (from [[fromGeoLite2CsvV6]]) is supplied, IPv6
    * addresses range-match it on sign-flipped (hi, lo) halves. Both
    * sides use the prefix-bucket equi-join (see object doc): broadcast
    * HASH joins, the fact stream never shuffles, per-row probe cost is
    * the ranges sharing one /16 — not the whole table.
    */
  def enrich(df: DataFrame, ipCol: String, ranges: DataFrame,
             v6Ranges: Option[DataFrame] = None): DataFrame = {
    val bucketed = ranges.withColumn("__rb", explode(sequence(
      shiftright(col("ip_start"), BucketShift),
      shiftright(col("ip_end"), BucketShift))))
    val withNum = df.withColumn("__ipnum", ipv4ToLong(col(ipCol)))
    val v4 = withNum
      .join(broadcast(bucketed),
        shiftright(col("__ipnum"), BucketShift) === col("__rb") &&
          col("__ipnum") >= col("ip_start") && col("__ipnum") <= col("ip_end"),
        "left_outer")
      .withColumnRenamed("country", "country_iso_code")
      .drop("__ipnum", "ip_start", "ip_end", "__rb")
    v6Ranges match {
      case None => v4
      case Some(r6) =>
        // bucket = ARITHMETIC shift of the sign-flipped hi half: the
        // flipped values order 128-bit addresses as signed longs, and
        // an arithmetic shift is monotone in that order, so a range's
        // buckets are exactly sequence(shift(hs), shift(he))
        val r6b = r6.withColumnRenamed("country", "__c6")
          .withColumn("__rb6", explode(sequence(
            shiftright(col("hs"), 64 - BucketShift),
            shiftright(col("he"), 64 - BucketShift))))
        val (hi, lo) = ipv6ToLongs(col(ipCol))
        v4.withColumn("__hi", flipSign(hi)).withColumn("__lo", flipSign(lo))
          .join(broadcast(r6b),
            shiftright(col("__hi"), 64 - BucketShift) === col("__rb6") &&
              (col("__hi") > col("hs") ||
                (col("__hi") === col("hs") && col("__lo") >= col("ls"))) &&
              (col("__hi") < col("he") ||
                (col("__hi") === col("he") && col("__lo") <= col("le"))),
            "left_outer")
          .withColumn("country_iso_code",
            coalesce(col("country_iso_code"), col("__c6")))
          .drop("__hi", "__lo", "hs", "ls", "he", "le", "__c6", "__rb6")
    }
  }

  /** GeoLite2-Country CSV loader (the reference reads the same dataset
    * through the MaxMind binary reader, core.py:11,60-64): the
    * `...-Blocks-IPv4.csv` CIDRs become (ip_start, ip_end) and the
    * `...-Locations-<lang>.csv` join supplies `country_iso_code` —
    * falling back to `registered_country_geoname_id` when a block has
    * no geolocated id, as the GeoLite2 docs prescribe. One-time load,
    * broadcast thereafter.
    */
  def fromGeoLite2Csv(spark: SparkSession, blocksCsv: String,
                      locationsCsv: String): DataFrame = {
    val blocks = spark.read.option("header", "true").csv(blocksCsv)
    val base = ipv4ToLong(split(col("network"), "/").getItem(0))
    val prefix = split(col("network"), "/").getItem(1).cast("int")
    blocks
      .select(
        base.as("__base"), prefix.as("__p"),
        coalesce(col("geoname_id"), col("registered_country_geoname_id"))
          .as("__gid"))
      .filter(col("__base").isNotNull && col("__gid").isNotNull)
      .withColumn("ip_start", col("__base"))
      .withColumn("ip_end",
        expr("__base + shiftleft(CAST(1 AS BIGINT), 32 - __p) - 1"))
      .join(broadcast(locations(spark, locationsCsv)),
        col("__gid") === col("gid"))
      .select(col("ip_start"), col("ip_end"), col("country"))
  }

  /** GeoLite2 `...-Blocks-IPv6.csv` loader: CIDR → sign-flipped
    * (hs, ls, he, le) 128-bit range bounds + `country`, consumed by
    * [[enrich]]'s `v6Ranges` side.
    */
  def fromGeoLite2CsvV6(spark: SparkSession, blocksCsv: String,
                        locationsCsv: String): DataFrame = {
    val blocks = spark.read.option("header", "true").csv(blocksCsv)
    val (hi, lo) = ipv6ToLongs(split(col("network"), "/").getItem(0))
    val prefix = split(col("network"), "/").getItem(1).cast("int")
    blocks
      .select(hi.as("__hi"), lo.as("__lo"), prefix.as("__p"),
        coalesce(col("geoname_id"), col("registered_country_geoname_id"))
          .as("__gid"))
      .filter(col("__hi").isNotNull && col("__gid").isNotNull)
      // host-bit masks via unsigned right-shift of all-ones (a
      // shiftleft(1,k)−1 form would signed-overflow under ANSI at
      // k=63): for /p ≤ 64 the hi half spans its mask and the lo half
      // spans everything; for /p > 64 the hi half is fixed. The
      // boundary prefixes (64, 128) shift by a full word, which Java
      // shift semantics reduce mod 64 — special-cased to zero masks.
      .withColumn("__himask", expr(
        "CASE WHEN __p >= 64 THEN CAST(0 AS BIGINT) " +
          "ELSE shiftrightunsigned(CAST(-1 AS BIGINT), __p) END"))
      .withColumn("__lomask", expr(
        "CASE WHEN __p <= 64 THEN CAST(-1 AS BIGINT) " +
          "WHEN __p = 128 THEN CAST(0 AS BIGINT) " +
          "ELSE shiftrightunsigned(CAST(-1 AS BIGINT), __p - 64) END"))
      .withColumn("__he", expr("__hi | __himask"))
      .withColumn("__ls", expr("__lo & ~__lomask"))
      .withColumn("__le", expr("__lo | __lomask"))
      .join(broadcast(locations(spark, locationsCsv)),
        col("__gid") === col("gid"))
      .select(flipSign(expr("__hi & ~__himask")).as("hs"),
        flipSign(col("__ls")).as("ls"),
        flipSign(col("__he")).as("he"), flipSign(col("__le")).as("le"),
        col("country"))
  }

  private def locations(spark: SparkSession, locationsCsv: String): DataFrame =
    spark.read.option("header", "true").csv(locationsCsv)
      .select(col("geoname_id").as("gid"),
        col("country_iso_code").as("country"))
      .filter(col("country").isNotNull)

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
