package graft

import org.apache.spark.sql.functions._
import graft.sources.GeoIp

/** The prefix-bucketed GeoIP range join: equivalence with a naive
  * range-match (the spec oracle), multi-bucket ranges, and the plan
  * shape that makes it hold against the full GeoLite2 table — a hash
  * join on the /16 bucket, never a nested-loop scan of all ranges.
  */
class GeoIpJoinSpec extends SparkSpec {
  import spark.implicits._

  // ranges crossing bucket boundaries on purpose: a /8 (256 buckets),
  // a /15 (2 buckets), and /24s (sub-bucket)
  private lazy val ranges = Seq(
    (num("9.0.0.0"), num("9.255.255.255"), "AA"),
    (num("10.2.0.0"), num("10.3.255.255"), "BB"),
    (num("10.4.5.0"), num("10.4.5.255"), "CC"),
    (num("203.0.113.0"), num("203.0.113.255"), "JP")
  ).toDF("ip_start", "ip_end", "country")

  private def num(s: String): Long =
    s.split('.').foldLeft(0L)((acc, o) => acc * 256 + o.toLong)

  private lazy val ips = Seq(
    "9.0.0.0", "9.123.45.67", "9.255.255.255",     // /8 span
    "10.2.0.0", "10.2.255.255", "10.3.0.0", "10.3.255.255", // /15 span
    "10.4.5.7", "10.4.6.7",                        // in/out of the /24
    "203.0.113.200", "203.0.114.1",                // edge of /24
    "8.8.8.8", "not-an-ip", "2001:db8::1"          // no match / non-v4
  ).toDF("ip")

  test("bucketed enrich matches the naive range join, incl. multi-bucket ranges") {
    val got = GeoIp.enrich(ips, "ip", ranges)
      .select("ip", "country_iso_code").as[(String, Option[String])]
      .collect().toMap
    val naive = ips
      .withColumn("__n", GeoIp.ipv4ToLong(col("ip")))
      .join(ranges, col("__n") >= col("ip_start") && col("__n") <= col("ip_end"),
        "left_outer")
      .select("ip", "country").as[(String, Option[String])]
      .collect().toMap
    assert(got === naive)
    assert(got("9.123.45.67") === Some("AA"))
    assert(got("10.3.255.255") === Some("BB"))
    assert(got("10.4.6.7") === None)
    assert(got("2001:db8::1") === None)
  }

  test("v6 bucketed enrich still matches ranges that span hi-half buckets") {
    // a /8 v6 range spans 2^8 of the /16 hi-buckets
    def flipped(ip: String): (Long, Long) = {
      val (h, l) = GeoIp.ipv6ToLongs(col("ip"))
      val r = Seq(ip).toDF("ip")
        .select(GeoIp.flipSign(h).as("h"), GeoIp.flipSign(l).as("l"))
        .as[(Long, Long)].head()
      r
    }
    val (hs, ls) = flipped("2600::")
    val (he, le) = flipped("26ff:ffff:ffff:ffff:ffff:ffff:ffff:ffff")
    val r6 = Seq((hs, ls, he, le, "US")).toDF("hs", "ls", "he", "le", "country")
    val got = GeoIp.enrich(
        Seq("2600::1", "26aa:bb::cc", "2700::1", "10.0.0.1").toDF("ip"),
        "ip", ranges, Some(r6))
      .select("ip", "country_iso_code").as[(String, Option[String])]
      .collect().toMap
    assert(got("2600::1") === Some("US"))
    assert(got("26aa:bb::cc") === Some("US"))
    assert(got("2700::1") === None)
    assert(got("10.0.0.1") === None)
  }

  test("enrich plans a broadcast HASH join on the bucket, not a nested loop") {
    val p = GeoIp.enrich(ips, "ip", ranges)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }
}
