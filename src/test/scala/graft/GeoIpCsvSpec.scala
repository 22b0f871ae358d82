package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.sources.GeoIp

/** GeoLite2 CSV loaders (v4 + v6) and the IPv6 textual parser. */
class GeoIpCsvSpec extends SparkSpec {
  import spark.implicits._

  private def write(dir: String, name: String, content: String): String = {
    val p = Paths.get(dir, name)
    Files.write(p, content.getBytes)
    p.toString
  }

  private lazy val dir = Files.createTempDirectory("graft-geo").toString

  private lazy val locationsCsv = write(dir, "locations.csv",
    """geoname_id,locale_code,continent_code,continent_name,country_iso_code,country_name,is_in_european_union
      |2077456,en,OC,Oceania,AU,Australia,0
      |2635167,en,EU,Europe,GB,"United Kingdom",1
      |6252001,en,NA,"North America",US,"United States",0
      |1861060,en,AS,Asia,JP,Japan,0
      |2921044,en,EU,Europe,DE,Germany,1
      |3017382,en,EU,Europe,FR,France,1
      |""".stripMargin)

  private lazy val blocksV4Csv = write(dir, "blocks-v4.csv",
    """network,geoname_id,registered_country_geoname_id,represented_country_geoname_id,is_anonymous_proxy,is_satellite_provider
      |1.0.0.0/24,2077456,2077456,,0,0
      |5.44.16.0/23,2635167,2635167,,0,0
      |8.8.8.0/24,,6252001,,0,0
      |""".stripMargin)

  private lazy val blocksV6Csv = write(dir, "blocks-v6.csv",
    """network,geoname_id,registered_country_geoname_id,represented_country_geoname_id,is_anonymous_proxy,is_satellite_provider
      |2001:200::/32,1861060,1861060,,0,0
      |2a02:26f7:c9c0::/44,2921044,2921044,,0,0
      |2001:db8:0:1:2:3::/96,3017382,3017382,,0,0
      |""".stripMargin)

  test("ipv6ToLongs: full, compressed, and edge textual forms") {
    val (hi, lo) = GeoIp.ipv6ToLongs(col("ip"))
    val got = Seq("2001:db8::1", "::1", "::", "1::",
        "2001:0db8:0000:0000:0000:0000:0000:0001",
        "fe80::a:b:c:d", "10.0.0.1", "nonsense")
      .toDF("ip").select(col("ip"), hi.as("hi"), lo.as("lo"))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
         Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    assert(got("2001:db8::1") === (Some(0x20010db800000000L), Some(1L)))
    assert(got("2001:0db8:0000:0000:0000:0000:0000:0001") ===
      (Some(0x20010db800000000L), Some(1L)))
    assert(got("::1") === (Some(0L), Some(1L)))
    assert(got("::") === (Some(0L), Some(0L)))
    assert(got("1::") === (Some(0x0001000000000000L), Some(0L)))
    assert(got("fe80::a:b:c:d") ===
      (Some(0xfe80000000000000L), Some(0x000a000b000c000dL)))
    // v4 and garbage fall to the null path (matched by neither table)
    assert(got("10.0.0.1") === (None, None))
    assert(got("nonsense") === (None, None))
  }

  test("GeoLite2 v4 CSV: CIDR ranges + registered-country fallback") {
    val ranges = GeoIp.fromGeoLite2Csv(spark, blocksV4Csv, locationsCsv)
    val got = Seq("1.0.0.42", "5.44.17.200", "8.8.8.8", "9.9.9.9",
      "::ffff:1.0.0.7", "::FFFF:9.9.9.9")
      .toDF("ip")
    val out = GeoIp.enrich(got, "ip", ranges)
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("1.0.0.42") === Some("AU"))
    assert(out("5.44.17.200") === Some("GB")) // /23 spans 16..17
    assert(out("8.8.8.8") === Some("US"))     // geoname_id empty -> registered
    assert(out("9.9.9.9") === None)
    // IPv4-mapped IPv6 (dual-stack nginx) resolves through the v4 table
    assert(out("::ffff:1.0.0.7") === Some("AU"))
    assert(out("::FFFF:9.9.9.9") === None)
  }

  test("GeoLite2 v6 CSV: range match incl. /44 and /96 prefixes") {
    val v4 = GeoIp.fromGeoLite2Csv(spark, blocksV4Csv, locationsCsv)
    val v6 = GeoIp.fromGeoLite2CsvV6(spark, blocksV6Csv, locationsCsv)
    val got = Seq(
      "2001:200:1:2::3",          // inside 2001:200::/32
      "2a02:26f7:c9c5::77",       // inside the /44 (c9c0..c9cf)
      "2a02:26f7:c9d0::77",       // just past the /44
      "2001:db8:0:1:2:3:dead:beef", // inside the /96 (p > 64 path)
      "2001:db8:0:1:2:4::",       // outside the /96
      "1.0.0.42",                 // v4 rows still take the v4 table
      "9.9.9.9")
      .toDF("ip")
    val out = GeoIp.enrich(got, "ip", v4, Some(v6))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("2001:200:1:2::3") === Some("JP"))
    assert(out("2a02:26f7:c9c5::77") === Some("DE"))
    assert(out("2a02:26f7:c9d0::77") === None)
    assert(out("2001:db8:0:1:2:3:dead:beef") === Some("FR"))
    assert(out("2001:db8:0:1:2:4::") === None)
    assert(out("1.0.0.42") === Some("AU"))
    assert(out("9.9.9.9") === None)
  }

  test("ingest pipeline accepts the v6 table without changing v4 rows") {
    val lines = Seq(
      """<190>x: {"service": "s", "ip": "10.0.0.1", "host": "h", "path": "/", "status": "200", "referrer": "", "user_agent": "curl/8.0", "length": 1, "generation_time_milli": 0.1, "date": "2020-01-01T00:00:00+00:00"}""",
      """<190>x: {"service": "s", "ip": "2001:200::42", "host": "h", "path": "/", "status": "200", "referrer": "", "user_agent": "curl/8.0", "length": 1, "generation_time_milli": 0.1, "date": "2020-01-01T00:00:01+00:00"}""")
      .toDF("value")
    val v6 = GeoIp.fromGeoLite2CsvV6(spark, blocksV6Csv, locationsCsv)
    val out = graft.sources.Ingest.pipeline(lines,
        GeoIp.demoRanges(spark), geoRangesV6 = Some(v6))
      .select("ip", "country_iso_code")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("10.0.0.1") === Some("US"))
    assert(out("2001:200::42") === Some("JP"))
  }
}
