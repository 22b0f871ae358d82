package graft

import java.nio.file.{Files, Paths}

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

import graft.sources.{GeoIp, MaxMindDb}

/** Binary `.mmdb` reader against generated fixtures: all three record
  * sizes, pointer-shared data records, v4 and v6 tree layouts, and
  * byte-for-byte enrichment parity with the CSV loaders.
  */
class MaxMindDbSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal MaxMind-DB writer for fixtures (format per the public
    * spec): binary trie over address bits, a data section where each
    * network's record is `{"country": → {"iso_code": CC}}` with the
    * inner map shared through a POINTER (as real GeoLite2 files share
    * records), 16-byte separator, metadata marker + map.
    */
  private object Fixture {
    private def be(v: Int, n: Int): Array[Byte] =
      (1 to n).map(i => ((v >>> (8 * (n - i))) & 0xFF).toByte).toArray
    private def minimalBE(v: Long): Array[Byte] = {
      var x = v
      val b = ArrayBuffer.empty[Byte]
      while (x != 0) { b.prepend((x & 0xFF).toByte); x >>>= 8 }
      b.toArray
    }
    def encStr(s: String): Array[Byte] = {
      val b = s.getBytes("UTF-8"); require(b.length < 29)
      ((2 << 5) | b.length).toByte +: b
    }
    def encUint16(v: Long): Array[Byte] = {
      val b = minimalBE(v); ((5 << 5) | b.length).toByte +: b
    }
    def encUint32(v: Long): Array[Byte] = {
      val b = minimalBE(v); ((6 << 5) | b.length).toByte +: b
    }
    def encUint64(v: Long): Array[Byte] = {
      val b = minimalBE(v)
      Array(((0 << 5) | b.length).toByte, 2.toByte) ++ b
    }
    def encMap(pairs: (String, Array[Byte])*): Array[Byte] = {
      require(pairs.size < 29)
      ((7 << 5) | pairs.size).toByte +:
        pairs.toArray.flatMap { case (k, v) => encStr(k) ++ v }
    }
    def encArray(elems: Array[Byte]*): Array[Byte] =
      Array(((0 << 5) | elems.size).toByte, 4.toByte) ++ elems.flatten
    def encPointer(off: Int): Array[Byte] = {
      require(off < 2048)
      Array((0x20 | ((off >> 8) & 0x7)).toByte, (off & 0xFF).toByte)
    }

    /** Build a database over disjoint `(base, prefix, country)`
      * networks; `depth` 32 → ip_version 4, 128 → ip_version 6.
      */
    def build(networks: Seq[(BigInt, Int, String)], recordSize: Int,
              depth: Int): Array[Byte] = {
      val nodes = ArrayBuffer[Array[AnyRef]](Array[AnyRef](null, null))
      def insert(base: BigInt, prefix: Int, country: String): Unit = {
        var n = 0
        for (d <- 0 until prefix) {
          val bit = ((base >> (depth - 1 - d)) & 1).toInt
          if (d == prefix - 1) nodes(n)(bit) = country
          else nodes(n)(bit) match {
            case i: Integer => n = i.intValue
            case null =>
              nodes += Array[AnyRef](null, null)
              nodes(n)(bit) = Int.box(nodes.length - 1)
              n = nodes.length - 1
            case _ => sys.error("fixture networks must be disjoint")
          }
        }
      }
      networks.foreach { case (b, p, c) => insert(b, p, c) }
      val nodeCount = nodes.length

      val data = ArrayBuffer.empty[Byte]
      val countries = networks.map(_._3).distinct
      val innerOff = countries.map { c =>
        val off = data.length
        data ++= encMap("iso_code" -> encStr(c))
        c -> off
      }.toMap
      val recOff = mutable.Map.empty[String, Int]
      countries.foreach { c =>
        recOff(c) = data.length
        data ++= encMap("country" -> encPointer(innerOff(c)))
      }

      def recValue(slot: AnyRef): Int = slot match {
        case null => nodeCount
        case i: Integer => i.intValue
        case s: String => nodeCount + 16 + recOff(s)
        case _ => sys.error("unreachable")
      }
      val tree = ArrayBuffer.empty[Byte]
      nodes.foreach { n =>
        val l = recValue(n(0))
        val r = recValue(n(1))
        recordSize match {
          case 24 => tree ++= be(l, 3) ++ be(r, 3)
          case 28 =>
            tree ++= be(l & 0xFFFFFF, 3)
            tree += ((((l >>> 24) & 0xF) << 4) | ((r >>> 24) & 0xF)).toByte
            tree ++= be(r & 0xFFFFFF, 3)
          case 32 => tree ++= be(l, 4) ++ be(r, 4)
        }
      }

      val meta = encMap(
        "binary_format_major_version" -> encUint16(2),
        "binary_format_minor_version" -> encUint16(0),
        "build_epoch" -> encUint64(1700000000L),
        "database_type" -> encStr("GeoLite2-Country"),
        "description" -> encMap("en" -> encStr("graft test fixture")),
        "ip_version" -> encUint16(if (depth == 32) 4 else 6),
        "languages" -> encArray(encStr("en")),
        "node_count" -> encUint32(nodeCount),
        "record_size" -> encUint16(recordSize))

      tree.toArray ++ Array.fill[Byte](16)(0) ++ data.toArray ++
        Array(0xAB.toByte, 0xCD.toByte, 0xEF.toByte) ++
        "MaxMind.com".getBytes("US-ASCII") ++ meta
    }
  }

  private lazy val dir = Files.createTempDirectory("graft-mmdb").toString

  private def writeDb(name: String, bytes: Array[Byte]): String = {
    val p = Paths.get(dir, name)
    Files.write(p, bytes)
    p.toString
  }

  private def ip(s: String): BigInt =
    BigInt(s.split('.').foldLeft(0L)((acc, o) => acc * 256 + o.toLong))

  // the demoRanges networks, as CIDRs
  private val demoNets = Seq(
    (ip("10.0.0.0"), 8, "US"),
    (ip("192.168.0.0"), 16, "DE"),
    (ip("203.0.113.0"), 24, "JP"))

  test("fromMmdb reproduces the ranges table at every record size") {
    val expected = GeoIp.demoRanges(spark)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    for (rs <- Seq(24, 28, 32)) {
      val path = writeDb(s"demo-$rs.mmdb", Fixture.build(demoNets, rs, 32))
      val got = MaxMindDb.fromMmdb(spark, path)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSet
      assert(got === expected, s"record_size=$rs")
    }
  }

  test("identical enrichment from CSV and mmdb inputs") {
    // same networks as GeoIpCsvSpec's blocks-v4 fixture
    val locationsCsv = {
      val p = Paths.get(dir, "locations.csv")
      Files.write(p,
        """geoname_id,locale_code,continent_code,continent_name,country_iso_code,country_name,is_in_european_union
          |2077456,en,OC,Oceania,AU,Australia,0
          |2635167,en,EU,Europe,GB,"United Kingdom",1
          |6252001,en,NA,"North America",US,"United States",0
          |""".stripMargin.getBytes)
      p.toString
    }
    val blocksCsv = {
      val p = Paths.get(dir, "blocks.csv")
      Files.write(p,
        """network,geoname_id,registered_country_geoname_id,represented_country_geoname_id,is_anonymous_proxy,is_satellite_provider
          |1.0.0.0/24,2077456,2077456,,0,0
          |5.44.16.0/23,2635167,2635167,,0,0
          |8.8.8.0/24,,6252001,,0,0
          |""".stripMargin.getBytes)
      p.toString
    }
    val mmdbPath = writeDb("parity.mmdb", Fixture.build(Seq(
      (ip("1.0.0.0"), 24, "AU"),
      (ip("5.44.16.0"), 23, "GB"),
      (ip("8.8.8.0"), 24, "US")), 28, 32))

    val probes = Seq("1.0.0.42", "5.44.17.200", "8.8.8.8", "9.9.9.9",
      "::ffff:1.0.0.7").toDF("ip")
    def resolve(ranges: org.apache.spark.sql.DataFrame) =
      GeoIp.enrich(probes, "ip", ranges)
        .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    val fromCsv = resolve(GeoIp.fromGeoLite2Csv(spark, blocksCsv, locationsCsv))
    val fromBin = resolve(MaxMindDb.fromMmdb(spark, mmdbPath))
    assert(fromBin === fromCsv)
    assert(fromBin("5.44.17.200") === Some("GB")) // /23 spans .16-.17
    assert(fromBin("9.9.9.9") === None)
  }

  test("malformed files fail loudly, not with garbage ranges") {
    // no metadata marker at all
    val junk = writeDb("junk.mmdb", Array.fill[Byte](256)(0x41))
    val e1 = intercept[IllegalArgumentException](
      MaxMindDb.fromMmdb(spark, junk))
    assert(e1.getMessage.contains("no metadata marker"))
    // valid marker + metadata, but node_count claims a tree larger
    // than the file
    val lying = {
      val good = Fixture.build(demoNets, 24, 32)
      val marker = Array(0xAB.toByte, 0xCD.toByte, 0xEF.toByte) ++
        "MaxMind.com".getBytes("US-ASCII")
      val meta = Fixture.encMap(
        "ip_version" -> Fixture.encUint16(4),
        "node_count" -> Fixture.encUint32(1000000),
        "record_size" -> Fixture.encUint16(24))
      good ++ marker ++ meta
    }
    val p2 = writeDb("lying.mmdb", lying)
    val e2 = intercept[IllegalArgumentException](
      MaxMindDb.fromMmdb(spark, p2))
    assert(e2.getMessage.contains("truncated"))
  }

  test("ip_version=6 database: v6 ranges match the CSV loader, embedded v4 splits out") {
    // 2001:200::/32 → JP (real v6), 10.0.0.0/8 embedded at ::/96+8
    val v6Nets = Seq(
      (BigInt("20010200", 16) << 96, 32, "JP"),
      (ip("10.0.0.0"), 96 + 8, "US"))
    val path = writeDb("v6.mmdb", Fixture.build(v6Nets, 28, 128))

    // the embedded ::/96 subtree becomes the v4 table
    val v4got = MaxMindDb.fromMmdb(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(v4got === Seq((ip("10.0.0.0").toLong,
      ip("10.255.255.255").toLong, "US")))

    // v6 halves match fromGeoLite2CsvV6 on the same network bit-for-bit
    val locationsCsv = Paths.get(dir, "loc6.csv")
    Files.write(locationsCsv,
      """geoname_id,locale_code,continent_code,continent_name,country_iso_code,country_name,is_in_european_union
        |1861060,en,AS,Asia,JP,Japan,0
        |""".stripMargin.getBytes)
    val blocksV6 = Paths.get(dir, "blocks6.csv")
    Files.write(blocksV6,
      """network,geoname_id,registered_country_geoname_id,represented_country_geoname_id,is_anonymous_proxy,is_satellite_provider
        |2001:200::/32,1861060,1861060,,0,0
        |""".stripMargin.getBytes)
    val csvRows = GeoIp.fromGeoLite2CsvV6(spark, blocksV6.toString,
        locationsCsv.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSet
    val binRows = MaxMindDb.fromMmdbV6(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSet
    assert(binRows === csvRows)

    // end-to-end: both tables from one binary file enrich correctly
    val probes = Seq("2001:200:1:2::3", "10.0.0.1", "9.9.9.9").toDF("ip")
    val out = GeoIp.enrich(probes, "ip", MaxMindDb.fromMmdb(spark, path),
        Some(MaxMindDb.fromMmdbV6(spark, path)))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out === Map("2001:200:1:2::3" -> Some("JP"),
      "10.0.0.1" -> Some("US"), "9.9.9.9" -> None))
  }

  test("property: random tries decode to the same ranges as the CSV loader") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val countryPool = Vector("US", "DE", "JP", "GB", "AU", "FR", "BR", "IN")
    val gids = countryPool.zipWithIndex.map { case (c, j) => c -> (1000 + j) }.toMap
    val netGen: Gen[(BigInt, Int, String)] = for {
      p <- Gen.choose(1, 24)
      bits <- Gen.choose(0L, (1L << p) - 1)
      c <- Gen.oneOf(countryPool)
    } yield (BigInt(bits) << (32 - p), p, c)
    // greedy disjoint filter: drop any net nested in (or containing) a
    // kept one — the fixture builder requires a proper leaf trie
    def disjoint(nets: Seq[(BigInt, Int, String)]) = {
      val kept = ArrayBuffer.empty[(BigInt, Int, String)]
      nets.foreach { case n @ (b, p, _) =>
        if (kept.forall { case (b2, p2, _) =>
          val m = math.min(p, p2)
          (b >> (32 - m)) != (b2 >> (32 - m))
        }) kept += n
      }
      kept.toSeq
    }
    def cidr(b: BigInt, p: Int): String = {
      val v = b.toLong
      s"${(v >> 24) & 0xFF}.${(v >> 16) & 0xFF}.${(v >> 8) & 0xFF}.${v & 0xFF}/$p"
    }
    val locCsv = {
      val p = Paths.get(dir, "prop-loc.csv")
      val rows = countryPool.map(c =>
        s"${gids(c)},en,NA,Continent,$c,Country $c,0")
      Files.write(p,
        ("geoname_id,locale_code,continent_code,continent_name,country_iso_code,country_name,is_in_european_union" +:
          rows).mkString("\n").getBytes)
      p.toString
    }
    for (i <- 0 until 9) {
      val raw = Gen.listOfN(40, netGen)
        .apply(Gen.Parameters.default, Seed(4242L + i)).getOrElse(Nil)
      val nets = disjoint(raw).take(30)
      assert(nets.nonEmpty, s"iteration $i generated no networks")
      val rs = Seq(24, 28, 32)(i % 3)
      val mmdbPath = writeDb(s"prop-$i.mmdb", Fixture.build(nets, rs, 32))
      val blocksCsv = {
        val p = Paths.get(dir, s"prop-blocks-$i.csv")
        val rows = nets.map { case (b, pre, c) =>
          s"${cidr(b, pre)},${gids(c)},${gids(c)},,0,0"
        }
        Files.write(p,
          ("network,geoname_id,registered_country_geoname_id,represented_country_geoname_id,is_anonymous_proxy,is_satellite_provider" +:
            rows).mkString("\n").getBytes)
        p.toString
      }
      val expected = GeoIp.fromGeoLite2Csv(spark, blocksCsv, locCsv)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val got = MaxMindDb.fromMmdb(spark, mmdbPath)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got === expected,
        s"iteration $i record_size=$rs nets=${nets.size}")
    }
  }
}
