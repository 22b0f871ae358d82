package graft.sources

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Binary MaxMind DB (`.mmdb`) reader — the format the reference embeds
  * at ingest (ballcone/core.py:11,60-64 opens GeoLite2-Country.mmdb;
  * __main__.py:18,50 wires the path). The public format spec
  * (maxmind.github.io/MaxMind-DB) is a binary search trie over IP bits
  * plus a typed data section; this reader decodes both DRIVER-SIDE —
  * the database is a lookup sidecar (megabytes), not data — and
  * flattens the trie into the SAME ranges DataFrames the CSV loaders
  * produce ([[GeoIp.fromGeoLite2Csv]] / [[GeoIp.fromGeoLite2CsvV6]]),
  * so [[GeoIp.enrich]]'s broadcast prefix-bucket range join — the part
  * that has to scale — is shared verbatim between both input formats,
  * and the per-row point-lookup of the reference never happens on the
  * hot path.
  *
  * Supports all three record sizes (24/28/32 bits), pointer-compressed
  * data records (GeoLite2 shares country maps across networks via
  * pointers), and both tree layouts: `ip_version=4` trees walk 32 bits
  * from the root; `ip_version=6` trees walk 128, with the
  * IPv4-embedded `::/96` subtree split out into the v4 table.
  */
object MaxMindDb {

  /** Metadata-section marker: 0xAB 0xCD 0xEF "MaxMind.com". */
  private val Marker: Array[Byte] =
    Array(0xAB.toByte, 0xCD.toByte, 0xEF.toByte) ++ "MaxMind.com".getBytes("US-ASCII")

  /** Parsed database: tree geometry + lazily-decoded data section. */
  private final case class Db(buf: Array[Byte], nodeCount: Int,
                              recordSize: Int, ipVersion: Int) {
    val nodeBytes: Int = recordSize * 2 / 8
    val treeSize: Int = nodeCount * nodeBytes
    val decoder = new Decoder(buf, treeSize + 16)
  }

  /** v4 ranges `(ip_start, ip_end, country)` — drop-in for
    * [[GeoIp.fromGeoLite2Csv]]. From an `ip_version=6` database the
    * IPv4 space is the `::/96`-embedded subtree (where the spec and
    * GeoLite2 store it).
    */
  def fromMmdb(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val db = load(spark, path)
    val nets =
      if (db.ipVersion == 4) networks(db, 32)
      else networks(db, 128).collect {
        case (base, p, c) if p >= 96 && (base >> 32) == 0 =>
          (base, p - 96, c)
      }
    nets.map { case (base, p, c) =>
      val start = base.toLong
      (start, start + (1L << (32 - p)) - 1, c)
    }.toDF("ip_start", "ip_end", "country")
  }

  /** v6 ranges as sign-flipped 64-bit halves `(hs, ls, he, le,
    * country)` — drop-in for [[GeoIp.fromGeoLite2CsvV6]]. The
    * v4-embedded `::/96` subtree is excluded (it belongs to the v4
    * table; v4 text never parses as v6 in [[GeoIp.enrich]] anyway).
    */
  def fromMmdbV6(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val db = load(spark, path)
    require(db.ipVersion == 6,
      s"fromMmdbV6 needs an ip_version=6 database, got ${db.ipVersion}")
    val mask64 = (BigInt(1) << 64) - 1
    def flipHi(x: BigInt): Long = ((x >> 64) & mask64).toLong ^ Long.MinValue
    def flipLo(x: BigInt): Long = (x & mask64).toLong ^ Long.MinValue
    networks(db, 128)
      .collect { case (base, p, c) if !(p >= 96 && (base >> 32) == 0) =>
        val end = base + (BigInt(1) << (128 - p)) - 1
        (flipHi(base), flipLo(base), flipHi(end), flipLo(end), c)
      }
      .toDF("hs", "ls", "he", "le", "country")
  }

  // ---------------------------------------------------------------- load

  private def load(spark: SparkSession, path: String): Db = {
    val buf = readBytes(spark, path)
    val markerAt = lastIndexOf(buf, Marker)
    require(markerAt >= 0, s"not a MaxMind DB file (no metadata marker): $path")
    val metaStart = markerAt + Marker.length
    val meta = new Decoder(buf, metaStart).decode(metaStart)._1
      .asInstanceOf[Map[String, Any]]
    def metaInt(k: String): Int = meta.get(k) match {
      case Some(v: Long) => v.toInt
      case other => throw new IllegalArgumentException(
        s"mmdb metadata missing/invalid '$k': $other")
    }
    val db = Db(buf, metaInt("node_count"), metaInt("record_size"),
      metaInt("ip_version"))
    require(Set(24, 28, 32)(db.recordSize),
      s"unsupported record_size ${db.recordSize}")
    require(db.treeSize + 16 <= buf.length, "truncated mmdb: tree overruns file")
    db
  }

  private def readBytes(spark: SparkSession, path: String): Array[Byte] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen
    require(len <= Int.MaxValue, s"mmdb too large to be a sidecar: $len bytes")
    val in = fs.open(p)
    try {
      val b = new Array[Byte](len.toInt)
      in.readFully(0, b)
      b
    } finally in.close()
  }

  /** Last occurrence of `pat` in `buf` (the spec says to search the
    * final 128 KiB from the end; metadata can also legitimately embed
    * the marker bytes inside a description, hence LAST).
    */
  private def lastIndexOf(buf: Array[Byte], pat: Array[Byte]): Int = {
    val from = math.max(0, buf.length - 128 * 1024)
    var i = buf.length - pat.length
    while (i >= from) {
      var j = 0
      while (j < pat.length && buf(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i -= 1
    }
    -1
  }

  // ---------------------------------------------------------------- tree

  /** One record of node `node`: `side` 0 = left (bit 0), 1 = right. */
  private def record(db: Db, node: Int, side: Int): Int = {
    val buf = db.buf
    def u8(i: Int): Int = buf(i) & 0xFF
    db.recordSize match {
      case 24 =>
        val o = node * 6 + side * 3
        (u8(o) << 16) | (u8(o + 1) << 8) | u8(o + 2)
      case 28 =>
        val o = node * 7
        if (side == 0)
          ((u8(o + 3) & 0xF0) << 20) | (u8(o) << 16) | (u8(o + 1) << 8) | u8(o + 2)
        else
          ((u8(o + 3) & 0x0F) << 24) | (u8(o + 4) << 16) | (u8(o + 5) << 8) | u8(o + 6)
      case 32 =>
        val o = node * 8 + side * 4
        (u8(o) << 24) | (u8(o + 1) << 16) | (u8(o + 2) << 8) | u8(o + 3)
    }
  }

  /** Depth-first flatten of the search trie into
    * `(network base, prefix length, country)` — data records without a
    * resolvable country ISO code are skipped (the reference's
    * AddressNotFoundError → None path). Countries memoize per data
    * offset: GeoLite2 points thousands of networks at a few hundred
    * shared records.
    */
  private def networks(db: Db, maxDepth: Int): Seq[(BigInt, Int, String)] = {
    val out = mutable.ArrayBuffer.empty[(BigInt, Int, String)]
    val countryCache = mutable.Map.empty[Int, Option[String]]
    def countryAt(value: Int): Option[String] =
      countryCache.getOrElseUpdate(value, {
        val abs = value - db.nodeCount + db.treeSize
        db.decoder.decode(abs)._1 match {
          case m: Map[_, _] =>
            val mm = m.asInstanceOf[Map[String, Any]]
            def iso(k: String): Option[String] = mm.get(k) match {
              case Some(cm: Map[_, _]) =>
                cm.asInstanceOf[Map[String, Any]].get("iso_code") match {
                  case Some(s: String) => Some(s)
                  case _ => None
                }
              case _ => None
            }
            iso("country").orElse(iso("registered_country"))
          case _ => None
        }
      })
    def walk(node: Int, prefix: BigInt, depth: Int): Unit = {
      if (depth >= maxDepth) return // malformed tree: deeper than the address
      var side = 0
      while (side <= 1) {
        val v = record(db, node, side)
        val p2 = (prefix << 1) | side
        if (v < db.nodeCount) walk(v, p2, depth + 1)
        else if (v > db.nodeCount) // == nodeCount is an explicit miss
          countryAt(v).foreach { c =>
            out += ((p2 << (maxDepth - depth - 1), depth + 1, c))
          }
        side += 1
      }
    }
    walk(0, BigInt(0), 0)
    out.toSeq
  }

  // ------------------------------------------------------------ decoding

  /** Data-section decoder (spec §"Data Section Separator" onward):
    * control byte = type (3 bits) + size (5 bits), with extended types,
    * extended sizes, and pointer indirection relative to `dataStart`.
    * Returns (decoded value, offset just past the encoded form).
    */
  private[sources] final class Decoder(buf: Array[Byte], dataStart: Int) {
    private def u8(i: Int): Int = buf(i) & 0xFF
    private def beLong(off: Int, n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | u8(off + i); i += 1 }
      v
    }

    def decode(off: Int): (Any, Int) = {
      val ctrl = u8(off)
      var typ = ctrl >>> 5
      var o = off + 1
      if (typ == 0) { typ = 7 + u8(o); o += 1 }
      if (typ == 1) {
        // pointer: ss selects width, value is offset into the data section
        val ss = (ctrl >>> 3) & 0x3
        val vvv = ctrl & 0x7
        val (ptr, next) = ss match {
          case 0 => ((vvv << 8) | u8(o), o + 1)
          case 1 => (((vvv << 16) | (u8(o) << 8) | u8(o + 1)) + 2048, o + 2)
          case 2 => (((vvv << 24) | (u8(o) << 16) | (u8(o + 1) << 8) | u8(o + 2))
                       + 526336, o + 3)
          case _ => (beLong(o, 4).toInt, o + 4)
        }
        return (decode(dataStart + ptr)._1, next)
      }
      var size = ctrl & 0x1F
      if (typ != 14) { // booleans keep size as the value
        if (size == 29) { size = 29 + u8(o); o += 1 }
        else if (size == 30) { size = 285 + ((u8(o) << 8) | u8(o + 1)); o += 2 }
        else if (size == 31) {
          size = 65821 + ((u8(o) << 16) | (u8(o + 1) << 8) | u8(o + 2)); o += 3
        }
      }
      typ match {
        case 2 => (new String(buf, o, size, "UTF-8"), o + size)
        case 3 => (java.lang.Double.longBitsToDouble(beLong(o, 8)), o + 8)
        case 4 => (java.util.Arrays.copyOfRange(buf, o, o + size), o + size)
        case 5 | 6 | 9 => (beLong(o, size), o + size) // uint16/32/64 → Long
        case 8 => (beLong(o, size), o + size)         // int32 (non-negative here)
        case 10 =>
          (BigInt(1, java.util.Arrays.copyOfRange(buf, o, o + size)), o + size)
        case 7 =>
          var m = Map.empty[String, Any]
          var p = o
          var i = 0
          while (i < size) {
            val (k, p1) = decode(p)
            val (v, p2) = decode(p1)
            m += (k.asInstanceOf[String] -> v)
            p = p2
            i += 1
          }
          (m, p)
        case 11 =>
          var a = Vector.empty[Any]
          var p = o
          var i = 0
          while (i < size) {
            val (v, p1) = decode(p)
            a :+= v
            p = p1
            i += 1
          }
          (a, p)
        case 14 => (size != 0, o)
        case 15 => (java.lang.Float.intBitsToFloat(beLong(o, 4).toInt).toDouble, o + 4)
        case t => throw new IllegalArgumentException(s"unsupported mmdb type $t")
      }
    }
  }
}
