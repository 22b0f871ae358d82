package graft

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.charset.StandardCharsets

import graft.sources.udp.UdpSource

/** The DSv2 UDP micro-batch source end-to-end: datagrams in, rows out. */
class UdpSourceSpec extends SparkSpec {

  test("udp source delivers datagrams as value rows") {
    val stream = spark.readStream
      .format("graft-udp")
      .option("port", "0") // ephemeral
      .load()
    val q = stream.writeStream
      .format("memory")
      .queryName("udp_rows")
      .start()
    try {
      // wait for the listener to bind
      val deadline = System.currentTimeMillis() + 20000
      while (UdpSource.lastBoundPort <= 0 &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      val port = UdpSource.lastBoundPort
      assert(port > 0, "listener never bound")

      val sock = new DatagramSocket()
      val addr = InetAddress.getLoopbackAddress
      // SHORT datagram first: DatagramPacket.receive shrinks the
      // packet length, so a missing reset would truncate the long
      // JSON line that follows (regression for the setLength fix)
      val lines = Seq(
        "short",
        """<190>x: {"service": "udp", "ip": "10.0.0.1", "host": "h", "path": "/", "status": "200", "referrer": "", "user_agent": "curl/8.0", "length": 1, "generation_time_milli": 0.1, "date": "2020-01-01T00:00:00+00:00"}""",
        "<190>y: {\"k\": 1}")
      lines.foreach { l =>
        val b = l.getBytes(StandardCharsets.UTF_8)
        sock.send(new DatagramPacket(b, b.length, addr, port))
      }
      sock.close()

      // poll until the memory sink has all three raw rows
      var n = 0L
      while (n < 3 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        n = spark.table("udp_rows").count()
        if (n < 3) Thread.sleep(200)
      }
      assert(n === 3, "expected all datagrams as raw rows")

      // the real pipeline over the delivered rows keeps only the valid one
      val parsed = graft.sources.Ingest.pipeline(
        spark.table("udp_rows"), graft.sources.GeoIp.demoRanges(spark))
      val kept = parsed.collect()
      assert(kept.length === 1)
      assert(kept.head.getAs[String]("service") === "udp")
      assert(kept.head.getAs[String]("country_iso_code") === "US")
    } finally q.stop()
  }
}
