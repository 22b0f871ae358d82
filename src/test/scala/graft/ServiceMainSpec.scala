package graft

import java.net.{DatagramPacket, DatagramSocket, InetAddress, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.sources.udp.UdpSource

/** End-to-end service assembly (reference __main__.py:43-98): real UDP
  * datagrams → graft-udp source → ingest → partitioned store → web API,
  * with the drain-then-stop shutdown flush.
  */
class ServiceMainSpec extends SparkSpec {

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("parseArgs mirrors the reference CLI surface") {
    val c = GraftMain.parseArgs(Array(
      "--syslog-port", "6514", "--web-port", "8081",
      "--warehouse", "/w", "--period", "2", "--top-limit", "7",
      "--days", "14"))
    assert(c.syslogPort === 6514 && c.webPort === 8081)
    assert(c.warehouse === "/w" && c.periodSeconds === 2)
    assert(c.topLimit === 7 && c.days === 14)
    intercept[IllegalArgumentException] {
      GraftMain.parseArgs(Array("--bogus", "1"))
    }
    intercept[IllegalArgumentException] {
      GraftMain.parseArgs(Array("--web-port"))
    }
  }

  test("udp datagrams land in the store and surface through the api") {
    UdpSource.lastBoundPort = -1
    val conf = GraftMain.Config(
      syslogPort = 0, // ephemeral: test binds whatever is free
      webPort = 0,
      warehouse = tmp("graft-main-wh"),
      checkpoint = tmp("graft-main-ckpt"),
      periodSeconds = 1,
      days = 5000)
    val (stream, api, webPort) = GraftMain.start(spark, conf)
    try {
      // the DSv2 source binds its socket when the query materializes
      val deadline = System.currentTimeMillis() + 30000
      while (UdpSource.lastBoundPort < 0 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      val udpPort = UdpSource.lastBoundPort
      assert(udpPort > 0, "udp source never bound")

      val socket = new DatagramSocket()
      try {
        (0 until 5).foreach { i =>
          val line =
            s"""<190>x: {"service": "blog", "ip": "10.0.0.$i", "host": "h", """ +
              s""""path": "/p$i", "status": "200", "referrer": "", """ +
              s""""user_agent": "curl/8.0", "length": $i, """ +
              s""""generation_time_milli": 0.5, "date": "2020-01-01T06:00:0$i+00:00"}"""
          val bytes = line.getBytes(StandardCharsets.UTF_8)
          socket.send(new DatagramPacket(bytes, bytes.length,
            InetAddress.getLoopbackAddress, udpPort))
        }
      } finally socket.close()

      // wait for the datagrams to reach the driver buffer, then drain —
      // the same processAllAvailable the shutdown hook runs as its
      // final flush
      val bufDeadline = System.currentTimeMillis() + 30000
      var drained = false
      while (!drained && System.currentTimeMillis() < bufDeadline) {
        Thread.sleep(200)
        stream.processAllAvailable()
        drained = try {
          spark.read.parquet(conf.warehouse).count() >= 5
        } catch { case _: Throwable => false }
      }
      assert(drained, "ingested rows never landed in the warehouse")

      val client = HttpClient.newHttpClient()
      val resp = client.send(
        HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:$webPort/api/blog/count?field=ip")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() === 200)
      assert(resp.body().contains(""""cnt":5"""))
    } finally {
      stream.stop()
      api.stop()
    }
  }
}
