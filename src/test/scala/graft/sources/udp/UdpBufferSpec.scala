package graft.sources.udp

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.charset.StandardCharsets

/** Driver-buffer policies of the UDP source, unit-level (no query):
  * tail-drop at the maxBuffer cap, and restart offset fast-forward.
  */
class UdpBufferSpec extends graft.SparkSpec {

  private def send(port: Int, lines: Seq[String]): Unit = {
    val sock = new DatagramSocket()
    try lines.foreach { l =>
      val b = l.getBytes(StandardCharsets.UTF_8)
      sock.send(new DatagramPacket(b, b.length,
        InetAddress.getLoopbackAddress, port))
    } finally sock.close()
  }

  private def await(cond: => Boolean, ms: Long = 20000): Boolean = {
    val deadline = System.currentTimeMillis() + ms
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
    cond
  }

  private def n(o: org.apache.spark.sql.connector.read.streaming.Offset): Long =
    o.asInstanceOf[UdpOffset].n

  test("buffer tail-drops at the cap and resumes after commit") {
    val stream = new UdpMicroBatchStream(0, maxBuffer = 3)
    try {
      val port = UdpSource.lastBoundPort
      send(port, (1 to 6).map(i => s"d$i"))
      // 3 buffered, 3 shed — offsets stay contiguous
      assert(await(stream.droppedCount === 3L), "drops never registered")
      assert(n(stream.latestOffset()) === 3L)
      val parts = stream.planInputPartitions(UdpOffset(0), stream.latestOffset())
      val rows = parts.flatMap(_.asInstanceOf[UdpInputPartition].lines)
      assert(rows.length === 3)
      // delivery drains the buffer: new datagrams are accepted again
      stream.commit(UdpOffset(3))
      send(port, Seq("d7"))
      assert(await(n(stream.latestOffset()) === 4L), "post-drain datagram lost")
    } finally stream.stop()
  }

  test("restart fast-forwards numbering even with a raced-in datagram") {
    val stream = new UdpMicroBatchStream(0, maxBuffer = 100)
    try {
      val port = UdpSource.lastBoundPort
      // a datagram lands BETWEEN bind and checkpoint restore — the r1
      // race: a non-empty buffer must not pin the numbering at 0
      send(port, Seq("early"))
      assert(await(stream.bufferedCount === 1))
      // recovery deserializes BOTH endpoints of a pending replay
      // batch; the LARGEST restored offset wins regardless of order
      stream.deserializeOffset("50")
      stream.deserializeOffset("40")
      // buffered datagram renumbered to start at the restored offset
      assert(n(stream.latestOffset()) === 51L)
      // a replayed pre-crash range is honestly empty (the data is gone)
      assert(stream.planInputPartitions(UdpOffset(40), UdpOffset(50)).isEmpty)
      // after the first planned batch, deserializes are plain reads
      stream.deserializeOffset("99")
      assert(n(stream.latestOffset()) === 51L)
    } finally stream.stop()
  }

  test("concurrent send/plan/commit delivers every datagram exactly once") {
    val stream = new UdpMicroBatchStream(0, maxBuffer = 100000)
    try {
      val port = UdpSource.lastBoundPort
      val total = 2000
      val sender = new Thread(() => {
        val sock = new DatagramSocket()
        try (0 until total).foreach { i =>
          val b = s"m$i".getBytes(StandardCharsets.UTF_8)
          sock.send(new DatagramPacket(b, b.length,
            InetAddress.getLoopbackAddress, port))
          if (i % 200 == 0) Thread.sleep(1)
        } finally sock.close()
      }, "udp-stress-sender")
      sender.start()

      // live micro-batch loop racing the sender: plan whatever is
      // available, deliver, commit — repeatedly
      val got = scala.collection.mutable.ArrayBuffer.empty[String]
      var prev = 0L
      val deadline = System.currentTimeMillis() + 60000
      while (got.size < total && System.currentTimeMillis() < deadline) {
        val latest = n(stream.latestOffset())
        if (latest > prev) {
          stream.planInputPartitions(UdpOffset(prev), UdpOffset(latest))
            .foreach(p => got ++= p.asInstanceOf[UdpInputPartition].lines)
          stream.commit(UdpOffset(latest))
          prev = latest
        } else Thread.sleep(5)
      }
      sender.join(10000)
      // loopback UDP from one socket drops nothing at this rate:
      // exactly-once within the session, no dupes, no gaps
      assert(got.size === total, s"delivered ${got.size} of $total")
      assert(got.toSet.size === total, "duplicate delivery detected")
    } finally stream.stop()
  }

  test("uncommitted-batch replay (start deserialized first) trims nothing live") {
    val stream = new UdpMicroBatchStream(0, maxBuffer = 100)
    try {
      val port = UdpSource.lastBoundPort
      send(port, Seq("fresh"))
      assert(await(stream.bufferedCount === 1))
      // runBatch recovery order for a batch that was planned but not
      // committed: start offset deserialized before end offset
      stream.deserializeOffset("90")
      stream.deserializeOffset("100")
      // base must land on the END (100): the replay [90,100) is empty
      // and its commit removes no live datagrams
      assert(stream.planInputPartitions(UdpOffset(90), UdpOffset(100)).isEmpty)
      stream.commit(UdpOffset(100))
      assert(stream.bufferedCount === 1, "live datagram was trimmed by the replay commit")
      assert(n(stream.latestOffset()) === 101L)
    } finally stream.stop()
  }
}
