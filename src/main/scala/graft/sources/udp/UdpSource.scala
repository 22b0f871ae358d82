package graft.sources.udp

import java.net.{DatagramPacket, DatagramSocket}
import java.nio.charset.StandardCharsets
import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 micro-batch UDP source — the engine's O1 (the reference ingests
  * nginx access logs as JSON-over-syslog UDP datagrams on port 65140,
  * ballcone/syslog_protocol.py:23-49, README.md:32).
  *
  * `spark.readStream.format("graft-udp").option("port", 65140)` yields
  * `value: string` rows, one per datagram, feeding the same
  * [[graft.sources.Ingest.pipeline]] as every other source.
  *
  * Design: datagrams are received on the DRIVER by a daemon thread into
  * an offset-indexed buffer; each micro-batch plans one input partition
  * carrying its slice, and `commit` trims delivered rows. This mirrors
  * Spark's own TextSocketMicroBatchStream — the right shape for a
  * low-rate control stream. Once buffered, delivery is at-least-once
  * WITHIN a process lifetime (checkpointed offsets); the wire hop
  * stays at-most-once because UDP is, and datagrams arriving while
  * the process is down are lost (SURVEY §2.10 — the reference's
  * volatile deque loses strictly more).
  */
class UdpSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-udp"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    UdpSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new UdpTable(properties.getOrDefault("port", "65140").toInt,
      properties.getOrDefault("maxBuffer", UdpSource.DefaultMaxBuffer.toString).toInt)
}

object UdpSource {
  val schema: StructType = StructType(Seq(StructField("value", StringType)))

  /** Buffered-datagram cap before tail-drop (option `maxBuffer`):
    * a stalled stream must not grow the driver buffer without bound.
    * At the cap, NEW datagrams are dropped (oldest-kept, so offset
    * numbering stays contiguous) — the same at-most-once spirit as the
    * reference's volatile deque, which likewise sheds under pressure.
    */
  val DefaultMaxBuffer: Int = 262144

  /** Last bound port (for tests binding port 0 = ephemeral). */
  @volatile var lastBoundPort: Int = -1
}

private[udp] class UdpTable(port: Int, maxBuffer: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft-udp:$port"
  override def schema(): StructType = UdpSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = UdpSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new UdpMicroBatchStream(port, maxBuffer)
      }
    }
}

private[udp] case class UdpOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[udp] class UdpMicroBatchStream(port: Int,
    maxBuffer: Int = UdpSource.DefaultMaxBuffer) extends MicroBatchStream {

  /** Datagrams shed at the `maxBuffer` cap (observability for tests
    * and ops — a nonzero value means the persist loop is behind).
    */
  @volatile var droppedCount: Long = 0L

  // offset-indexed buffer: element i holds datagram (base + i)
  private val buffer = ArrayBuffer.empty[String]
  private var base = 0L
  // recovery phase flag: until the engine starts planning/serving
  // batches, every deserialized checkpoint offset may fast-forward the
  // numbering (the recovery pass deserializes BOTH endpoints of a
  // pending replay batch — keying off only the first call would pin
  // base at the replay's START and map live datagrams into the dead
  // pre-crash range, where commit() would discard undelivered rows)
  private var active = false

  private val socket = new DatagramSocket(port)
  // widen the kernel rx queue (default ~208 KB ≈ 300 small datagrams):
  // a descheduled listener thread during a burst would otherwise shed
  // packets the buffer cap was sized to absorb
  try socket.setReceiveBufferSize(4 * 1024 * 1024)
  catch { case _: java.net.SocketException => () }
  UdpSource.lastBoundPort = socket.getLocalPort

  private val listener = new Thread(s"graft-udp-$port") {
    override def run(): Unit = {
      val packet = new DatagramPacket(new Array[Byte](65536), 65536)
      try {
        while (!socket.isClosed) {
          // receive() shrinks packet.length to the last datagram's
          // size; without this reset every later datagram would be
          // truncated to the shortest one seen so far
          packet.setLength(65536)
          socket.receive(packet)
          val line = new String(packet.getData, packet.getOffset,
            packet.getLength, StandardCharsets.UTF_8)
          UdpMicroBatchStream.this.synchronized {
            if (buffer.length < maxBuffer) buffer += line
            else droppedCount += 1
          }
        }
      } catch { case _: java.net.SocketException => () /* closed */ }
    }
  }
  listener.setDaemon(true)
  listener.start()

  /** Buffered-row probe for tests (does not mark the stream active). */
  private[udp] def bufferedCount: Int = synchronized(buffer.length)

  override def initialOffset(): Offset = UdpOffset(0L)

  override def latestOffset(): Offset = synchronized {
    active = true
    UdpOffset(base + buffer.length)
  }

  override def deserializeOffset(json: String): Offset = {
    val n = json.toLong
    // Restart-from-checkpoint: the committed offset outlives this
    // process's volatile buffer. While still in recovery (no batch
    // planned or served yet), fast-forward the numbering to the
    // LARGEST restored offset so new datagrams count from there
    // instead of silently mapping below it (datagrams sent while the
    // process was down are lost regardless — that's UDP; this prevents
    // ALSO dropping or mis-trimming post-restart datagrams). The shift
    // ignores buffer contents: anything already buffered arrived after
    // THIS process's socket bind and is renumbered to begin at `n`. A
    // replayed pre-crash range then maps entirely below base and
    // planInputPartitions yields it empty — honest: the wire data is
    // gone — and its commit trims nothing live.
    synchronized { if (!active && n > base) base = n }
    UdpOffset(n)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[UdpOffset].n, end.asInstanceOf[UdpOffset].n)
    val slice = synchronized {
      active = true
      buffer.slice((s - base).toInt, (e - base).toInt).toArray
    }
    if (slice.isEmpty) Array.empty
    else Array(UdpInputPartition(slice))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val rows = partition.asInstanceOf[UdpInputPartition].lines
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow =
            InternalRow(UTF8String.fromString(rows(i)))
          override def close(): Unit = ()
        }
    }

  override def commit(end: Offset): Unit = synchronized {
    val upTo = end.asInstanceOf[UdpOffset].n
    val drop = (upTo - base).toInt
    if (drop > 0) { buffer.remove(0, math.min(drop, buffer.length)); base = upTo }
  }

  override def stop(): Unit = socket.close()
}

private[udp] case class UdpInputPartition(lines: Array[String])
  extends InputPartition
