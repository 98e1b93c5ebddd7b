package graft.sources

import java.io.IOException
import java.net.{ServerSocket, Socket, SocketTimeoutException}
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 micro-batch source for raw binary TCP ingest — the
  * faithful Spark realization of the reference's socket server
  * (reference main.go:199-318):
  *
  *  - accepts connections, assigns a monotone connection id
  *    (main.go:219,234),
  *  - reads 4096-byte chunks until EOF or a silence gap (default 1 s)
  *    and frames ALL bytes of a connection as ONE binary message
  *    (main.go:271-296) — the built-in `socket` source is line-framed
  *    text and cannot carry arbitrary bytes,
  *  - acks the client after framing (main.go:317-318),
  *  - caps concurrent connections, rejecting the excess
  *    (main.go:237-256).
  *
  * Framed messages buffer on the driver with monotone offsets; each
  * micro-batch ships its slice inside the InputPartition (the same
  * driver-buffered design as Spark's own text socket source — correct for
  * an unpartitionable single-listener transport). Committed prefixes are
  * trimmed. At scale this source is the transport edge only: one listener
  * per ingest node, each a separate stream union'd downstream; the heavy
  * lifting (projection, sinks, metrics) is the narrow pipeline after it.
  *
  * Options: `port` (required), `host` (bind address, default 0.0.0.0),
  * `gapMillis` (frame gap, default 1000), `maxConnections` (default 1000).
  *
  * Usage: `spark.readStream.format("graft.sources.TcpBinaryTableProvider")
  * .option("port", 9999).load()`.
  */
class TcpBinaryTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tcp-binary"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TcpBinaryTable.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new TcpBinaryTable(properties)
}

object TcpBinaryTable {
  /** ts: frame completion time; client_ip; connection_id; payload. */
  val Schema: StructType = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("client_ip", StringType),
    StructField("connection_id", LongType),
    StructField("payload", BinaryType)))
}

class TcpBinaryTable(props: java.util.Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"tcp-binary:${props.get("port")}"
  override def schema(): StructType = TcpBinaryTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = TcpBinaryTable.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new TcpBinaryMicroBatchStream(
            Option(options.get("host")).getOrElse("0.0.0.0"),
            options.getInt("port", 0),
            options.getLong("gapMillis", 1000L),
            options.getInt("maxConnections", 1000))
      }
    }
}

/** One framed message. */
private case class FramedMessage(
    tsMicros: Long, clientIp: String, connId: Long, payload: Array[Byte])

private case class TcpOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

class TcpBinaryMicroBatchStream(
    host: String, port: Int, gapMillis: Long, maxConnections: Int)
    extends MicroBatchStream {

  private val buffer = new ArrayBuffer[FramedMessage]
  private var baseOffset = 0L // offset of buffer(0)
  private val connSeq = new AtomicLong(0)
  private val active = new AtomicLong(0)
  @volatile private var server: ServerSocket = _
  @volatile private var stopped = false

  private def ensureStarted(): Unit = synchronized {
    if (server == null) {
      server = new ServerSocket(port, 64, java.net.InetAddress.getByName(host))
      val acceptThread = new Thread(() => acceptLoop(), s"tcp-binary-accept-$port")
      acceptThread.setDaemon(true)
      acceptThread.start()
    }
  }

  /** The port actually bound (useful when port=0 picks an ephemeral one). */
  def boundPort: Int = { ensureStarted(); server.getLocalPort }

  private def acceptLoop(): Unit = {
    while (!stopped) {
      try {
        val sock = server.accept()
        // admission control (reference main.go:237-256): over the cap →
        // reject and close; otherwise handle on a daemon thread (the
        // reference's worker pool is the JVM thread scheduler here)
        if (active.incrementAndGet() > maxConnections) {
          active.decrementAndGet()
          try sock.close() catch { case _: IOException => }
        } else {
          val id = connSeq.incrementAndGet()
          val t = new Thread(() => { try handle(sock, id) finally active.decrementAndGet() })
          t.setDaemon(true)
          t.start()
        }
      } catch {
        case _: IOException if stopped => // closed during shutdown
        case _: IOException => // transient accept failure; keep listening
      }
    }
  }

  /** Gap-framing read loop (reference main.go:271-296): accumulate 4096 B
    * chunks until EOF or `gapMillis` of silence, then one message. */
  private def handle(sock: Socket, id: Long): Unit = {
    val ip = sock.getInetAddress.getHostAddress
    val out = new java.io.ByteArrayOutputStream()
    try {
      sock.setSoTimeout(gapMillis.toInt)
      val in = sock.getInputStream
      val chunk = new Array[Byte](4096)
      var done = false
      while (!done) {
        try {
          val n = in.read(chunk)
          if (n < 0) done = true // EOF ends the message
          else out.write(chunk, 0, n)
        } catch {
          case _: SocketTimeoutException => done = true // silence ends it
        }
      }
      val payload = out.toByteArray
      if (payload.nonEmpty) { // empty-payload drop (main.go:298-301)
        synchronized {
          buffer += FramedMessage(
            System.currentTimeMillis() * 1000L, ip, id, payload)
        }
        // per-record ack (main.go:317-318)
        try {
          sock.getOutputStream.write(
            s"Data processed successfully\nBytes: ${payload.length}\nConnection ID: $id\n".getBytes)
          sock.getOutputStream.flush()
        } catch { case _: IOException => }
      }
    } catch {
      case _: IOException => // connection reset mid-read: drop partial frame
    } finally {
      try sock.close() catch { case _: IOException => }
    }
  }

  override def initialOffset(): Offset = { ensureStarted(); TcpOffset(0) }

  /** Called with checkpointed offsets on restart. The in-memory buffer
    * died with the previous process, so fast-forward past any recovered
    * offset we no longer hold — restart semantics are at-most-once for
    * the in-flight window (a TCP socket cannot replay unacked bytes),
    * and without this the source would silently under-deliver until the
    * counter caught up to the checkpoint. */
  override def deserializeOffset(json: String): Offset = {
    val n = json.toLong
    synchronized {
      if (n > baseOffset + buffer.size) { buffer.clear(); baseOffset = n }
    }
    TcpOffset(n)
  }
  override def latestOffset(): Offset = synchronized {
    ensureStarted(); TcpOffset(baseOffset + buffer.size)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[TcpOffset].n, end.asInstanceOf[TcpOffset].n)
    val slice = synchronized {
      // clamp: after a restart the checkpointed range may predate the
      // buffer (see deserializeOffset) — deliver what we hold
      val lo = math.max(0L, s - baseOffset).toInt
      val hi = math.max(lo.toLong, math.min(buffer.size.toLong, e - baseOffset)).toInt
      buffer.slice(lo, hi).toArray
    }
    Array(TcpBinaryInputPartition(slice))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) =>
      new TcpBinaryPartitionReader(partition.asInstanceOf[TcpBinaryInputPartition].rows)

  override def commit(end: Offset): Unit = synchronized {
    val upTo = end.asInstanceOf[TcpOffset].n
    val drop = (upTo - baseOffset).toInt
    if (drop > 0) { buffer.dropInPlace(drop); baseOffset = upTo }
  }

  override def stop(): Unit = {
    stopped = true
    if (server != null) { try server.close() catch { case _: IOException => } }
  }
}

/** Micro-batch slice, shipped with the partition (single-listener
  * transport ⇒ one partition per batch). */
private case class TcpBinaryInputPartition(rows: Array[FramedMessage]) extends InputPartition

private class TcpBinaryPartitionReader(rows: Array[FramedMessage])
    extends PartitionReader[InternalRow] {
  private var i = -1
  override def next(): Boolean = { i += 1; i < rows.length }
  override def get(): InternalRow = {
    val m = rows(i)
    new GenericInternalRow(Array[Any](
      m.tsMicros, UTF8String.fromString(m.clientIp), m.connId, m.payload))
  }
  override def close(): Unit = ()
}
