package graft.sources

import java.net.Socket

import graft.SparkSpec
import graft.streaming.IngestStream

/** Drives the DSv2 binary TCP source end-to-end: real sockets in, framed
  * binary rows out, reference-style ack back (main.go:271-318). */
class TcpBinarySourceSpec extends SparkSpec {

  private def send(port: Int, payload: Array[Byte]): String = {
    val s = new Socket("127.0.0.1", port)
    try {
      s.getOutputStream.write(payload)
      s.getOutputStream.flush()
      s.shutdownOutput() // EOF ends the frame (no need to wait out the gap)
      new String(s.getInputStream.readAllBytes())
    } finally s.close()
  }

  test("TCP source frames binary payloads per connection and acks") {
    val port = 23456 + (System.nanoTime() % 1000).toInt
    val q = IngestStream.fromTcp(spark, port, gapMillis = 200)
      .writeStream.format("memory").queryName("tcpsrc").outputMode("append").start()
    try {
      // wait for the listener to come up
      var ack1: String = null
      var tries = 0
      while (ack1 == null && tries < 50) {
        try ack1 = send(port, Array[Byte](0x01, 0x00, 0x7f, 0xff.toByte))
        catch { case _: java.io.IOException => tries += 1; Thread.sleep(100) }
      }
      val ack2 = send(port, "gps:1.5,2.5\n".getBytes)
      send(port, Array.emptyByteArray) // empty → dropped, no row
      assert(ack1 != null && ack1.startsWith("Data processed successfully\nBytes: 4\n"))
      assert(ack2.contains("Bytes: 12"))

      val deadline = System.currentTimeMillis() + 30000
      var rows: Array[org.apache.spark.sql.Row] = Array.empty
      while (rows.length < 2 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        rows = spark.table("tcpsrc").collect()
        if (rows.length < 2) Thread.sleep(200)
      }
      assert(rows.length == 2) // the empty payload never became a row
      val payloads = rows.map(_.getAs[Array[Byte]]("payload").toSeq).toSet
      assert(payloads.contains(Seq[Byte](0x01, 0x00, 0x7f, 0xff.toByte)))
      assert(payloads.contains("gps:1.5,2.5\n".getBytes.toSeq))
      assert(rows.map(_.getAs[String]("client_ip")).forall(_ == "127.0.0.1"))
    } finally q.stop()
  }

  test("TCP source feeds the full ingest transform (binary → LogEntry)") {
    val port = 24456 + (System.nanoTime() % 1000).toInt
    val q = IngestStream.transformJson(IngestStream.fromTcp(spark, port, gapMillis = 200))
      .writeStream.format("memory").queryName("tcppipe").outputMode("append").start()
    try {
      var ok = false
      var tries = 0
      while (!ok && tries < 50) {
        try { send(port, Array[Byte]('h', 'i', 0x00)); ok = true }
        catch { case _: java.io.IOException => tries += 1; Thread.sleep(100) }
      }
      val deadline = System.currentTimeMillis() + 30000
      var vals: Array[String] = Array.empty
      while (vals.isEmpty && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        vals = spark.table("tcppipe").collect().map(_.getString(0))
        if (vals.isEmpty) Thread.sleep(200)
      }
      assert(vals.length == 1)
      assert(vals.head.contains("\"binary_data_hex\":\"686900\""))
      assert(vals.head.contains("\"binary_data_string\":\"\\\"hi\\\\x00\\\"\""))
      assert(vals.head.contains("\"byte_count\":3"))
    } finally q.stop()
  }
}
