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

  test("two TCP listeners union into one pipeline (one listener per ingest node)") {
    val p1 = 25456 + (System.nanoTime() % 500).toInt
    val p2 = p1 + 501
    // the scale-out story from TcpBinarySource's doc: N ingest-node
    // listeners composed by unionByName into a single downstream pipeline
    val q = IngestStream.fromTcp(spark, p1, gapMillis = 200)
      .unionByName(IngestStream.fromTcp(spark, p2, gapMillis = 200))
      .writeStream.format("memory").queryName("tcpunion").outputMode("append").start()
    try {
      def sendRetry(port: Int, payload: Array[Byte]): Unit = {
        var ok = false
        var tries = 0
        while (!ok && tries < 50) {
          try { send(port, payload); ok = true }
          catch { case _: java.io.IOException => tries += 1; Thread.sleep(100) }
        }
        assert(ok, s"listener on $port never came up")
      }
      sendRetry(p1, "from-node-1".getBytes)
      sendRetry(p2, "from-node-2".getBytes)
      val deadline = System.currentTimeMillis() + 30000
      var rows: Array[org.apache.spark.sql.Row] = Array.empty
      while (rows.length < 2 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        rows = spark.table("tcpunion").collect()
        if (rows.length < 2) Thread.sleep(200)
      }
      val payloads = rows.map(r => new String(r.getAs[Array[Byte]]("payload"))).toSet
      assert(payloads == Set("from-node-1", "from-node-2"), payloads)
    } finally q.stop()
  }

  test("nc-style smoke: socket in, date-partitioned JSONL file out (deploy.sh:174 analog)") {
    val root = java.nio.file.Files.createTempDirectory("graft-tcp-jsonl")
    val out = s"$root/out"; val ck = s"$root/ck"
    val port = 26456 + (System.nanoTime() % 1000).toInt
    // echo 'test data' | nc localhost PORT → JSONL line in the dated sink,
    // the reference's end-to-end smoke (main.go:304-309, deploy.sh:174)
    val q = IngestStream.transform(IngestStream.fromTcp(spark, port, gapMillis = 200))
      .writeStream.format("json")
      .option("ignoreNullFields", "true")
      .partitionBy("date")
      .option("path", out)
      .option("checkpointLocation", ck)
      .outputMode("append")
      .start()
    try {
      var ok = false
      var tries = 0
      while (!ok && tries < 50) {
        try { send(port, "test data\n".getBytes); ok = true }
        catch { case _: java.io.IOException => tries += 1; Thread.sleep(100) }
      }
      val deadline = System.currentTimeMillis() + 30000
      var rows: Array[org.apache.spark.sql.Row] = Array.empty
      while (rows.isEmpty && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        rows = try spark.read.json(s"$out/date=*").collect()
        catch { case _: org.apache.spark.sql.AnalysisException => Array.empty }
        if (rows.isEmpty) Thread.sleep(200)
      }
      assert(rows.length == 1)
      val r = rows.head.getValuesMap[Any](rows.head.schema.fieldNames.toSeq)
      assert(r("message") == "received 10 bytes", r)
      assert(r("byte_count") == 10L)
      assert(r("level") == "INFO")
      assert(r("client_ip") == "127.0.0.1")
      assert(r("binary_data_hex") == "7465737420646174610a")
      assert(r("binary_data_string") == "\"test data\\n\"")
      assert(r("timestamp").toString.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z"""))
    } finally q.stop()
  }
}
