package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import ConnectionState._

class ConnectionStateSpec extends SparkSpec {
  private def t(sec: Int) = Timestamp.valueOf(f"2024-01-01 10:${sec / 60}%02d:${sec % 60}%02d")

  test("closed connection emits a completed summary; vanished one times out via watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[ConnEvent]
    val q = sessionize(
      mem.toDS().withWatermark("ts", "10 seconds").as[ConnEvent], gapMs = 30000L)
      .writeStream.format("memory").queryName("connstate").outputMode("append").start()
    try {
      mem.addData(
        ConnEvent(1, "10.0.0.1", t(0), "open", 0),
        ConnEvent(1, "10.0.0.1", t(1), "data", 4096),
        ConnEvent(1, "10.0.0.1", t(2), "data", 100),
        ConnEvent(1, "10.0.0.1", t(3), "close", 0),
        ConnEvent(2, "10.0.0.2", t(1), "open", 0),
        ConnEvent(2, "10.0.0.2", t(2), "data", 7))
      q.processAllAvailable()
      // push the watermark past conn 2's timeout (last=t2 + 30s, wm lag 10s)
      mem.addData(ConnEvent(99, "10.0.0.9", t(120), "open", 0))
      q.processAllAvailable()
      mem.addData(ConnEvent(99, "10.0.0.9", t(125), "data", 1))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("connstate").as[ConnSummary].collect()
      .map(s => s.conn_id -> s).toMap
    assert(rows(1L).completed && rows(1L).n_chunks == 2 && rows(1L).n_bytes == 4196L)
    assert(rows(1L).opened == t(0) && rows(1L).last_seen == t(3))
    assert(!rows(2L).completed && rows(2L).n_bytes == 7L) // timed out
  }
}
