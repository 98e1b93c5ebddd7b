package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQueryException}

import graft.SparkSpec
import ConnectionState._

/** Companions for [[StateEvolutionSpec]] — top-level because the state
  * encoder generates bytecode in another package and cannot reach an
  * inner class of a suite. `ConnStateV0` is the "prior shape":
  * [[ConnectionState.ConnState]] minus the bytes field, the kind of
  * innocuous-looking refactor that invalidates on-disk state rows. */
object StateEvolutionFixtures {
  final case class ConnStateV0(clientIp: String, lastMs: Long, chunks: Int)

  def sessionizeV0(events: Dataset[ConnEvent]): Dataset[ConnSummary] = {
    implicit val sumEnc = Encoders.product[ConnSummary]
    implicit val stEnc = Encoders.product[ConnStateV0]
    implicit val longEnc = Encoders.scalaLong
    events.groupByKey(_.conn_id)
      .flatMapGroupsWithState[ConnStateV0, ConnSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (connId: Long, evs: Iterator[ConnEvent], state: GroupState[ConnStateV0]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val last = evs.toSeq.maxBy(_.ts.getTime)
            val s = ConnStateV0(last.client_ip, last.ts.getTime,
              state.getOption.map(_.chunks).getOrElse(0) + 1)
            state.update(s)
            state.setTimeoutTimestamp(
              math.max(s.lastMs + 30000L, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }
}

/** Streaming state-evolution tripwire (VERDICT r10 item 8):
  * `FixtureSchemaSpec` closed the BATCH drift class; this is the
  * streaming analog. Two properties of checkpointed
  * flatMapGroupsWithState state:
  *
  *   1. a same-shape restart CONTINUES state — an open connection's
  *      chunks from before the restart survive into the summary
  *      emitted after it (the operational restart path);
  *   2. a restart whose state ENCODER SHAPE changed (the class of
  *      silent corruption: ConnState gains/loses a field while an old
  *      checkpoint's UnsafeRows are still on disk) fails LOUDLY with
  *      a state-schema error — never silently reinterprets bytes.
  *      This also pins that `spark.sql.streaming.stateStore
  *      .stateSchemaCheck` stays effective: conf drift turning it off
  *      would flip this test from a named error to garbage output.
  */
class StateEvolutionSpec extends SparkSpec {
  import StateEvolutionFixtures._

  private def t(sec: Int) =
    Timestamp.valueOf(f"2024-01-01 10:${sec / 60}%02d:${sec % 60}%02d")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("same-shape restart from a checkpoint continues connection state") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val (ckDir, outDir) = (tmp("state-evo-ck"), tmp("state-evo-out"))
    val mem = MemoryStream[ConnEvent]
    // file sink (memory sink cannot recover from a checkpoint)
    def run() = sessionize(
      mem.toDS().withWatermark("ts", "10 seconds").as[ConnEvent], gapMs = 30000L)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckDir).outputMode("append").start()
    // run 1: conn 7 opens and sends one chunk — state persists, no output
    val q1 = run()
    try {
      mem.addData(ConnEvent(7, "10.0.0.7", t(0), "open", 0),
        ConnEvent(7, "10.0.0.7", t(1), "data", 100))
      q1.processAllAvailable()
    } finally q1.stop()
    // run 2, same shape, same checkpoint: the close must see run 1's state
    val q2 = run()
    try {
      mem.addData(ConnEvent(7, "10.0.0.7", t(2), "data", 11),
        ConnEvent(7, "10.0.0.7", t(3), "close", 0))
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = spark.read.parquet(outDir).as[ConnSummary].collect()
    assert(rows.length == 1, rows.mkString(";"))
    val s = rows.head
    assert(s.completed && s.n_chunks == 2 && s.n_bytes == 111L,
      s"state did not survive the restart: $s")
    assert(s.opened == t(0), s"opened timestamp lost across restart: $s")
  }

  test("evolved state shape on an old checkpoint fails loudly, never reinterprets") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val ckDir = tmp("state-evo-ck")
    val mem = MemoryStream[ConnEvent]
    // run 1 writes state under the V0 shape
    val q1 = sessionizeV0(
      mem.toDS().withWatermark("ts", "10 seconds").as[ConnEvent])
      .writeStream.format("noop")
      .option("checkpointLocation", ckDir).outputMode("append").start()
    try {
      mem.addData(ConnEvent(7, "10.0.0.7", t(0), "open", 0))
      q1.processAllAvailable()
    } finally q1.stop()
    // run 2 restarts the CURRENT pipeline on the V0 checkpoint: the
    // state rows on disk do not match ConnState's encoder schema
    val q2 = sessionize(
      mem.toDS().withWatermark("ts", "10 seconds").as[ConnEvent], gapMs = 30000L)
      .writeStream.format("noop")
      .option("checkpointLocation", ckDir).outputMode("append").start()
    val ex = intercept[StreamingQueryException] {
      try {
        mem.addData(ConnEvent(7, "10.0.0.7", t(1), "data", 5))
        q2.processAllAvailable()
        q2.awaitTermination(30000)
      } finally q2.stop()
    }
    val msg = (ex.getMessage +: Iterator.iterate(ex.getCause)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).toSeq).mkString(" | ")
    assert(msg.toLowerCase.contains("schema"),
      s"expected a loud state-schema error, got: $msg")
  }
}
