package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Streaming semantics verified with MemoryStream + manual watermark
  * advancement — never wall-clock (SURVEY.md §5.4). */
class EventStreamsSpec extends SparkSpec {
  private def t(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  test("S1 streaming tumbling equals batch on replay (parity)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val rows = Seq(
      Ev(1, t(0), 1, "click", 1.0, "{}"),
      Ev(2, t(3), 2, "click", 2.0, "{}"),
      Ev(3, t(12), 1, "view", 4.0, "{}"),
      Ev(4, t(14), 3, "click", 8.0, "{}"))
    val mem = MemoryStream[Ev]
    mem.addData(rows: _*)
    val q = EventStreams.tumbling(mem.toDF())
      .writeStream.format("memory").queryName("s1par").outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("s1par").orderBy("event_type", "bucket").collect()
    val batch = EventStreams.tumbling(rows.toDF()).orderBy("event_type", "bucket").collect()
    assert(streamed.toSeq == batch.toSeq)
    assert(batch.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("click", 1704103200L, 2L), ("click", 1704103800L, 1L), ("view", 1704103800L, 1L)))
  }

  test("S1 append mode drops late events behind the watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.tumbling(mem.toDF())
      .writeStream.format("memory").queryName("s1late").outputMode("append").start()
    try {
      mem.addData(Ev(1, t(0), 1, "click", 1.0, "{}"))
      q.processAllAvailable()
      // advance watermark far past the first window: wm = 40:00 - 10:00
      mem.addData(Ev(2, t(40), 1, "click", 1.0, "{}"))
      q.processAllAvailable()
      // late event for the long-closed first window: must be dropped
      mem.addData(Ev(3, t(1), 1, "click", 99.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("s1late").orderBy("bucket")
      .select("bucket", "n", "sum_value").collect()
    // only the first window has closed; it emits n=1 — the late row (99.0)
    // was dropped, not merged
    assert(out.length == 1)
    assert(out(0).getLong(1) == 1L && out(0).getDouble(2) == 1.0)
  }

  test("S6 streaming windowed distinct-user sketch equals batch on replay") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // 1 window, 3 distinct users for click (one repeated) + 1 for view
    val rows = Seq(
      Ev(1, t(0), 1, "click", 1.0, "{}"),
      Ev(2, t(2), 2, "click", 1.0, "{}"),
      Ev(3, t(4), 1, "click", 1.0, "{}"),
      Ev(4, t(6), 3, "click", 1.0, "{}"),
      Ev(5, t(7), 9, "view", 1.0, "{}"))
    val mem = MemoryStream[Ev]
    mem.addData(rows: _*)
    val q = EventStreams.windowDistinctUsers(mem.toDF())
      .writeStream.format("memory").queryName("s6par").outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("s6par").orderBy("event_type", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val batch = EventStreams.windowDistinctUsers(rows.toDF())
      .orderBy("event_type", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(streamed.toSeq == batch.toSeq)
    // at this cardinality HLL++ is exact: 3 click users, 1 view user
    assert(batch.map(_._3).toSeq == Seq(3L, 1L), batch.mkString(", "))
  }

  test("S3 streaming dedup collapses cross-batch duplicates") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.dedupStream(mem.toDF())
      .select("event_id", "value")
      .writeStream.format("memory").queryName("s3dedup").outputMode("append").start()
    try {
      mem.addData(Ev(10, t(0), 1, "click", 1.0, "{}"), Ev(10, t(0, 30), 1, "click", 2.0, "{}"))
      q.processAllAvailable()
      mem.addData(Ev(10, t(1), 1, "click", 3.0, "{}"), Ev(11, t(1), 1, "click", 4.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("s3dedup").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(10L, 11L))
  }

  test("S3b streaming content dedup collapses token-multiset duplicates") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = EventStreams.contentDedupStream(
        mem.toDF().toDF("doc_id", "text", "ts"))
      .select("doc_id")
      .writeStream.format("memory").queryName("s3content").outputMode("append").start()
    try {
      mem.addData((1L, "Alpha beta gamma", t(0)), (2L, "wholly different words", t(0, 30)))
      q.processAllAvailable()
      // same token multiset as doc 1 (case + whitespace + order edits) →
      // identical simhash → dropped; doc 4 is new content → kept
      mem.addData((3L, "  beta   GAMMA alpha ", t(1)), (4L, "fresh content here", t(1)))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("s3content").select("doc_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 4L))
  }

  test("stream-stream click-view join within the 10-minute bound") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val views = MemoryStream[Ev]
    val q = EventStreams.clickViewJoin(clicks.toDF(), views.toDF())
      .writeStream.format("memory").queryName("ssjoin").outputMode("append").start()
    try {
      views.addData(Ev(100, t(0), 1, "view", 1.0, "{}"),
        Ev(101, t(30), 1, "view", 1.0, "{}")) // > 10 min before the click: excluded
      clicks.addData(Ev(200, t(8), 1, "click", 1.0, "{}"),
        Ev(201, t(35), 1, "click", 1.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ssjoin").select("click_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // click@8 ← view@0 (8 min before); click@35 ← view@30; not view@0 (35 min)
    assert(got == Set((200L, 100L), (201L, 101L)))
  }

  test("stream-static join enriches a stream against a batch dimension") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[Ev]
    val q = mem.toDF().join(broadcast(dim), Seq("user_id"), "left")
      .select($"event_id", $"user_id", coalesce($"tier", lit("none")).as("tier"))
      .writeStream.format("memory").queryName("ssdim").outputMode("append").start()
    try {
      mem.addData(Ev(1, t(0), 1, "click", 1.0, "{}"), Ev(2, t(1), 9, "click", 1.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ssdim").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(1L -> "gold", 2L -> "none"))
  }

  test("S4b stream-static enrichAgg equals its batch form on replay") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY"), (3L, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
    val rows = Seq(
      Ev(1, t(0), 1, "click", 1.0, "{}"),
      Ev(2, t(1), 2, "click", 2.0, "{}"),
      Ev(3, t(2), 3, "view", 4.0, "{}"),
      Ev(4, t(3), 9, "view", 8.0, "{}")) // no dim row → dropped (inner)
    val mem = MemoryStream[Ev]
    mem.addData(rows: _*)
    val q = EventStreams.enrichAgg(mem.toDF(), dim)
      .writeStream.format("memory").queryName("s4enrich").outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("s4enrich").orderBy("c_mktsegment").collect()
    val batch = EventStreams.enrichAgg(rows.toDF(), dim).orderBy("c_mktsegment").collect()
    assert(streamed.toSeq == batch.toSeq)
    assert(batch.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq(("BUILDING", 2L, 5.0), ("MACHINERY", 1L, 2.0)))
  }

  test("S5 trending top-k ranks only finalized windows and matches batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val w0 = Seq( // window [10:00, 10:10): click 3×, view 2×, buy 1×
      Ev(1, t(0), 1, "click", 1.0, "{}"), Ev(2, t(1), 2, "click", 1.0, "{}"),
      Ev(3, t(2), 3, "click", 1.0, "{}"), Ev(4, t(3), 1, "view", 1.0, "{}"),
      Ev(5, t(4), 2, "view", 1.0, "{}"), Ev(6, t(5), 3, "buy", 1.0, "{}"))
    val mem = MemoryStream[Ev]
    val ranked = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Int)]
    val q = EventStreams.windowTypeCounts(mem.toDF())
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        ranked ++= EventStreams.rankTopK(b, 2).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
        ()
      }.start()
    try {
      mem.addData(w0: _*)
      q.processAllAvailable()
      // window not finalized yet (watermark still inside it) → no ranks
      assert(ranked.isEmpty, s"ranked before finalization: $ranked")
      // advance the watermark far past the first window → it finalizes
      mem.addData(Ev(7, t(40), 1, "click", 1.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()
    val expected = EventStreams.rankTopK(
        EventStreams.windowTypeCounts(w0.toDF()), 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(ranked.sortBy(x => (x._1, x._4)).toSeq == expected.sortBy(x => (x._1, x._4)).toSeq)
    // top-2 of window 0: click (3) then view (2); buy cut
    assert(ranked.map(x => (x._2, x._3, x._4)).sortBy(_._3).toSeq ==
      Seq(("click", 3L, 1), ("view", 2L, 2)))
  }

  test("S2 session windows split at the 30-minute gap") {
    import spark.implicits._
    val rows = Seq(
      Ev(1, t(0), 7, "a", 1.0, "{}"),
      Ev(2, t(20), 7, "a", 2.0, "{}"), // 20 min gap → same session
      Ev(3, t(55), 7, "a", 4.0, "{}"), // 35 min gap → new session
      Ev(4, t(10), 8, "a", 8.0, "{}"))
    val out = EventStreams.sessions(rows.toDF()).orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq == Seq((7L, 2L), (7L, 1L), (8L, 1L)))
  }
}
