package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Num, Tables}
import graft.operators.Declared

/** S1-S3 — streaming analytics over the events stream (SURVEY.md §2B).
  *
  * Each transform takes a DataFrame that may be streaming (from
  * `readStream`/MemoryStream, with watermarks active) or batch (same code,
  * watermark a no-op) — the batch run IS the parity oracle, so the
  * declared queries below execute the very transform the stream runs,
  * verified against DuckDB SQL.
  *
  * Scale posture: all are single-shuffle keyed aggregations; state size is
  * bounded by the watermark horizon (10-30 min of keys × windows), which
  * is what makes them runnable forever on an unbounded stream.
  */
object EventStreams {
  import Num._

  /** S1 — tumbling 10-minute count/sum per event_type, 10-minute
    * watermark. Replayed batch ≡ Q11 (same buckets as epoch seconds). */
  def tumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("event_type"), window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(
        col("event_type"),
        unix_timestamp(col("window.start")).as("bucket"),
        col("n"), col("sum_value"))

  /** S2a — sliding window (10 min length / 5 min slide) per user_id:
    * every event lands in exactly two windows. */
  def sliding(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(
        col("user_id"),
        unix_timestamp(col("window.start")).as("win_start"),
        col("n"), col("sum_value"))

  /** S2b — session window, 30-minute inactivity gap, per user_id.
    * Sessions merge while consecutive events are < gap apart. */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(
        col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        col("n"), col("sum_value"))

  /** S3 — stateful dedup on event_id. Streaming path: state expires with
    * the watermark so it does not grow unboundedly; batch path: plain
    * distinct-on-key. */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  def dedupBatch(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")

  /** S3b — streaming CONTENT dedup: a document stream is fingerprinted
    * with the same md5-bit SimHash as the batch dedup family
    * ([[graft.operators.Dedup.simhashPortable]]) and deduped on the
    * fingerprint within the watermark, so re-crawled/re-posted documents
    * whose token multiset is unchanged (whitespace/case/order edits
    * included) collapse to their first arrival. The fingerprint pass is
    * a narrow mapPartitions (one digest per partition); state is one
    * 16-char key per distinct doc inside the watermark horizon —
    * bounded, like every stateful op here. Batch path: keep-first per
    * fingerprint (the x1_simhash oracle family covers the fingerprint
    * itself). */
  def contentDedupStream(docs: DataFrame, watermark: String = "10 minutes"): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text"), col("ts"))
      .as[(Long, String, java.sql.Timestamp)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text, ts) =>
          (id, graft.operators.Dedup.simhashPortableOne(md, text), ts)
        }
      }.toDF("doc_id", "simhash", "ts")
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("simhash")
  }

  /** S4b — stream-static enrichment join + keyed aggregation: the events
    * stream joined to a STATIC dimension (customer) on user_id, revenue
    * rolled up per market segment. The static side needs no watermark
    * and holds no stream state — Catalyst plans it as a broadcast hash
    * join re-read per micro-batch, so at 100 TB/day of events the
    * dimension ships once per trigger and the stream side never
    * shuffles before the aggregation. Same code runs in batch for the
    * parity oracle. */
  def enrichAgg(events: DataFrame, customers: DataFrame): DataFrame =
    events
      .join(broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))

  /** Stream-stream join: each click joined to same-user views from the
    * preceding 10 minutes. Watermarks on both sides + the time-bound
    * condition let the join state expire (without them a stream-stream
    * join buffers forever). Same code runs in batch for parity tests. */
  def clickViewJoin(clicks: DataFrame, views: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val v = views.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("v_user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    c.join(v,
      col("user_id") === col("v_user_id") &&
        col("view_ts") >= col("click_ts") - expr("interval 10 minutes") &&
        col("view_ts") <= col("click_ts"))
      .select(col("click_id"), col("user_id"), col("click_ts"), col("view_id"), col("view_ts"))
  }

  /** S5 — trending top-k: tumbling 10-min counts per event_type, then
    * the k most frequent types per window. The windowed count is the
    * streaming aggregate (watermark-bounded state); the per-window rank
    * is sink-side — append mode emits each window exactly once, AFTER
    * it finalizes, which is precisely when its full key set exists, so
    * `foreachBatch(rankTopK(_, k))` ranks complete windows only. The
    * rank window partitions by bucket (thousands of concurrent buckets
    * at scale → parallel; never a single global sort). */
  def windowTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        unix_timestamp(col("window.start")).as("bucket"),
        col("event_type"), col("n"))

  /** Sink-side ranking for [[windowTypeCounts]] — same code in the
    * streaming foreachBatch and the batch parity/oracle form. */
  def rankTopK(counts: DataFrame, k: Int = 3): DataFrame =
    counts
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("bucket"))
          .orderBy(col("n").desc, col("event_type"))))
      .filter(col("rnk") <= k)

  // ------------------------------------------------- declared batch forms
  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")

  private def s1(spark: SparkSession, dir: String): DataFrame =
    tumbling(ev(spark, dir)).orderBy(col("event_type"), col("bucket"))

  private val s1Sql =
    s"""SELECT event_type,
       |  CAST(FLOOR(EPOCH(ts) / 600) * 600 AS BIGINT) AS bucket,
       |  COUNT(*) AS n,
       |  ${sqlSum("value")} AS sum_value
       |FROM events
       |GROUP BY event_type, bucket
       |ORDER BY event_type, bucket""".stripMargin

  private def s2(spark: SparkSession, dir: String): DataFrame =
    sliding(ev(spark, dir)).orderBy(col("user_id"), col("win_start"))

  // each event belongs to windows starting at floor(t/300)*300 and that
  // minus 300 (duration 600, slide 300) — UNNEST reproduces the fanout.
  private val s2Sql =
    s"""SELECT user_id, win_start, COUNT(*) AS n, ${sqlSum("value")} AS sum_value
       |FROM (
       |  SELECT user_id, value,
       |    UNNEST([CAST(FLOOR(EPOCH(ts)/300)*300 AS BIGINT),
       |            CAST(FLOOR(EPOCH(ts)/300)*300 - 300 AS BIGINT)]) AS win_start
       |  FROM events) e
       |GROUP BY user_id, win_start
       |ORDER BY user_id, win_start""".stripMargin

  private def s2b(spark: SparkSession, dir: String): DataFrame =
    sessions(ev(spark, dir)).orderBy(col("user_id"), col("session_start"))

  // gaps-and-islands: a new session starts when the gap to the previous
  // event of the same user is >= 1800 s (Spark session windows are
  // half-open [start, last+gap), so exactly-gap spacing splits).
  private val s2bSql =
    s"""WITH e AS (
       |  SELECT user_id, EPOCH(ts) AS t, value FROM events),
       |brk AS (
       |  SELECT user_id, t, value,
       |    CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t) >= 1800
       |         OR LAG(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
       |    THEN 1 ELSE 0 END AS new_session
       |  FROM e),
       |sess AS (
       |  SELECT user_id, t, value,
       |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM brk)
       |SELECT user_id, CAST(FLOOR(MIN(t)) AS BIGINT) AS session_start,
       |  COUNT(*) AS n, ${sqlSum("value")} AS sum_value
       |FROM sess
       |GROUP BY user_id, sid
       |ORDER BY user_id, session_start""".stripMargin

  private def s3(spark: SparkSession, dir: String): DataFrame = {
    // double the input so the dedup provably collapses; output is the
    // deterministic distinct key set.
    val e = ev(spark, dir)
    dedupBatch(e.unionAll(e)).select(col("event_id")).orderBy(col("event_id"))
  }

  private val s3Sql =
    """SELECT DISTINCT event_id FROM (
      |  SELECT event_id FROM events UNION ALL SELECT event_id FROM events)
      |ORDER BY event_id""".stripMargin

  /** Batch parity of the stream-stream [[clickViewJoin]] — the same
    * transform the stream runs, oracled: clicks joined to same-user
    * views from the preceding 10 minutes. */
  private def s3Join(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    clickViewJoin(e.filter(col("event_type") === "click"),
        e.filter(col("event_type") === "view"))
      .orderBy(col("click_id"), col("view_id"))
  }

  private val s3JoinSql =
    """SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
      |       v.event_id AS view_id, v.ts AS view_ts
      |FROM events c JOIN events v
      |  ON c.event_type = 'click' AND v.event_type = 'view'
      | AND c.user_id = v.user_id
      | AND v.ts >= c.ts - INTERVAL 10 MINUTE AND v.ts <= c.ts
      |ORDER BY click_id, view_id""".stripMargin

  /** Batch parity of the stream-static [[enrichAgg]], oracled. */
  private def s4Static(spark: SparkSession, dir: String): DataFrame =
    enrichAgg(ev(spark, dir), Tables.load(spark, dir, "customer"))
      .orderBy(col("c_mktsegment"))

  private val s4StaticSql =
    s"""SELECT c.c_mktsegment, COUNT(*) AS n_events, ${sqlSum("e.value")} AS sum_value
       |FROM events e JOIN customer c ON e.user_id = c.c_custkey
       |GROUP BY c.c_mktsegment
       |ORDER BY c.c_mktsegment""".stripMargin

  /** Batch parity of the S5 trending pipeline, oracled: the same
    * counts + rank the stream computes, over the replayed fixture. */
  private def s5(spark: SparkSession, dir: String): DataFrame =
    rankTopK(windowTypeCounts(ev(spark, dir)), 3)
      .orderBy(col("bucket"), col("rnk"))

  /** S6 — windowed distinct-USER cardinality per event_type: the
    * realtime-dashboard shape (unique visitors per window). Streaming
    * aggregation cannot hold exact distinct state (Spark rejects
    * `countDistinct` on streams, and exact per-window user sets grow
    * with traffic), so the streaming transform uses
    * `approx_count_distinct` — HLL++ partial state is a fixed-size
    * buffer per (type, window), the only state shape that stays bounded
    * at 100 TB/day event volume. Family contract (X4, never trust the
    * sketch): the batch declared row computes the EXACT distinct next
    * to the sketch and emits an engine-checked bound — ≤ 5 % relative
    * OR ≤ 2 absolute, because HLL++'s guarantee is relative-asymptotic
    * and a sparse-mode hash collision at tiny cardinality (observed in
    * this fixture: exact 2, estimate 1) is absolute, not relative. The
    * streaming spec asserts stream-vs-batch sketch parity. */
  def windowDistinctUsers(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("event_type"), window(col("ts"), "10 minutes"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
      .select(col("event_type"),
        unix_timestamp(col("window.start")).as("bucket"), col("approx_users"))

  /** Batch verification row. The exact distinct is computed TWO-LEVEL
    * (pre-distinct on (type, window, user), then count) rather than as
    * `countDistinct` beside the sketch: a mixed exact+approx distinct
    * aggregate plans an Expand that duplicates every input row, ~1.8x
    * slower at sf0.1 and strictly worse at scale; the two-level shape
    * is one shuffle chain with map-side partials, and the sketch over
    * the pre-distincted users estimates the same set. */
  private def s6(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy(col("event_type"), window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col("event_type"), col("window"))
      .agg(count(lit(1)).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .select(col("event_type"),
        unix_timestamp(col("window.start")).as("bucket"),
        col("exact_users"),
        (abs(col("approx") - col("exact_users")) <=
          greatest(col("exact_users") * 0.05, lit(2.0))).as("within_bound"))
      .orderBy(col("event_type"), col("bucket"))

  private val s6Sql =
    """WITH c AS (
      |  SELECT event_type,
      |    CAST(FLOOR(EPOCH(ts) / 600) * 600 AS BIGINT) AS bucket,
      |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
      |  FROM events GROUP BY event_type, bucket)
      |SELECT event_type, bucket, exact_users, TRUE AS within_bound
      |FROM c
      |ORDER BY event_type, bucket""".stripMargin

  private val s5Sql =
    """WITH c AS (
      |  SELECT CAST(FLOOR(EPOCH(ts) / 600) * 600 AS BIGINT) AS bucket,
      |    event_type, COUNT(*) AS n
      |  FROM events GROUP BY bucket, event_type)
      |SELECT bucket, event_type, n, CAST(rnk AS INTEGER) AS rnk FROM (
      |  SELECT bucket, event_type, n,
      |    row_number() OVER (PARTITION BY bucket ORDER BY n DESC, event_type) AS rnk
      |  FROM c) r
      |WHERE rnk <= 3
      |ORDER BY bucket, rnk""".stripMargin

  val all: Seq[Declared] = Seq(
    Declared("s1_tumbling_window", s1, Some(s1Sql)),
    Declared("s5_trending_topk", s5, Some(s5Sql)),
    Declared("s4_stream_static_join", s4Static, Some(s4StaticSql)),
    Declared("s2_sliding_window", s2, Some(s2Sql)),
    Declared("s2_session_window", s2b, Some(s2bSql)),
    Declared("s3_dedup", s3, Some(s3Sql)),
    Declared("s3_click_view_join", s3Join, Some(s3JoinSql)),
    Declared("s6_distinct_users", s6, Some(s6Sql)),
    // S7 — transformWithState running totals, driven through the REAL
    // RocksDB-backed streaming machinery (three ordered drops)
    Declared("s7_user_totals", UserTotals.s7, Some(UserTotals.s7Sql)))
}
