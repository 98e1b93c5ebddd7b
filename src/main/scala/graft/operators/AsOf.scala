package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** As-of join (SURVEY.md §2B operator table): for each left row, the
  * latest right row of the same key with rightTime ≤ leftTime.
  *
  * Implementation is the union-tag trick — one shuffle on the key, one
  * within-partition sort, a running `last(_, ignoreNulls)` window, no
  * range fanout and no nested loop:
  *
  *   union(right→(ts, tag=0, payload), left→(ts, tag=1, null))
  *   last(payload) OVER (PARTITION BY key ORDER BY ts, tag
  *                       ROWS UNBOUNDED PRECEDING..CURRENT)
  *
  * Right rows sort before left rows at equal timestamps, giving the
  * inclusive (≤) semantics. At 100 TB this is exactly one shuffle of
  * left+right on the join key — the minimum any keyed as-of requires;
  * skewed keys are handled by AQE skew-split since the window is
  * per-key. Ties among right rows at the same (key, ts) resolve
  * arbitrarily — don't expose tie-dependent payloads in verified output.
  */
object AsOf {

  /** Left rows + an `asof` struct of the matched right payload (null if
    * no earlier right row). */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      on: Seq[String], leftTime: String, rightTime: String): DataFrame = {
    val keyCols = on.map(col)
    val rPayload = right.columns.filterNot(on.contains)
    val rStructType = right.select(struct(rPayload.map(col): _*).as("r")).schema("r").dataType
    val lStructType = left.select(struct(left.columns.map(col): _*).as("l")).schema("l").dataType

    val r2 = right.select(keyCols ++ Seq(
      col(rightTime).as("__t"), lit(0).as("__tag"),
      lit(null).cast(lStructType).as("__l"),
      struct(rPayload.map(col): _*).as("__r")): _*)
    val l2 = left.select(keyCols ++ Seq(
      col(leftTime).as("__t"), lit(1).as("__tag"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rStructType).as("__r")): _*)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r2.unionByName(l2)
      .withColumn("asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(col("__l.*") +: Seq(col("asof")): _*)
  }

  // ----------------------------------------------------------- declared
  /** For each click event, the user's most recent view at or before it. */
  private def qAsof(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.load(spark, dir, "events")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts".as("view_ts"))
    asOfJoin(clicks, views, Seq("user_id"), "ts", "view_ts")
      .filter($"asof".isNotNull)
      .select($"event_id", $"user_id",
        floor(unix_timestamp($"ts")).cast(LongType).as("click_sec"),
        floor(unix_timestamp($"asof.view_ts")).cast(LongType).as("view_sec"))
      .orderBy($"event_id")
  }

  private val qAsofSql =
    """SELECT c.event_id, c.user_id,
      |  CAST(FLOOR(EPOCH(c.ts)) AS BIGINT) AS click_sec,
      |  CAST(FLOOR(EPOCH(v.ts)) AS BIGINT) AS view_sec
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
      |ASOF JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
      |  ON c.user_id = v.user_id AND c.ts >= v.ts
      |ORDER BY c.event_id""".stripMargin

  val all: Seq[Declared] = Seq(
    Declared("q13_asof_join", qAsof, Some(qAsofSql)))
}
