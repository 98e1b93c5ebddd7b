package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** transformWithState (Spark 4's arbitrary-state API, successor of
  * mapGroupsWithState): per-user running event count / value total,
  * emitted on every update. State lives in the RocksDB state store with
  * an optional TTL — the modern form of the reference's running counters
  * (main.go:60-65) keyed per user instead of per process.
  */
object UserTotals {

  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserTotal(user_id: Long, n_events: Long, total_value: Double)
  final case class TotState(n: Long, total: Double)

  final class Processor(ttl: TTLConfig)
      extends StatefulProcessor[Long, UserEvent, UserTotal] {
    @transient private var state: ValueState[TotState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TotState](
        "totals", Encoders.product[TotState], ttl)

    override def handleInputRows(
        key: Long, rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[UserTotal] = {
      var s = if (state.exists()) state.get() else TotState(0L, 0.0)
      rows.foreach(e => s = TotState(s.n + 1, s.total + e.value))
      state.update(s)
      Iterator.single(UserTotal(key, s.n, s.total))
    }
  }

  /** Wire the processor onto a (streaming) dataset. Requires the RocksDB
    * state store provider (transformWithState's only backend). */
  def totals(events: Dataset[UserEvent], ttl: TTLConfig = TTLConfig.NONE): Dataset[UserTotal] = {
    implicit val outEnc: Encoder[UserTotal] = Encoders.product[UserTotal]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Processor(ttl), TimeMode.None(), OutputMode.Update())
  }
}
