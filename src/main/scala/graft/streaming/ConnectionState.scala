package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-connection lifecycle state (SURVEY.md §2A#11).
  *
  * The reference tracks an `activeConnections` gauge and per-connection
  * byte counts with atomics (main.go:60-65, 234-239, 312-313). The
  * Spark-native form is keyed arbitrary state: each connection's chunks
  * fold into a state record; a `close` event (or an event-time timeout
  * for connections that vanish) emits one ConnSummary and frees the
  * state. Active connections = live state entries; completed/timed-out
  * sessions stream out as data.
  *
  * State is bounded: one small record per live connection, expired by
  * watermark-driven timeouts — the property that lets this run forever at
  * ingest-node fan-in rates. (At 1000 executors the groupByKey shuffle
  * hash-partitions connection ids; state lives with its partition.)
  */
object ConnectionState {

  /** Wire events: kind ∈ open | data | close. */
  final case class ConnEvent(
      conn_id: Long, client_ip: String, ts: Timestamp, kind: String, n_bytes: Long)

  final case class ConnSummary(
      conn_id: Long, client_ip: String,
      opened: Timestamp, last_seen: Timestamp,
      n_chunks: Int, n_bytes: Long, completed: Boolean)

  /** Internal state record (public: the state-store encoder generates
    * bytecode in another package and needs constructor access). */
  final case class ConnState(
      clientIp: String, openedMs: Long, lastMs: Long, chunks: Int, bytes: Long)

  /** Sessionize a (possibly streaming) event feed. Streaming input must
    * carry a watermark on `ts`; `gapMs` after the last event, an
    * unclosed connection times out and is emitted with
    * `completed = false`. */
  def sessionize(events: Dataset[ConnEvent], gapMs: Long = 60000L): Dataset[ConnSummary] = {
    implicit val sumEnc = Encoders.product[ConnSummary]
    implicit val stEnc = Encoders.product[ConnState]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.conn_id)
      .flatMapGroupsWithState[ConnState, ConnSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (connId: Long, evs: Iterator[ConnEvent], state: GroupState[ConnState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ConnSummary(connId, s.clientIp,
              new Timestamp(s.openedMs), new Timestamp(s.lastMs),
              s.chunks, s.bytes, completed = false))
          } else {
            var s = state.getOption.orNull
            var out = List.empty[ConnSummary]
            evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val ms = e.ts.getTime
              if (s == null) s = ConnState(e.client_ip, ms, ms, 0, 0L)
              e.kind match {
                case "data" =>
                  s = s.copy(lastMs = ms, chunks = s.chunks + 1, bytes = s.bytes + e.n_bytes)
                case "close" =>
                  out ::= ConnSummary(connId, s.clientIp,
                    new Timestamp(s.openedMs), new Timestamp(ms),
                    s.chunks, s.bytes, completed = true)
                  s = null
                case _ => s = s.copy(lastMs = ms) // open
              }
            }
            if (s != null) {
              state.update(s)
              // clamp above the eviction watermark: an event can pass the
              // late filter while lastMs+gap is already behind the
              // watermark, and setTimeoutTimestamp throws on that
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(s.lastMs + gapMs, wm + 1))
            } else state.remove()
            out.reverseIterator
          }
      }
  }
}
