package graft.tools

import graft.SparkSpec

/** Streaming-plan drift pin: the micro-batch (IncrementalExecution)
  * skeleton of every pinned streaming pipeline must match the
  * committed `STREAMPINS.txt`. A failure here means a code change
  * moved a per-trigger plan shape — a stream-static join flipping
  * broadcast→shuffle, a state-store operator appearing/disappearing,
  * aggregation phasing around the state store changing. If
  * intentional, regenerate with
  * `sbt "runMain graft.tools.StreamPinWrite"`; if not, the streaming
  * plan regressed and the diff below says where. */
class StreamPlanPinSpec extends SparkSpec {

  test("micro-batch plan skeletons match the committed STREAMPINS.txt") {
    val path = java.nio.file.Paths.get(StreamPlanPin.pinFile)
    assert(java.nio.file.Files.exists(path),
      s"${StreamPlanPin.pinFile} missing — generate with: " +
        "sbt \"runMain graft.tools.StreamPinWrite\"")
    val pinned = PlanPin.parse(java.nio.file.Files.readString(path))
    val current = StreamPlanPin.currentSkeletons(spark)
    assert(pinned.map(_._1) == current.map(_._1),
      s"pinned pipeline list drifted (pinned ${pinned.size}, current ${current.size}) — regenerate the pin")
    val pm = pinned.toMap
    val drifted = current.filter { case (n, s) => pm(n) != s }
    assert(drifted.isEmpty,
      drifted.map { case (n, s) =>
        s"micro-batch skeleton drifted for $n\n--- pinned:\n${pm(n)}\n--- current:\n$s"
      }.mkString("\n\n") +
        "\n\nIf intentional: sbt \"runMain graft.tools.StreamPinWrite\"")
  }

  test("pinned micro-batch plans carry the load-bearing operators") {
    val sk = StreamPlanPin.currentSkeletons(spark).toMap
    // stateful aggregations restore+save against the state store
    assert(sk("s1_tumbling_window_microbatch").contains("StateStore"),
      sk("s1_tumbling_window_microbatch"))
    assert(sk("s6_distinct_users_microbatch").contains("StateStore"),
      sk("s6_distinct_users_microbatch"))
    // the static dimension side must ship as a broadcast, not a shuffle
    val s4 = sk("s4_stream_static_join_microbatch")
    assert(s4.contains("BroadcastHashJoin") && s4.contains("BroadcastExchange"), s4)
    // stateful dedup runs the dedup-within-watermark operator
    assert(sk("s3_dedup_microbatch").contains("StreamingDeduplicate"),
      sk("s3_dedup_microbatch"))
    // the per-batch LSH core joins band buckets with a shuffle join on
    // (band, bh) — an equi-join, never a nested-loop cross product
    val xs = sk("xs_curate_batch_neardup")
    assert(!xs.contains("NestedLoop"), xs)
  }
}
