package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

object TopKMinAgg {
  /** Output: sorted parallel arrays, (key(i), id(i)) ascending by
    * (key, id), trimmed to the retained count. */
  final case class Buf(key: Array[Double], id: Array[Long])

  /** Mutable aggregation buffer: capacity-k parallel arrays (allocated
    * on first insert) + the live count `n`. Cells at index ≥ n are
    * never read — they ride through buffer serialization as padding.
    * `var` fields because the buffer is mutated IN PLACE (see class
    * scaladoc); the encoder only needs constructor params, which vars
    * still are. */
  final case class MBuf(var key: Array[Double], var id: Array[Long], var n: Int)
}

/** Bounded per-group top-k as a typed Aggregator: keeps the k smallest
  * (key, id) pairs under lexicographic (key ASC, id ASC) order — the
  * shuffle-safe replacement for `row_number() OVER (PARTITION BY g
  * ORDER BY key, id) <= k` when the window input is corpus-sized.
  *
  * The window formulation shuffles EVERY input row to the group's
  * reducer and sorts there — with few groups (e.g. 10 ANN probes) each
  * reducer sorts ~the whole corpus. This Aggregator runs under
  * ObjectHashAggregate with map-side partial aggregation: each task
  * reduces its local rows into a ≤k buffer per group, so the exchange
  * carries numPartitions × groups × k rows regardless of corpus size,
  * and the final merge is k-list merging, not a sort.
  *
  * Keys must be non-NaN (comparisons treat NaN as never-smaller, which
  * would silently drop such rows); ids break ties deterministically.
  *
  * Buffers are capacity-k parallel primitive arrays mutated IN PLACE
  * (the TypedImperativeAggregate contract ObjectHashAggregate runs
  * under: each group owns its buffer object, reduce/merge may mutate
  * and return it). The r11 shape allocated two fresh arrays per
  * QUALIFYING row — cheap once buffers saturate, but measurable GC
  * churn at 10⁹ rows × 32 tasks while they fill (VERDICT r11 item 6);
  * now a qualifying insert is one overlapping `System.arraycopy` shift
  * within the owned arrays, and the only allocations are the one-time
  * capacity-k buffers plus the trimmed copy in `finish`. */
final class TopKMinAgg(k: Int)
    extends Aggregator[(Double, Long), TopKMinAgg.MBuf, TopKMinAgg.Buf] {
  import TopKMinAgg.{Buf, MBuf}
  require(k > 0, s"TopKMinAgg: k must be positive, got $k")

  @inline private def lt(d1: Double, i1: Long, d2: Double, i2: Long): Boolean =
    d1 < d2 || (d1 == d2 && i1 < i2)

  override def zero: MBuf = MBuf(Array.emptyDoubleArray, Array.emptyLongArray, 0)

  /** In-place insert; returns `b` (possibly with freshly-allocated
    * capacity arrays on the very first insert / after deserialization
    * of an empty buffer). */
  private def insert(b: MBuf, d: Double, id: Long): MBuf = {
    val n = b.n
    if (n >= k && !lt(d, id, b.key(n - 1), b.id(n - 1))) return b
    if (b.key.length < k) { // one-time capacity allocation
      b.key = java.util.Arrays.copyOf(b.key, k)
      b.id = java.util.Arrays.copyOf(b.id, k)
    }
    var i = 0
    while (i < n && lt(b.key(i), b.id(i), d, id)) i += 1
    // shift [i, keep) right by one (overlapping arraycopy is defined to
    // behave as if staged through a temp); when full, the last is dropped
    val keep = math.min(n, k - 1)
    if (keep > i) {
      System.arraycopy(b.key, i, b.key, i + 1, keep - i)
      System.arraycopy(b.id, i, b.id, i + 1, keep - i)
    }
    b.key(i) = d; b.id(i) = id
    b.n = math.min(n + 1, k)
    b
  }

  override def reduce(b: MBuf, x: (Double, Long)): MBuf = insert(b, x._1, x._2)

  override def merge(a: MBuf, b: MBuf): MBuf = {
    var r = a; var i = 0
    while (i < b.n) { r = insert(r, b.key(i), b.id(i)); i += 1 }
    r
  }

  override def finish(b: MBuf): Buf =
    Buf(java.util.Arrays.copyOf(b.key, b.n), java.util.Arrays.copyOf(b.id, b.n))

  override def bufferEncoder: Encoder[MBuf] = ExpressionEncoder[MBuf]()
  override def outputEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
}
