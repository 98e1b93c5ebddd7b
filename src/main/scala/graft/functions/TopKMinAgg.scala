package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

object TopKMinAgg {
  /** Sorted parallel arrays: (key(i), id(i)) ascending by (key, id). */
  final case class Buf(key: Array[Double], id: Array[Long])
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
  * Buffers are sorted parallel primitive arrays — insertion is O(k)
  * array copy, constant for the small k (top-5/top-10) this serves.
  */
final class TopKMinAgg(k: Int)
    extends Aggregator[(Double, Long), TopKMinAgg.Buf, TopKMinAgg.Buf] {
  import TopKMinAgg.Buf
  require(k > 0, s"TopKMinAgg: k must be positive, got $k")

  @inline private def lt(d1: Double, i1: Long, d2: Double, i2: Long): Boolean =
    d1 < d2 || (d1 == d2 && i1 < i2)

  override def zero: Buf = Buf(Array.emptyDoubleArray, Array.emptyLongArray)

  private def insert(b: Buf, d: Double, id: Long): Buf = {
    val n = b.key.length
    if (n >= k && !lt(d, id, b.key(n - 1), b.id(n - 1))) return b
    var i = 0
    while (i < n && lt(b.key(i), b.id(i), d, id)) i += 1
    val m = math.min(n + 1, k)
    val nk = new Array[Double](m); val nid = new Array[Long](m)
    System.arraycopy(b.key, 0, nk, 0, i)
    System.arraycopy(b.id, 0, nid, 0, i)
    nk(i) = d; nid(i) = id
    val tail = m - i - 1
    if (tail > 0) {
      System.arraycopy(b.key, i, nk, i + 1, tail)
      System.arraycopy(b.id, i, nid, i + 1, tail)
    }
    Buf(nk, nid)
  }

  override def reduce(b: Buf, x: (Double, Long)): Buf = insert(b, x._1, x._2)

  override def merge(a: Buf, b: Buf): Buf = {
    var r = a; var i = 0
    while (i < b.key.length) { r = insert(r, b.key(i), b.id(i)); i += 1 }
    r
  }

  override def finish(b: Buf): Buf = b

  override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
  override def outputEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
}
