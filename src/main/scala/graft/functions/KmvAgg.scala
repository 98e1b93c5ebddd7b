package graft.functions

import java.util.Arrays

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct sketch as a typed Aggregator: the
  * buffer is the sorted array of the k smallest DISTINCT hash values
  * seen (Bar-Yossef et al. 2002; Beyer et al. SIGMOD 2007). Unlike
  * HLL++ the sketch retains the sample itself, so two sketches support
  * set OPERATIONS, not just cardinality: K(A ∪ B) = the k smallest of
  * the merged arrays, and Jaccard(A, B) ≈ |K(A∪B) ∩ K(A) ∩ K(B)| / k —
  * the cross-shard overlap estimate no HLL union can give.
  *
  * Distinctness lives inside the buffer (duplicate hashes are dropped
  * on insert and on merge), so the input needs NO pre-distinct: the
  * aggregate runs under ObjectHashAggregate with map-side partial
  * aggregation and the exchange carries ≤ partitions × groups × k
  * longs regardless of input row count. Merge is a sorted-array
  * merge-dedup-truncate — associative and commutative, the mergeable-
  * summary contract that lets per-shard sketches combine without
  * rescanning (the 100 TB posture; same argument as `hll_union_agg`).
  *
  * A buffer holding fewer than k values IS the exact distinct hash
  * set (every value seen is retained), which downstream estimators
  * must special-case: estimate = m when m < k, else (k−1)·H / h(k)
  * where H is the hash-space size. Hash values must be non-negative
  * and uniform on [0, H); ties across groups are fine.
  */
final class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, s"KmvAgg: k must be positive, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val n = buf.length
    if (n == k && h >= buf(n - 1)) return buf // not among the k smallest
    val i = Arrays.binarySearch(buf, h)
    if (i >= 0) return buf // duplicate hash: KMV is a DISTINCT sketch
    val ins = -i - 1
    val out = new Array[Long](math.min(n + 1, k))
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(buf, ins, out, ins + 1, out.length - ins - 1)
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (i < a.length && a(i) == v) i += 1 // cross-array duplicate
      if (j < b.length && b(j) == v) j += 1
      out(o) = v; o += 1
    }
    if (o == out.length) out else Arrays.copyOf(out, o)
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
