package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** k-permutation MinHash as a typed Aggregator: input is one 64-bit
  * shingle hash per row; the buffer is a primitive long[k] of running
  * minima under k splitmix64-finalized re-mixes of the input.
  *
  * Runs under ObjectHashAggregate: the buffer stays an object between
  * rows (serialized only across the partial→final shuffle), so each row
  * costs k multiply-xor mixes and k compares in a tight loop — versus k
  * separate hash expressions and agg buffers in the column-expression
  * formulation (~10× slower at 128 permutations).
  *
  * The mixer is the splitmix64 finalizer (public-domain constant set;
  * full-avalanche, bijective per seed), which is exactly the structure
  * MinHash needs: k independent pseudo-permutations of the shingle-hash
  * space.
  */
final class MinHashAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val h = Hashing.mixSeeded(x, i) // same perms as Dedup's fused kernel
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
