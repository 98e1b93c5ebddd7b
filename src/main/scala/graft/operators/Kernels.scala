package graft.operators

/** Primitive-array numeric kernels shared by the pairwise similarity and
  * dedup paths. Plain `while` loops over `double[]` — these run inside
  * task closures where interpreted Catalyst HOF lambdas (`zip_with` /
  * `aggregate`) are ~100× slower per pair (see BENCHNOTES.md).
  *
  * Floating-point order is fixed (left-to-right accumulation) so results
  * are bit-comparable with the DuckDB oracle's `list_dot_product`.
  */
private[operators] object Kernels {

  /** Widen float embedding to double, preserving element order. */
  def widen(v: Array[Float]): Array[Double] = {
    val d = new Array[Double](v.length)
    var i = 0
    while (i < v.length) { d(i) = v(i).toDouble; i += 1 }
    d
  }

  /** Left-to-right double dot product. */
  def dotd(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
}
