package graft.tools

/** Dev tool (VERDICT r18 #2): price anchor-batched hard-negative mining
  * at an anchor count the one-shot call's probe broadcast would not
  * carry — anchors = the whole corpus — on the cached ScaleProbe
  * fixtures (`out/scale/m1`, `out/scale/m10`).
  *
  * Per scale it measures, with anchors = every corpus vector:
  *   - one-shot `hardNegativesIvf` (routing-collects + broadcasts ALL
  *     anchors at once — feasible at fixture scale, the broadcast-bound
  *     baseline)
  *   - `hardNegativesIvfBatched` at sliceSize 2000 (the driver loop:
  *     slice count grows with the corpus) — plus a row-set equality
  *     check against the one-shot result, the composition proof at
  *     amplified scale
  *
  * `runMain graft.tools.HnBatchSweep [m...]` (default 1 10); results
  * land in BENCHNOTES.md. */
object HnBatchSweep {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scales = if (a.nonEmpty) a.map(_.toInt).toSeq else Seq(1, 10)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    for (m <- scales) {
      val emb = graft.core.Tables.load(spark, s"/root/repo/out/scale/m$m", "embeddings")
      val n = emb.count()
      val (oneRows, oneSec) = timed(
        graft.operators.Similarity.hardNegativesIvf(emb, emb, 3, 0.30, 0.05)
          .count())
      val (batRows, batSec) = timed(
        graft.operators.Similarity
          .hardNegativesIvfBatched(emb, emb, 2000, 3, 0.30, 0.05).count())
      // composition proof at scale: row SETS equal BOTH ways (a one-sided
      // exceptAll passes when the batched side merely loses rows — r19
      // review)
      val bat = graft.operators.Similarity
        .hardNegativesIvfBatched(emb, emb, 2000, 3, 0.30, 0.05)
      val one = graft.operators.Similarity
        .hardNegativesIvf(emb, emb, 3, 0.30, 0.05)
      val diff = bat.exceptAll(one).count() + one.exceptAll(bat).count()
      println(f"""{"scale":$m,"n_vecs":$n,"slices":${(n + 1999) / 2000},""" +
        f""""one_shot_rows":$oneRows,"one_shot_sec":$oneSec%.2f,""" +
        f""""batched_rows":$batRows,"batched_sec":$batSec%.2f,""" +
        f""""set_diff":$diff}""")
    }
    spark.stop()
  }
}
