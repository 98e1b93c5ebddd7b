package graft.tools

/** Dev tool (VERDICT r19 #2): price the bitext slicing crossover —
  * one-shot [[graft.operators.Similarity.bitextMine]] (BOTH ranking
  * passes broadcast a corpus-sized probe side at once) vs
  * [[graft.operators.Similarity.bitextMineBatched]] at sliceSize 2000
  * (the eager driver loop: slice count grows with the corpus) — on the
  * cached ScaleProbe fixtures (`out/scale/m1`, `out/scale/m10`), with
  * a both-ways row-set equality check per scale (the HnBatchSweep
  * methodology, symmetric diff).
  *
  * `runMain graft.tools.BitextSweep [m...]` (default 1 10); results
  * land in BENCHNOTES.md. */
object BitextSweep {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions.col
    val scales = if (a.nonEmpty) a.map(_.toInt).toSeq else Seq(1, 10)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    for (m <- scales) {
      val emb = graft.core.Tables.load(spark, s"/root/repo/out/scale/m$m", "embeddings")
      val src = emb.filter(col("vec_id") % 2 === 0)
      val tgt = emb.filter(col("vec_id") % 2 === 1)
      val n = emb.count()
      // persist the timed results and reuse them for the parity check:
      // re-constructing either pipeline re-executes it (the batched one
      // re-drives the whole eager slice loop), doubling the sweep's
      // wall-clock for no extra information
      val one = graft.operators.Similarity.bitextMine(src, tgt, 4, 1.0).persist()
      val (oneRows, oneSec) = timed(one.count())
      val (batPair, batSec) = timed {
        val b = graft.operators.Similarity
          .bitextMineBatched(src, tgt, 2000, 4, 1.0).persist()
        (b, b.count())
      }
      val (bat, batRows) = batPair
      val diff = bat.exceptAll(one).count() + one.exceptAll(bat).count()
      one.unpersist(); bat.unpersist()
      println(f"""{"scale":$m,"n_vecs":$n,"slices_per_side":${(n / 2 + 1999) / 2000},""" +
        f""""one_shot_rows":$oneRows,"one_shot_sec":$oneSec%.2f,""" +
        f""""batched_rows":$batRows,"batched_sec":$batSec%.2f,""" +
        f""""set_diff":$diff}""")
    }
    spark.stop()
  }
}
