package graft.tools

import graft.core.{GraftSession, Tables}
import graft.operators.TextAnalysis

/** Measurement driver for the bigram-LM `materialize` knob (VERDICT r13
  * item 3): the composed `xt_bigram_lm` lineage (tokenize → posexplode →
  * lead window) feeds FOUR consumers (two count tables, the vocab
  * scalar, the scoring join); `materialize = true` localCheckpoints it
  * once instead. The `wordFreqScore` precedent measured its 2-consumer
  * crossover before choosing a default — this does the same for the
  * 4-consumer case. Interleaved A/B at sf0.1 (or MINI_DIR), first pass
  * is warm-up; compare the later pairs. */
object BigramMatSweep {
  def main(a: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("MINI_DIR", "/root/testdata/sf0.1")
    val docs = Tables.load(spark, dir, "documents")
    def run(mat: Boolean): Double = {
      val t0 = System.nanoTime()
      TextAnalysis.bigramLmScore(docs, materialize = mat)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(mat = false) // warm-up
    for (pass <- 1 to 3; mat <- Seq(false, true))
      println(f"MATSWEEP pass=$pass materialize=$mat ${run(mat)}%.2f s")
    spark.stop()
  }
}
