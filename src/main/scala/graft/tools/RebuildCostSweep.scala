package graft.tools

/** Dev tool (VERDICT r18 #4): price the SQ8 and binary tiers'
  * rebuild-on-drift policy. Both artifacts are IMMUTABLE by design —
  * no append/tombstone/compact protocol like the PQ store — because
  * their build is one corpus map pass (plus one dim-min/max aggregate
  * for SQ8) with no expensive trained state to preserve; this sweep
  * measures that full-rebuild cost at 1× and 10× so the asymmetry is a
  * PRICED decision, not an omission.
  *
  * `runMain graft.tools.RebuildCostSweep`; results land in
  * BENCHNOTES.md and the policy paragraph in COVERAGE.md. */
object RebuildCostSweep {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for ((base, m) <- Seq(("/root/repo/out/scale/m1", 1),
        ("/root/repo/out/scale/m10", 10))) {
      val emb = graft.core.Tables.load(spark, base, "embeddings")
      val n = emb.count()
      val dim = emb.select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("embedding"))).head.getInt(0)
      val sq8Dir = java.nio.file.Files.createTempDirectory("sq8-reb").toString
      val sq8Sec = timed(graft.operators.Similarity.buildSq8(emb, sq8Dir))
      val binDir = java.nio.file.Files.createTempDirectory("bin-reb").toString
      val binSec = timed(graft.operators.Similarity.buildBinary(emb, binDir, dim))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(sq8Dir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(binDir))
      println(f"""{"scale":$m,"n_vecs":$n,"sq8_rebuild_sec":$sq8Sec%.2f,""" +
        f""""binary_rebuild_sec":$binSec%.2f}""")
    }
    spark.stop()
  }
}
