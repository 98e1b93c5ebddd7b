package graft.tools

/** Dev tool: sweep IVF k-means iterations × nprobe and print recall vs
  * brute top-k per fixture SF (`runMain graft.tools.KmSweep`) — used to pick the
  * x2_ann_ivf refinement config and its declared recall floor. */
object KmSweep {
  def main(a: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = graft.core.GraftSession.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sfd <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sfd"
      val emb = graft.core.Tables.load(spark, dir, "embeddings")
      val probes = emb.filter(col("vec_id") < 10)
      val brute = graft.operators.Similarity.cosineTopK(emb, probes, 5)
      val nb = brute.count().toDouble
      def rec(df: org.apache.spark.sql.DataFrame): Double =
        df.join(brute.select(col("probe_id"), col("neighbor_id")),
          Seq("probe_id", "neighbor_id")).count() / nb
      for (it <- Seq(1, 2, 3, 5); np <- Seq(4, 5, 6)) {
        val r = rec(graft.operators.Similarity.ivfTopK(emb, probes, 16, np, 5, kmeansIters = it))
        println(f"SWEEP $sfd iters=$it nprobe=$np recall=$r%.3f")
      }
    }
    spark.stop()
  }
}
