package graft.tools

/** Dev tool: measure ANN recall vs brute top-k on the fixture embeddings
  * at each SF (`runMain graft.tools.RecallProbe`) — used to pick the declared recall
  * bounds for x2_ann_lsh / x2_ann_ivf. */
object RecallProbe {
  def main(a: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = graft.core.GraftSession.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sfd <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sfd"
      val emb = graft.core.Tables.load(spark, dir, "embeddings")
      val probes = emb.filter(col("vec_id") < 10)
      val brute = graft.operators.Similarity.cosineTopK(emb, probes, 5)
      val lsh = graft.operators.Similarity.annTopK(emb, probes, 64, 5)
      val ivf = graft.operators.Similarity.ivfTopK(emb, probes, nlist = 16, nprobe = 4, k = 5)
      val ivfKm = graft.operators.Similarity.ivfTopK(
        emb, probes, nlist = 16, nprobe = 4, k = 5, kmeansIters = 2)
      val nb = brute.count().toDouble
      def rec(df: org.apache.spark.sql.DataFrame): Double =
        df.join(brute.select(col("probe_id"), col("neighbor_id")),
          Seq("probe_id", "neighbor_id")).count() / nb
      println(f"RECALL $sfd brute=$nb%.0f lsh=${rec(lsh)}%.3f ivf=${rec(ivf)}%.3f ivf_km=${rec(ivfKm)}%.3f")
    }
    spark.stop()
  }
}
