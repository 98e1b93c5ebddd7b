package graft.operators
// dev sweep: semanticPairsIvf recall/prune per (nlist, nassign) at each SF
// (evidence for the declared x1_semantic_dedup_ann floors — BENCHNOTES).
// The exact O(n²) baseline is computed ONCE per SF (it does not depend on
// the config under sweep); only the cluster-pruned side runs per config.
object SemSweep {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = graft.core.Tables.load(spark, s"/root/testdata/$sf", "embeddings")
      val exact = Dedup.embeddingNeardup(emb, 0.45)
        .select(col("vec_a"), col("vec_b")).persist()
      val nTrue = exact.count()
      val n = emb.count()
      for ((nl, na) <- Seq((16, 2), (32, 3), (8, 2), (16, 3))) {
        val cents = Similarity.kmeansCentroids(emb, nl, 1)
        val assigned = Similarity.ivfProbeClusters(emb, cents, na)
          .select(col("cluster"), col("probe_id").as("vec_id"), col("p_emb").as("embedding"))
        val got = Dedup.semanticPairsIvfFrom(assigned, 0.45)
        val nGot = got.count()
        val nHit = got.join(exact, Seq("vec_a", "vec_b")).count()
        val nCand = assigned.select(col("cluster"), col("vec_id").as("vec_a"))
          .join(assigned.select(col("cluster"), col("vec_id").as("vec_b")), Seq("cluster"))
          .filter(col("vec_a") < col("vec_b"))
          .select(col("vec_a"), col("vec_b")).distinct().count()
        val frac = nCand.toDouble / (n.toDouble * (n - 1) / 2)
        println(f"[semprobe] $sf nl=$nl na=$na n=$n true=$nTrue got=$nGot hit=$nHit recall=${if (nTrue == 0) 1.0 else nHit.toDouble / nTrue}%.3f candFrac=$frac%.3f")
      }
      exact.unpersist()
    }
    spark.stop()
  }
}
