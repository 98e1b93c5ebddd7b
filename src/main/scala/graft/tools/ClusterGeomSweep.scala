package graft.operators

import org.apache.spark.sql.functions._

/** Residual-vs-raw IVF-PQ on the geometry residual encoding EXISTS for
  * (VERDICT r13 item 5): well-separated Gaussian clusters — the FAISS
  * regime, where the coarse quantizer absorbs the between-cluster
  * displacement and PQ spends its code budget on the small
  * within-cluster residuals. The graft fixture's unit-norm
  * near-isotropic embeddings provably cannot show the recall win
  * (BENCHNOTES r13 adjudication: the 9 % reconstruction-MSE gain is
  * invisible to 50-sample top-k there); this sweep generates the
  * clustered corpus, A/Bs the SHIPPED residual composition
  * ([[Similarity.ivfPqSearch]]) against the reconstructed r12
  * raw-vector path at the same nlist/m/k, and reports
  * distance-tolerance recall@5 + reconstruction MSE.
  * [[ClusteredGeometrySpec]] pins the direction as a tripwire. */
object ClusterGeomSweep {

  /** Deterministic clustered corpus: `nClusters` centers at uniform
    * ±`spread` per dim, `n` points round-robin across clusters with
    * N(0, sigma²) per-dim displacement. Seeded — byte-stable across
    * runs and JVMs. */
  private[operators] def clusteredCorpus(spark: org.apache.spark.sql.SparkSession,
      n: Int, dim: Int, nClusters: Int, spread: Double, sigma: Double,
      seed: Long): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(nClusters, dim)((rnd.nextDouble() * 2 - 1) * spread)
    val rows = (0 until n).map { i =>
      val c = centers(i % nClusters)
      (i.toLong, Array.tabulate(dim)(d => (c(d) + rnd.nextGaussian() * sigma).toFloat))
    }
    rows.toDF("vec_id", "embedding").repartition(8)
  }

  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val (n, dim, nClusters) = (2000, 64, 16)
    val (nlist, m, k, iters) = (16, 4, 16, 1)
    val topK = 5; val nProbes = 20
    for (sigma <- Seq(0.1, 0.3, 1.0)) {
      val emb = clusteredCorpus(spark, n, dim, nClusters, spread = 5.0,
        sigma = sigma, seed = 42L)
      val probes = emb.filter(col("vec_id") < nProbes)
      val corpusArr = emb.as[(Long, Array[Float])].collect()
      val corpus = corpusArr.toMap
      def l2(p: Array[Float], c: Array[Float]): Double = {
        var pp = 0.0; var pc = 0.0; var cc = 0.0; var i = 0
        while (i < p.length) { pp += p(i).toDouble * p(i); pc += p(i).toDouble * c(i); cc += c(i).toDouble * c(i); i += 1 }
        pp - 2.0 * pc + cc
      }
      val dk = (0L until nProbes.toLong).map { p =>
        p -> corpusArr.map { case (_, cv) => l2(corpus(p), cv) }.sorted.apply(topK - 1)
      }.toMap
      def recTol(df: org.apache.spark.sql.DataFrame): Double = {
        val got = df.select($"probe_id", $"vec_id").as[(Long, Long)].collect()
        got.count { case (p, id) => l2(corpus(p), corpus(id)) <= dk(p) * (1 + 1e-9) + 1e-12 }
          .toDouble / (nProbes * topK)
      }
      // the r12 RAW-vector composition (RefineSweep's reconstruction)
      def rawIvfPq() = {
        val (sub, books) = Similarity.pqTrain(emb, m, k, iters).get
        val cents = Similarity.centroids(emb, nlist)
        val codes = Similarity.pqEncode(Similarity.ivfAssignWith(emb, cents),
            sub, books, keep = Seq("cluster"))
          .withColumn("codes", array((0 until m).map(s => col(s"code_$s")): _*))
        val pc = Similarity.ivfProbeClusters(probes, cents, 4)
          .select(col("probe_id"), col("cluster"))
        Similarity.adcRank(codes.join(broadcast(pc), Seq("cluster")),
          probes, books, sub, topK)
      }
      def mse(df: org.apache.spark.sql.DataFrame): Double =
        df.agg(avg($"err")).head.getDouble(0)
      val mseRaw = {
        val (sub, books) = Similarity.pqTrain(emb, m, k, iters).get
        mse(Similarity.pqEncode(emb, sub, books))
      }
      val mseResid = {
        val cents = Similarity.coarseCentroids(emb, nlist)
        val resid = Similarity.ivfResiduals(emb, cents)
        val (sub, books) = Similarity.pqTrainD(resid.select(col("vec_id"), col("v")), m, k, iters).get
        mse(Similarity.pqEncodeD(resid, sub, books))
      }
      val recRaw = recTol(rawIvfPq())
      val recResid = recTol(
        Similarity.ivfPqSearch(emb, probes, nlist, 4, m, k, iters, topK))
      println(f"CLUSTERGEOM sigma=$sigma%.1f mseRAW=$mseRaw%.4f mseRESID=$mseResid%.4f " +
        f"recallRAW=$recRaw%.2f recallRESID=$recResid%.2f")
    }
    spark.stop()
  }
}
