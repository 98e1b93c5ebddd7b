package graft.operators
import org.apache.spark.sql.functions._
// dev sweep: refined recall@5 vs shortK under DISTANCE-TOLERANCE recall
// (a hit = retrieved vector within (1+1e-9) of the true 5th-NN distance)
// — set-overlap recall is ill-conditioned on this fixture's near-dup
// clusters, where the "true" top-5 among ~equal candidates is decided
// by 1e-13 float association noise (BENCHNOTES r12).
object RefineSweep {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (sfd <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = graft.core.Tables.load(spark, sfd, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val probes = emb.filter(col("vec_id") < 10)
      val corpusArr = emb.as[(Long, Array[Float])].collect()
      val corpus = corpusArr.toMap
      def l2(p: Array[Float], c: Array[Float]): Double = {
        var pp = 0.0; var pc = 0.0; var cc = 0.0; var i = 0
        while (i < p.length) { pp += p(i).toDouble*p(i); pc += p(i).toDouble*c(i); cc += c(i).toDouble*c(i); i += 1 }
        pp - 2.0*pc + cc
      }
      val k = 5
      val dk = (0L until 10L).map { p =>
        p -> corpusArr.map { case (_, cv) => l2(corpus(p), cv) }.sorted.apply(k - 1)
      }.toMap
      def recTol(df: org.apache.spark.sql.DataFrame): Double = {
        val got = df.select($"probe_id", $"vec_id").as[(Long, Long)].collect()
        got.count { case (p, id) => l2(corpus(p), corpus(id)) <= dk(p) * (1 + 1e-9) + 1e-12 }
          .toDouble / (10 * k)
      }
      // the r12 RAW-vector composition (pre-residual), reconstructed
      // verbatim for the A/B: train+encode raw subvectors, per-probe
      // (not per-(probe,cluster)) LUTs
      def rawIvfPq(topK: Int) = {
        val (sub, books) = Similarity.pqTrain(emb, 4, 16, 1).get
        val cents = Similarity.centroids(emb, 16)
        val codes = Similarity.pqEncode(Similarity.ivfAssignWith(emb, cents),
            sub, books, keep = Seq("cluster"))
          .withColumn("codes", array((0 until 4).map(s => col(s"code_$s")): _*))
        val pc = Similarity.ivfProbeClusters(probes, cents, 4)
          .select(col("probe_id"), col("cluster"))
        Similarity.adcRank(codes.join(broadcast(pc), Seq("cluster")),
          probes, books, sub, topK)
      }
      val adcRaw = recTol(rawIvfPq(k))
      val adc = recTol(Similarity.ivfPqSearch(emb, probes, 16, 4, 4, 16, 1, k))
      // reconstruction MSE from the SHIPPED encode kernels: pqEncodeD's
      // err is ||input − q(input)||², and for the residual path that IS
      // the full reconstruction error (x − (c + q(r)) = r − q(r)) — the
      // well-conditioned encoder-quality metric (same signal the drift
      // monitor persists), where 50-sample top-k recall is noise-bound
      // on this fixture's near-equidistant neighbors
      def mse(df: org.apache.spark.sql.DataFrame): Double =
        df.agg(avg($"err")).head.getDouble(0)
      val mseRaw = {
        val (sub, books) = Similarity.pqTrain(emb, 4, 16, 1).get
        mse(Similarity.pqEncode(emb, sub, books))
      }
      val mseResid = {
        val cents = Similarity.coarseCentroids(emb, 16)
        val resid = Similarity.ivfResiduals(emb, cents)
        val (sub, books) = Similarity.pqTrainD(resid.select(col("vec_id"), col("v")), 4, 16, 1).get
        mse(Similarity.pqEncodeD(resid, sub, books))
      }
      val line = Seq(10, 20, 50, 100).map { sk =>
        f"short$sk=${recTol(Similarity.ivfPqRefine(emb, probes, 16, 4, 4, 16, 1, sk, k))}%.2f"
      }.mkString(" ")
      println(f"SWEEP $sfd mseRAW=$mseRaw%.3f mseRESID=$mseResid%.3f " +
        f"adcTolRAW=$adcRaw%.2f adcTolRESID=$adc%.2f $line")
    }
    spark.stop()
  }
}
