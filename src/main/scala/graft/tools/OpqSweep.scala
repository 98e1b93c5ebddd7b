package graft.operators
import org.apache.spark.sql.functions._
// dev sweep (VERDICT r12 stretch item 7): does a fixed random
// orthonormal pre-rotation (the cheap variant of OPQ — Ge et al.
// CVPR 2013; Jégou et al. PAMI 2011 §V.A measure the random-rotation
// baseline) improve residual IVF-PQ at the declared m=4/k=16 on this
// fixture? A rotation balances variance/correlation across the m
// subspace blocks; L2 is rotation-invariant, so ground truth is
// unchanged and both arms are scored in their own space. Decision
// threshold (written before measuring): adopt a v7 rotated layout only
// if reconstruction MSE improves ≥5% at either SF — the residual
// change shipped on a measured ~9%.
object OpqSweep {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (sfd <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = graft.core.Tables.load(spark, sfd, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val dim = emb.head.getSeq[Float](1).length
      // deterministic orthonormal R: seeded Gaussian rows, modified
      // Gram-Schmidt (rows of R are the rotated basis)
      val rnd = new scala.util.Random(20260814L)
      val r = Array.fill(dim, dim)(rnd.nextGaussian())
      for (i <- 0 until dim) {
        for (j <- 0 until i) {
          var d = 0.0; var t = 0
          while (t < dim) { d += r(i)(t) * r(j)(t); t += 1 }
          t = 0
          while (t < dim) { r(i)(t) -= d * r(j)(t); t += 1 }
        }
        val n = math.sqrt(r(i).map(x => x * x).sum)
        for (t <- 0 until dim) r(i)(t) /= n
      }
      val bc = spark.sparkContext.broadcast(r)
      val rotUdf = udf { (v: Seq[Float]) =>
        val x = v.toArray
        Array.tabulate(x.length) { i =>
          var s = 0.0; var j = 0
          while (j < x.length) { s += bc.value(i)(j) * x(j); j += 1 }
          s.toFloat
        }
      }
      val rot = emb.select(col("vec_id"), rotUdf(col("embedding")).as("embedding"))
      // residual-path reconstruction MSE — the well-conditioned encoder
      // metric (BENCHNOTES r12: 50-sample top-k recall is noise-bound on
      // this fixture's near-equidistant neighbors)
      def mseResid(e: org.apache.spark.sql.DataFrame): Double = {
        val cents = Similarity.coarseCentroids(e, 16)
        val resid = Similarity.ivfResiduals(e, cents)
        val (sub, books) = Similarity.pqTrainD(
          resid.select(col("vec_id"), col("v")), 4, 16, 1).get
        Similarity.pqEncodeD(resid, sub, books).agg(avg($"err")).head.getDouble(0)
      }
      // ADC tolerance recall, scored within the arm's own space
      def recTol(e: org.apache.spark.sql.DataFrame): Double = {
        val corpusArr = e.as[(Long, Array[Float])].collect()
        val corpus = corpusArr.toMap
        def l2(p: Array[Float], c: Array[Float]): Double = {
          var pp = 0.0; var pc = 0.0; var cc = 0.0; var i = 0
          while (i < p.length) {
            pp += p(i).toDouble * p(i); pc += p(i).toDouble * c(i)
            cc += c(i).toDouble * c(i); i += 1
          }
          pp - 2.0 * pc + cc
        }
        val k = 5
        val dk = (0L until 10L).map { p =>
          p -> corpusArr.map { case (_, cv) => l2(corpus(p), cv) }.sorted.apply(k - 1)
        }.toMap
        val got = Similarity.ivfPqSearch(e, e.filter(col("vec_id") < 10), 16, 4, 4, 16, 1, k)
          .select($"probe_id", $"vec_id").as[(Long, Long)].collect()
        got.count { case (p, id) =>
          l2(corpus(p), corpus(id)) <= dk(p) * (1 + 1e-9) + 1e-12
        }.toDouble / (10 * k)
      }
      println(f"OPQ $sfd mseNONE=${mseResid(emb)}%.3f mseROT=${mseResid(rot)}%.3f " +
        f"adcTolNONE=${recTol(emb)}%.2f adcTolROT=${recTol(rot)}%.2f")
    }
    spark.stop()
  }
}
