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

  // --- the shared measurement harness (ONE copy: this sweep, the
  // --- NprobeSweep, and ClusteredGeometrySpec's tripwire all pin the
  // --- SAME computation — a tolerance or raw-path fix here moves all
  // --- three in lockstep; review r14)
  private[operators] def l2(p: Array[Float], c: Array[Float]): Double = {
    var pp = 0.0; var pc = 0.0; var cc = 0.0; var i = 0
    while (i < p.length) {
      pp += p(i).toDouble * p(i); pc += p(i).toDouble * c(i)
      cc += c(i).toDouble * c(i); i += 1
    }
    pp - 2.0 * pc + cc
  }

  /** True k-th-NN distance per probe (driver-side exact — sweep/spec
    * corpora are small by design). */
  private[operators] def kthDist(corpusArr: Array[(Long, Array[Float])],
      corpus: Map[Long, Array[Float]], nProbes: Int, topK: Int): Map[Long, Double] =
    (0L until nProbes.toLong).map { p =>
      p -> corpusArr.map { case (_, cv) => l2(corpus(p), cv) }.sorted.apply(topK - 1)
    }.toMap

  /** Distance-tolerance recall@k (a hit = retrieved vector within
    * (1+1e-9) of the true k-th-NN distance — the r12 adjudication:
    * set-overlap is ill-conditioned under float association noise). */
  private[operators] def recallTol(df: org.apache.spark.sql.DataFrame,
      corpus: Map[Long, Array[Float]], dk: Map[Long, Double],
      nProbes: Int, topK: Int): Double = {
    val got = df.select(org.apache.spark.sql.functions.col("probe_id"),
        org.apache.spark.sql.functions.col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.count { case (p, id) =>
      l2(corpus(p), corpus(id)) <= dk(p) * (1 + 1e-9) + 1e-12
    }.toDouble / (nProbes * topK)
  }

  /** The r12 RAW-vector IVF-PQ composition (pre-residual),
    * reconstructed for A/Bs: raw-subvector train+encode, per-probe
    * (not per-(probe,cluster)) LUTs. */
  private[operators] def rawIvfPq(emb: org.apache.spark.sql.DataFrame,
      probes: org.apache.spark.sql.DataFrame, nlist: Int, m: Int, k: Int,
      iters: Int, nprobe: Int, topK: Int): org.apache.spark.sql.DataFrame = {
    val (sub, books) = Similarity.pqTrain(emb, m, k, iters).get
    val cents = Similarity.centroids(emb, nlist)
    val codes = Similarity.pqEncode(Similarity.ivfAssignWith(emb, cents),
        sub, books, keep = Seq("cluster"))
      .withColumn("codes", array((0 until m).map(s => col(s"code_$s")): _*))
    val pc = Similarity.ivfProbeClusters(probes, cents, nprobe)
      .select(col("probe_id"), col("cluster"))
    Similarity.adcRank(codes.join(broadcast(pc), Seq("cluster")),
      probes, books, sub, topK)
  }

  private[operators] def mseOf(df: org.apache.spark.sql.DataFrame): Double =
    df.agg(avg(col("err"))).head.getDouble(0)

  /** Raw-path reconstruction MSE at (m, k, iters). */
  private[operators] def mseRaw(emb: org.apache.spark.sql.DataFrame,
      m: Int, k: Int, iters: Int): Double = {
    val (sub, books) = Similarity.pqTrain(emb, m, k, iters).get
    mseOf(Similarity.pqEncode(emb, sub, books))
  }

  /** Residual-path reconstruction MSE (pqEncodeD's err IS the full
    * reconstruction error: x − (c + q(r)) = r − q(r)). */
  private[operators] def mseResid(emb: org.apache.spark.sql.DataFrame,
      nlist: Int, m: Int, k: Int, iters: Int): Double = {
    val cents = Similarity.coarseCentroids(emb, nlist)
    val resid = Similarity.ivfResiduals(emb, cents)
    val (sub, books) = Similarity.pqTrainD(
      resid.select(col("vec_id"), col("v")), m, k, iters).get
    mseOf(Similarity.pqEncodeD(resid, sub, books))
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
      val dk = kthDist(corpusArr, corpus, nProbes, topK)
      val recRaw = recallTol(
        rawIvfPq(emb, probes, nlist, m, k, iters, 4, topK), corpus, dk, nProbes, topK)
      val recResid = recallTol(
        Similarity.ivfPqSearch(emb, probes, nlist, 4, m, k, iters, topK),
        corpus, dk, nProbes, topK)
      println(f"CLUSTERGEOM sigma=$sigma%.1f " +
        f"mseRAW=${mseRaw(emb, m, k, iters)}%.4f " +
        f"mseRESID=${mseResid(emb, nlist, m, k, iters)}%.4f " +
        f"recallRAW=$recRaw%.2f recallRESID=$recResid%.2f")
    }
    spark.stop()
  }
}
