package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tripwire for the residual-encoding recall mechanism on the geometry
  * it exists for (VERDICT r13 item 5). The graft fixture's unit-norm
  * near-isotropic embeddings provably cannot exhibit the win
  * (BENCHNOTES r13: near-equidistant neighbors make 50-sample top-k
  * recall blind to the 9 % MSE gain), so this spec supplies the FAISS
  * regime — well-separated Gaussian clusters — and pins that the
  * shipped residual composition beats the r12 raw-vector path there:
  * the coarse quantizer absorbs between-cluster displacement and PQ
  * spends its budget on small within-cluster residuals. Measured via
  * [[ClusterGeomSweep]] (whose harness this spec SHARES — one copy of
  * the tolerance/raw-path machinery, so the tripwire pins exactly the
  * sweep's computation): residual 0.45 vs raw 0.22 distance-tolerance
  * recall@5, MSE 20 % lower, stable across sigma ∈ {0.1, 0.3, 1.0}.
  * A regression that quietly drops the residual mechanism (e.g.
  * training codebooks on raw vectors again) fails here even though
  * the fixture rows cannot see it. */
class ClusteredGeometrySpec extends SparkSpec {

  test("on clustered geometry, residual IVFADC beats raw-vector PQ on recall and MSE") {
    import spark.implicits._
    val (n, dim, nClusters) = (1000, 64, 16)
    val (nlist, m, k, iters) = (16, 4, 16, 1)
    val topK = 5; val nProbes = 10
    val emb = ClusterGeomSweep.clusteredCorpus(spark, n, dim, nClusters,
      spread = 5.0, sigma = 0.3, seed = 42L)
    val probes = emb.filter(col("vec_id") < nProbes)
    val corpusArr = emb.as[(Long, Array[Float])].collect()
    val corpus = corpusArr.toMap
    val dk = ClusterGeomSweep.kthDist(corpusArr, corpus, nProbes, topK)
    val recRaw = ClusterGeomSweep.recallTol(
      ClusterGeomSweep.rawIvfPq(emb, probes, nlist, m, k, iters, 4, topK),
      corpus, dk, nProbes, topK)
    val recResid = ClusterGeomSweep.recallTol(
      Similarity.ivfPqSearch(emb, probes, nlist, 4, m, k, iters, topK),
      corpus, dk, nProbes, topK)
    assert(recResid >= recRaw,
      s"residual encoding must not lose to raw on clustered geometry: $recResid vs $recRaw")
    assert(recResid > recRaw + 0.05,
      s"the clustered-geometry recall win disappeared: residual $recResid vs raw $recRaw " +
        "(did the residual mechanism regress to raw-vector training?)")
    // and the reconstruction-MSE ordering that drives it
    val mseR = ClusterGeomSweep.mseRaw(emb, m, k, iters)
    val mseD = ClusterGeomSweep.mseResid(emb, nlist, m, k, iters)
    assert(mseD < mseR,
      s"residual reconstruction must beat raw on clustered geometry: $mseD vs $mseR")
  }
}
