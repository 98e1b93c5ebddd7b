package graft.operators

import org.apache.spark.sql.functions._

/** Multi-probe routing curve for the persisted tier (VERDICT r13
  * stretch item 7): [[IndexStore.searchIvfPq]] already probes the
  * nprobe nearest cells per probe (FAISS's `nprobe` knob — the
  * recall/cost dial a 100 TB operator actually turns); this sweeps it
  * and reports distance-tolerance recall@5 against the CANDIDATE
  * FRACTION (scanned codes rows / corpus per probe — the real cost at
  * scale, where the codes scan dominates) and warm serve time. Run on
  * the clustered synthetic ([[ClusterGeomSweep.clusteredCorpus]] —
  * recall MOVES there) and the sf0.01 fixture (near-equidistant
  * neighbors: recall saturates by construction; the fraction column
  * is the informative one). */
object NprobeSweep {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val topK = 5; val nProbes = 20
    val corpora: Seq[(String, Int, org.apache.spark.sql.DataFrame)] = Seq(
      ("clustered", 16, ClusterGeomSweep.clusteredCorpus(spark, 2000, 64, 16,
        spread = 5.0, sigma = 0.3, seed = 42L)),
      // sigma ~ the center separation: clusters OVERLAP and true
      // neighbors can cross cell boundaries
      ("overlapped", 16, ClusterGeomSweep.clusteredCorpus(spark, 2000, 64, 16,
        spread = 5.0, sigma = 4.0, seed = 42L)),
      // the 100 TB cell size (nlist ~ sqrt(N) → small cells): the
      // regime where routing, not quantization, binds and the nprobe
      // knob earns its keep
      ("overlapped-n64", 64, ClusterGeomSweep.clusteredCorpus(spark, 2000, 64, 16,
        spread = 5.0, sigma = 4.0, seed = 42L)),
      ("sf0.01", 16, graft.core.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
        .select(col("vec_id"), col("embedding"))))
    for ((name, nlist, emb) <- corpora) {
      val dir = java.nio.file.Files.createTempDirectory(s"nprobe-$name").toString
      IndexStore.buildIvfPq(emb, dir, nlist, 4, 16, 1)
      val probes = emb.filter(col("vec_id") < nProbes)
      val corpusArr = emb.as[(Long, Array[Float])].collect()
      val corpus = corpusArr.toMap
      val n = corpusArr.length
      val dk = ClusterGeomSweep.kthDist(corpusArr, corpus, nProbes, topK)
      // cluster histogram (from the stored codes) + routes give the
      // exact candidate count per nprobe without re-running the join
      val man = IndexStore.readManifest(spark, dir)
      val hist = spark.read.schema("vec_id BIGINT, cluster BIGINT")
        .parquet(man.codes.map(b => s"$dir/codes/batch_id=$b"): _*)
        .groupBy("cluster").count().as[(Long, Long)].collect().toMap
      val (_, _, _, _, cents, _) = IndexStore.load(spark, dir, man.nonce)
      for (nprobe <- Seq(1, 2, 4, 8, 16)) {
        val routes = Similarity.probeRoutes(probes, cents, nprobe)
        val candFrac = routes.map(_._3.map(c => hist.getOrElse(c, 0L)).sum).sum
          .toDouble / (nProbes.toLong * n)
        val t0 = System.nanoTime()
        val search = IndexStore.searchIvfPq(spark, dir, probes, nprobe, topK)
        val rec = ClusterGeomSweep.recallTol(search, corpus, dk, nProbes, topK)
        val sec = (System.nanoTime() - t0) / 1e9
        // the refined tier (ADC shortlist → exact re-rank): quantization
        // noise is gone, so THIS is where routing becomes the binding
        // constraint and the nprobe knob shows its real curve
        val refined = ClusterGeomSweep.recallTol(
          Similarity.exactRerank(
            IndexStore.searchIvfPq(spark, dir, probes, nprobe, 20), emb, probes, topK),
          corpus, dk, nProbes, topK)
        println(f"NPROBE $name nprobe=$nprobe%2d recall=$rec%.2f " +
          f"refined=$refined%.2f candFrac=$candFrac%.3f serve=$sec%.2f s")
      }
    }
    spark.stop()
  }
}
