package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Recall-under-drift tripwire for frozen codebooks (VERDICT r11 item
  * 4): [[graft.streaming.IndexStream]] trains on batch 0 and freezes —
  * every later append encodes against codebooks that never saw the new
  * distribution. "Rebuild when drift demands it" was prose; this spec
  * attaches the numbers a pipeline would actually alert on.
  *
  * The headline monitor is PQ RECONSTRUCTION ERROR per batch
  * (`pqEncode`'s `err` — the quantity FAISS users chart): it is
  * engine-computed on every encode pass for free, and at this fixture
  * a +0.5-per-dim translated batch encodes at ~65× the home slice's
  * mean err under frozen books, while a rebuild over the grown corpus
  * brings the drifted slice back into the home band (~13× better).
  * Top-k-overlap recall vs exact L2 is also measured, but is
  * RESOLUTION-LIMITED here: the fixture's near-dup embedding clusters
  * make the "true" top-5 among ~equal candidates a float-association
  * coin flip (see SimilaritySpec's tolerance-recall note), so even
  * in-distribution ADC overlap tops out ~0.2-0.3 — it rides along as
  * a reported number with monotonicity pinned, not as the tripwire. Self-retrieval (an indexed vector's
  * true 1-NN is itself, distance 0) stays exact through the full
  * persisted-index path and is pinned at ≥0.9 on BOTH slices — only a
  * catastrophic shift that collapses a whole batch onto one codeword
  * breaks it, and mean-err fires long before that.
  *
  * Config note: finer quantization than the declared rows (m=16, 64
  * codewords) so quantization noise doesn't mask the drift signal —
  * the point is isolating codebook staleness. */
class IndexDriftSpec extends SparkSpec {

  private val (nlist, m, kcw, iters, nprobe, topK) = (16, 16, 64, 2, 16, 5)

  /** Exact L2 top-k ids per probe over `corpus`, ties to lowest vec_id
    * (driver-side — fixture scale only). */
  private def bruteTopK(corpus: Array[(Long, Array[Float])],
      probes: Array[(Long, Array[Float])], k: Int): Map[Long, Set[Long]] =
    probes.map { case (pid, pv) =>
      pid -> corpus.map { case (cid, cv) =>
        var d = 0.0; var i = 0
        while (i < cv.length) {
          val x = pv(i).toDouble - cv(i); d += x * x; i += 1
        }
        (d, cid)
      }.sortBy(identity).take(k).map(_._2).toSet
    }.toMap

  private def recall(got: Map[Long, Set[Long]], truth: Map[Long, Set[Long]], k: Int): Double =
    truth.keys.map(p => got.getOrElse(p, Set.empty).intersect(truth(p)).size.toDouble / k)
      .sum / truth.size

  test("frozen-codebook drift fires the reconstruction-error tripwire and a rebuild clears it") {
    import spark.implicits._
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
      .select(col("vec_id"), col("embedding"))
    // the drifted drop: every dim translated +0.5 — inside the embedding
    // space but off the training distribution
    val drift = emb.select((col("vec_id") + 100000L).as("vec_id"),
      expr("transform(embedding, x -> CAST(x + 0.5 AS FLOAT))").as("embedding"))
    val both = emb.unionByName(drift)

    // --- the monitor: mean reconstruction err per (books, slice) -----
    val Some((subF, booksF)) = Similarity.pqTrain(emb, m, kcw, iters)
    val Some((subR, booksR)) = Similarity.pqTrain(both, m, kcw, iters)
    def meanErr(books: Array[Array[Array[Double]]], sub: Int, data: DataFrame): Double =
      Similarity.pqEncode(data, sub, books).agg(avg($"err")).head.getDouble(0)
    val errFrozenHome = meanErr(booksF, subF, emb)
    val errFrozenShift = meanErr(booksF, subF, drift)
    val errRebuiltShift = meanErr(booksR, subR, drift)
    info(f"mean encode err: frozen home $errFrozenHome%.3f, frozen shifted $errFrozenShift%.3f, rebuilt shifted $errRebuiltShift%.3f")
    // drift DETECTION: the drifted batch encodes an order of magnitude
    // worse than home under frozen books (measured ~65×; pinned 10×)
    assert(errFrozenShift >= 10 * errFrozenHome,
      f"drift tripwire failed to fire: $errFrozenShift%.3f vs home $errFrozenHome%.3f")
    // drift REMEDY: a rebuild over the grown corpus brings the drifted
    // slice back down (measured ~13× better; pinned 5×)
    assert(errRebuiltShift <= errFrozenShift / 5,
      f"rebuild did not clear the tripwire: $errRebuiltShift%.3f vs frozen $errFrozenShift%.3f")

    // --- the serving path: self-retrieval + brute-force recall -------
    val frozenDir = java.nio.file.Files.createTempDirectory("drift-frozen").toString
    IndexStore.buildIvfPq(emb, frozenDir, nlist, m, kcw, iters) // batch 0 trains
    IndexStore.appendIvfPq(drift, frozenDir, batchId = 1)       // frozen encode
    val rebuiltDir = java.nio.file.Files.createTempDirectory("drift-rebuilt").toString
    IndexStore.buildIvfPq(both, rebuiltDir, nlist, m, kcw, iters)

    // the monitor is INDEX STATE, not just a spec measurement: every
    // build/append lands a stats/batch_id=N row off the same encode
    // pass (a 1-line JSON file — driver-resident after observe(), so
    // landing it costs zero Spark jobs), and the tripwire reads from
    // the artifact a production pipeline would chart
    val stats = spark.read.json(s"$frozenDir/stats")
      .select($"batch_id", $"n", $"mean_err").as[(Long, Long, Double)]
      .collect().sortBy(_._1)
    assert(stats.map(_._1).toSeq == Seq(0L, 1L) && stats.forall(_._2 > 0))
    assert(stats(1)._3 >= 10 * stats(0)._3,
      f"stats artifact missed the drift: batch1 ${stats(1)._3}%.3f vs batch0 ${stats(0)._3}%.3f")

    val corpus = both.as[(Long, Array[Float])].collect()
    val shiftProbes = corpus.filter(r => r._1 >= 100000L && r._1 < 100020L)
    val homeProbes = corpus.filter(_._1 < 20L)
    def searched(dir: String, probes: Array[(Long, Array[Float])]): Map[Long, Set[Long]] =
      IndexStore.searchIvfPq(spark, dir, probes.toSeq.toDF("vec_id", "embedding"), nprobe, topK)
        .select($"probe_id", $"vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet }
    def selfRecall(got: Map[Long, Set[Long]], probes: Array[(Long, Array[Float])]): Double =
      probes.count(p => got.getOrElse(p._1, Set.empty).contains(p._1)).toDouble / probes.length

    val gotFrozenHome = searched(frozenDir, homeProbes)
    val gotFrozenShift = searched(frozenDir, shiftProbes)
    val gotRebuiltShift = searched(rebuiltDir, shiftProbes)
    assert(selfRecall(gotFrozenHome, homeProbes) >= 0.9)
    assert(selfRecall(gotFrozenShift, shiftProbes) >= 0.9,
      "frozen index lost self-retrieval on the drifted batch — codes collapsed")

    val truthShift = bruteTopK(corpus, shiftProbes, topK)
    val truthHome = bruteTopK(corpus, homeProbes, topK)
    val recFrozenHome = recall(gotFrozenHome, truthHome, topK)
    val recFrozenShift = recall(gotFrozenShift, truthShift, topK)
    val recRebuiltShift = recall(gotRebuiltShift, truthShift, topK)
    info(f"brute-force recall@$topK: frozen home $recFrozenHome%.2f, frozen shifted $recFrozenShift%.2f, rebuilt shifted $recRebuiltShift%.2f")
    // resolution-limited at this fixture (see scaladoc): pin the floor
    // for the in-distribution slice and monotonicity for the remedy
    assert(recFrozenHome >= 0.10, f"home-slice recall $recFrozenHome%.2f below 0.10")
    assert(recRebuiltShift >= recFrozenShift - 0.05,
      f"rebuild worsened drifted-slice recall: $recRebuiltShift%.2f vs $recFrozenShift%.2f")
  }
}
