package graft.operators
import org.apache.spark.sql.functions._
// temporary dev sweep for the drift spec's floors (lives in graft.operators
// for private[operators] access to pqTrain/pqEncode)
object DriftSweep {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val shiftExpr = a.headOption.getOrElse("x + 0.5")
    val drift = emb.select((col("vec_id") + 100000L).as("vec_id"),
      expr(s"transform(embedding, x -> CAST($shiftExpr AS FLOAT))").as("embedding"))
    val both = emb.unionByName(drift)
    for ((m, kcw, iters, nlist, nprobe, topk) <- Seq((16, 64, 2, 16, 16, 5), (8, 32, 2, 16, 4, 5))) {
      // frozen: train on original only; rebuilt: train on combined
      val Some((subF, booksF)) = Similarity.pqTrain(emb, m, kcw, iters)
      val Some((subR, booksR)) = Similarity.pqTrain(both, m, kcw, iters)
      def meanErr(books: Array[Array[Array[Double]]], sub: Int, data: org.apache.spark.sql.DataFrame) =
        Similarity.pqEncode(data, sub, books).agg(avg($"err")).head.getDouble(0)
      val eFH = meanErr(booksF, subF, emb); val eFS = meanErr(booksF, subF, drift)
      val eRH = meanErr(booksR, subR, emb); val eRS = meanErr(booksR, subR, drift)
      // self-recall through the full persisted index path
      val fdir = java.nio.file.Files.createTempDirectory("dsw-f").toString
      IndexStore.buildIvfPq(emb, fdir, nlist, m, kcw, iters)
      IndexStore.appendIvfPq(drift, fdir, 1)
      val rdir = java.nio.file.Files.createTempDirectory("dsw-r").toString
      IndexStore.buildIvfPq(both, rdir, nlist, m, kcw, iters)
      def selfRec(dir: String, probes: org.apache.spark.sql.DataFrame) = {
        val hits = IndexStore.searchIvfPq(spark, dir, probes, nprobe, topk)
          .filter($"probe_id" === $"vec_id").count()
        hits.toDouble / probes.count()
      }
      val sFH = selfRec(fdir, emb.filter($"vec_id" < 20))
      val sFS = selfRec(fdir, drift.filter($"vec_id" < 100020L))
      val sRS = selfRec(rdir, drift.filter($"vec_id" < 100020L))
      println(f"CONF m=$m k=$kcw it=$iters | err frozen home=$eFH%.3f shift=$eFS%.3f rebuilt home=$eRH%.3f shift=$eRS%.3f | selfRec frozenHome=$sFH%.2f frozenShift=$sFS%.2f rebuiltShift=$sRS%.2f")
    }
    spark.stop()
  }
}
