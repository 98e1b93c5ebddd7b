package graft.operators
// dev probe: winnowing recall/density at each SF and (k, w) — evidence
// for the x1_substring_dup_winnow floors (BENCHNOTES)
object WinnowProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); w <- Seq(8, 16, 32)) {
      val docs = graft.core.Tables.load(spark, s"/root/testdata/$sf", "documents")
      val k = 24
      val all = docs.select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (id, t) => Dedup.charGramSet(t, k).iterator.map(g => (id, g)) }
        .toDF("doc_id", "gram").persist()
      val win = docs.select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (id, t) => Dedup.winnowedGramSet(t, k, w).iterator.map(g => (id, g)) }
        .toDF("doc_id", "gram").persist()
      def pairs(g: org.apache.spark.sql.DataFrame) =
        g.select(col("gram"), col("doc_id").as("a"))
          .join(g.select(col("gram"), col("doc_id").as("b")), Seq("gram"))
          .filter(col("a") < col("b")).select(col("a"), col("b")).distinct()
      val ex = pairs(all).persist()
      val nEx = ex.count(); val nWin = pairs(win).join(ex, Seq("a", "b")).count()
      val dAll = all.count(); val dWin = win.count()
      println(f"[winnow] $sf k=$k w=$w exact=$nEx hit=$nWin recall=${if (nEx == 0) 1.0 else nWin.toDouble / nEx}%.3f density=${dWin.toDouble / dAll}%.3f")
      all.unpersist(); win.unpersist(); ex.unpersist()
    }
    spark.stop()
  }
}
