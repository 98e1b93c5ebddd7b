package graft.tools

/** Dev tool: stage-level timings for x4_kmv_jaccard's subtrees at sf0.1
  * (`runMain graft.tools.KmvProbe`) — which of shingle-gen / group-by-shingle /
  * sketch / pair stages dominates. */
object KmvProbe {
  def main(a: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = sys.env.getOrElse("MINI_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }
    val docs = graft.core.Tables.load(spark, dir, "documents")
    time("warm-docs-count")(docs.count())
    val sh = docs.select($"lang", explode(graft.operators.Dedup.shingles($"text")).as("s"))
    time("shingle-count")(sh.count())              // shingle generation alone
    time("shingle-count-2")(sh.count())            // warm repeat
    time("group-by-shingle")(sh.groupBy($"s").agg(collect_set($"lang")).count())
    val g = sh.groupBy($"s").agg(collect_set($"lang").as("ls"))
    val kmv = udaf(new graft.functions.KmvAgg(1024))
    time("sketch-over-g")(g
      .withColumn("h", conv(substring(md5($"s".cast(org.apache.spark.sql.types.BinaryType)), 1, 12), 16, 10)
        .cast(org.apache.spark.sql.types.LongType))
      .select($"h", explode($"ls").as("lang"))
      .groupBy($"lang").agg(kmv($"h")).count())
    time("full-row")({
      graft.SparkEntry.queries("x4_kmv_jaccard")(spark, dir)
        .write.format("noop").mode("overwrite").save(); 1L })
    time("full-row-2")({
      graft.SparkEntry.queries("x4_kmv_jaccard")(spark, dir)
        .write.format("noop").mode("overwrite").save(); 1L })
    spark.stop()
  }
}
