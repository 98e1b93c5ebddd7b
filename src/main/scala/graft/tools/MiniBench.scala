package graft.tools

/** Dev tool: time individual declared queries at sf0.1 into a noop sink
  * (`runMain graft.tools.MiniBench q1_pricing_summary ...`); first query doubles as
  * warm-up. */
object MiniBench {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("MINI_DIR", "/root/testdata/sf0.1")
    for (name <- a) {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"MINI $name ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
