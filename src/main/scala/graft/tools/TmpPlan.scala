package graft.tools

/** Dev tool: print the executed plan of one declared query (`runMain graft.tools.TmpPlan <name>`). */
object TmpPlan {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(a(0))(spark, "/root/testdata/sf0.01")
    df.write.format("noop").mode("overwrite").save()
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
