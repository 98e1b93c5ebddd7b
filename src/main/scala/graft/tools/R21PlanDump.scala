package graft.tools

/** Dev tool (r21 optimization round): dump `.explain("formatted")` for
  * the named declared queries into `plans/r21/<name>_<tag>.txt`, one
  * file per query — the before/after plan evidence the optimization
  * deliverable asks for. Each query is executed into the noop sink
  * first so the dumped plan is the FINAL AQE plan, not the initial one.
  *
  *   runMain graft.tools.R21PlanDump before q1_pricing_summary ...
  *
  * Loop-driven rows (sliced/streaming harnesses) return a post-loop
  * store scan; for those the interesting plans are the core operator's
  * (same exclusion rule as PLANPINS).
  */
object R21PlanDump {
  def main(a: Array[String]): Unit = {
    require(a.length >= 2, "usage: R21PlanDump <tag> <query>...")
    val tag = a.head
    val spark = graft.core.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("R21_PLAN_DIR", "/root/testdata/sf0.01")
    val out = java.nio.file.Paths.get("/root/repo/plans/r21")
    java.nio.file.Files.createDirectories(out)
    for (n <- a.tail) {
      val df = graft.SparkEntry.queries(n)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(out.resolve(s"${n}_$tag.txt"), txt)
      println(s"WROTE plans/r21/${n}_$tag.txt")
    }
    spark.stop()
  }
}
