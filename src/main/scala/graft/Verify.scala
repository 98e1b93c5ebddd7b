package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd+ args: run only the named queries (dev loop)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // same builder as Bench/tests (AQE, extensions, shuffle conf) so the
    // verified plans are the benched plans
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Full-precision debug landing (VERDICT r18 #1): for the telemetry
    // rows the driver redded despite in-sandbox bit-identity, persist a
    // dump of the WRITTEN parquet (read back, so it is exactly what the
    // driver hashes; doubles as Double.toString — the shortest
    // round-trip representation, lossless for diffing) — if the driver
    // reds one again, the divergence is diffable instead of destroyed
    // at exit. xs_dsir_membership is the drift row's per-doc bisect
    // (VERDICT r19 #1): its dump identifies the specific flipped doc.
    val debugRows = Set("xs_dsir_drift", "xs_dsir_membership",
      "x2_index_stats", "x2_cluster_profile")
    def landDebug(name: String): Unit = {
      // limit BEFORE collect (ADVICE r19): only the dumped rows reach
      // the driver, so an unexpectedly large debug row can't OOM Verify.
      // The membership ledger is the bisect row — its dump must hold the
      // WHOLE scored set (bounded by the curated corpus, ≤ |documents|,
      // 3 narrow columns) or a doc flipped past the cap is unlocalizable.
      val cap = if (name == "xs_dsir_membership") 200000 else 1000
      val df = spark.read.parquet(s"$outDir/$name").limit(cap)
      val cols = df.schema.fieldNames.toSeq
      val rows = df.collect().map { r =>
        cols.indices.map { i =>
          val v = r.get(i)
          val s = v match {
            case null => "null"
            // NaN/Infinity are invalid JSON — string-wrap them
            case d: java.lang.Double if d.isNaN || d.isInfinite => "\"" + d + "\""
            case d: java.lang.Double => d.toString
            case n: java.lang.Number => n.toString
            case x => "\"" + x.toString.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
          }
          "\"" + cols(i) + "\": " + s
        }.mkString("{", ", ", "}")
      }
      Files.writeString(Paths.get(s"$outDir/$name.debug.json"),
        rows.mkString("[\n", ",\n", "\n]\n"))
    }
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // best-effort: a debug-dump failure must never delete the GOOD
        // row output the outer catch would reap (r19 review)
        if (debugRows.contains(name))
          try landDebug(name)
          catch { case e: Throwable =>
            System.err.println(s"[verify] $name debug dump failed: ${e.getMessage}")
          }
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // remove any stale output from a previous run so the compare
        // reports MISSING instead of silently passing on old results
        val stale = new java.io.File(s"$outDir/$name")
        if (stale.exists()) {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
          }
          rm(stale)
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
