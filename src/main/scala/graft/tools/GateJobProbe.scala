package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Dev tool (r21, VERDICT r20 #5): per-JOB cost breakdown of the gated
  * curate streams — one row per Spark job with wall duration and the
  * job group's running description, so the per-micro-batch overhead of
  * each gate stage (keep-first, key store, LM/DSIR scoring, near-dup,
  * writes) is attributable instead of guessed.
  *
  *   runMain graft.tools.GateJobProbe [dsir|lm|neardup|pack|plain]
  */
object GateJobProbe {
  def main(a: Array[String]): Unit = {
    val mode = a.headOption.getOrElse("dsir")
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.1")
    val docs = graft.core.Tables.load(spark, dir, "documents")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        val call = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        starts.put(js.jobId,
          (System.nanoTime(), s"$desc | $call".replaceAll("\\s+", " "))); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, d) =>
          rows.add((je.jobId, (System.nanoTime() - t0) / 1e9, d)); ()
        }
      }
    }

    // warehouse artifacts built OUTSIDE the probe window
    val dsirDir = graft.operators.TokenizerStore.ensureTokenizerFor(spark,
      s"$dir/documents.parquet", "dsir-en-a05",
      d => graft.operators.Curation.trainDsir(docs, col("lang") === "en", d))
    val lmDir = graft.operators.TokenizerStore.ensureTokenizerFor(spark,
      s"$dir/documents.parquet", "biglm-a1-cd",
      d => graft.operators.TokenizerStore.trainBigramLm(docs, d))
    val packTok = graft.operators.TokenizerStore.ensureTokenizerFor(spark,
      s"$dir/documents.parquet", "bpe-r8v256",
      d => graft.operators.TokenizerStore.trainBpe(docs, d, 8, 256))

    // local copy of CurateStream.threeOrderedDrops (private[streaming])
    def threeDrops(pass: String => Unit): String = {
      val rootPath = java.nio.file.Files.createTempDirectory(s"gatejob-$mode")
      val root = rootPath.toString
      val r = docs.agg(min(col("doc_id")), max(col("doc_id"))).head
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      val (c1, c2) = (lo + (hi - lo) / 3, lo + 2 * ((hi - lo) / 3))
      val stage = s"$root/stage"
      docs.withColumn("_drop",
          when(col("doc_id") <= c1, 0).when(col("doc_id") <= c2, 1).otherwise(2))
        .coalesce(2).write.partitionBy("_drop").parquet(stage)
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/in"))
      (0 until 3).foreach { i =>
        val src = new org.apache.hadoop.fs.Path(s"$stage/_drop=$i")
        val dst = new org.apache.hadoop.fs.Path(s"$root/in/drop$i.parquet")
        if (fs.exists(src)) require(fs.rename(src, dst))
        else fs.mkdirs(dst)
        println(s"DROP $i begins")
        pass(root)
      }
      root
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val root = threeDrops { root =>
      mode match {
        case "dsir" => graft.streaming.CurateStream.runOnce(spark,
          s"$root/in/*", s"$root/out", s"$root/ck", dsirGate = Some((dsirDir, 0.0)))
        case "lm" => graft.streaming.CurateStream.runOnce(spark,
          s"$root/in/*", s"$root/out", s"$root/ck", lmGate = Some((lmDir, 3.41)))
        case "neardup" => graft.streaming.CurateStream.runOnce(spark,
          s"$root/in/*", s"$root/out", s"$root/ck", nearDupJaccard = Some(0.8))
        case "plain" => graft.streaming.CurateStream.runOnce(spark,
          s"$root/in/*", s"$root/out", s"$root/ck")
        case "pack" =>
          graft.streaming.CurateStream.startCurateAndPack(spark, s"$root/in/*",
            s"$root/out", s"$root/ck", packTok).awaitTermination()
      }
    }
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(800)
    spark.sparkContext.removeSparkListener(listener)
    import scala.jdk.CollectionConverters._
    val all = rows.asScala.toSeq.sortBy(_._1)
    println(f"PROBE mode=$mode total=$total%.2f s jobs=${all.size} jobtime=${all.map(_._2).sum}%.2f")
    all.foreach { case (id, sec, d) =>
      println(f"JOB $id%4d $sec%7.3f  ${d.take(140)}")
    }
    println(s"IGNORE root=$root")
    spark.stop()
  }
}
