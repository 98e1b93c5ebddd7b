package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool (r20): amplified-scale datapoints for `xs_bitext_stream` —
  * the round's heaviest new bench row — on the cached ScaleProbe
  * fixtures (`out/scale/m1`, `out/scale/m10`).
  *
  * Three claims under test:
  *   - the stream's TOTAL ranking work over D drops is ~the one-shot's
  *     (each target vector is scored against src once, forward state
  *     merges are k·|S|-row cheap), while NAIVE re-mining — re-running
  *     the one-shot batch after every drop, the deployment it replaces
  *     — pays O(Σ|T_≤i|) ≈ (D+1)/2 × the one-shot;
  *   - the advantage holds at 10× corpus scale (both sides grow);
  *   - total cost is ~FLAT in drop COUNT at fixed corpus size (6 drops
  *     vs 3: the ranking work is identical, only the per-batch tail
  *     recompute and checkpoint overhead repeat).
  *
  * Per config the final mined store is checked row-identical (sims and
  * margins bit-equal) against the one-shot [[graft.operators.Similarity
  * .bitextMine]] — the stream-composition proof at amplified scale,
  * extending the fixture-scale driver row the way BitextSweep extends
  * `x2_bitext_sliced`.
  *
  * `runMain graft.tools.BitextStreamSweep [m...]` (default 1 10);
  * results land in BENCHNOTES.md. */
object BitextStreamSweep {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def rm(root: String): Unit =
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    def minedRows(out: String) = spark.read
      .schema("src_id BIGINT, tgt_id BIGINT, sim DOUBLE, margin DOUBLE, batch_id BIGINT")
      .parquet(s"$out/mined")
      .select("src_id", "tgt_id", "sim", "margin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val scales = if (a.nonEmpty) a.map(_.toInt).toSeq else Seq(1, 10)
    // (scale, nDrops): the last m1 config is the drop-count claim; the
    // first config repeats as a throwaway warm-up (XsScaleSweep
    // discipline) so 1×-vs-10× is not polluted by codegen compilation
    val configs = Seq((scales.head, 3)) ++ scales.map((_, 3)) ++ Seq((scales.head, 6))
    configs.zipWithIndex.foreach { case ((m, nDrops), ci) =>
      val emb = graft.core.Tables.load(spark, s"/root/repo/out/scale/m$m", "embeddings")
      val src = emb.filter(col("vec_id") % 2 === 0)
      val tgt = emb.filter(col("vec_id") % 2 === 1)
      val root = java.nio.file.Files.createTempDirectory("bitext-stream-sweep").toString
      val r = tgt.agg(min(col("vec_id")), max(col("vec_id"))).head
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      val cuts = (1 until nDrops).map(i => lo + i * ((hi - lo) / nDrops))
      val bounds = (Seq(lo - 1) ++ cuts) :+ hi
      var streamSecs = List.empty[Double]
      var naiveSecs = List.empty[Double]
      (0 until nDrops).foreach { i =>
        tgt.filter(col("vec_id") > bounds(i) && col("vec_id") <= bounds(i + 1))
          .coalesce(2).write.parquet(s"$root/in/drop$i.parquet")
        streamSecs :+= timed(graft.streaming.BitextStream.runOnce(
          spark, s"$root/in/*", s"$root/out", s"$root/ck", src, 4, 1.0))
        // the deployment this replaces: re-run the one-shot batch over
        // ALL target history after every drop
        val tgtSoFar = tgt.filter(col("vec_id") <= bounds(i + 1))
        naiveSecs :+= timed {
          graft.operators.Similarity.bitextMine(src, tgtSoFar, 4, 1.0).count(); ()
        }
      }
      val streamed = minedRows(s"$root/out")
      val oneShot = graft.operators.Similarity.bitextMine(src, tgt, 4, 1.0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
      rm(root)
      if (ci == 0) println(s"# warm-up (m$m, discarded)")
      else println(f"""{"scale":$m,"n_drops":$nDrops,"mined_rows":${streamed.size},""" +
        f""""stream_secs":[${streamSecs.map(s => f"$s%.1f").mkString(",")}],""" +
        f""""stream_total":${streamSecs.sum}%.1f,""" +
        f""""naive_secs":[${naiveSecs.map(s => f"$s%.1f").mkString(",")}],""" +
        f""""naive_total":${naiveSecs.sum}%.1f,""" +
        f""""parity":${streamed == oneShot}}""")
    }
    spark.stop()
  }
}
