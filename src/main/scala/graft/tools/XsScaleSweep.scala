package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool (VERDICT r18 #5): amplified-scale datapoints for the two
  * heaviest streaming rows — `xs_curate_pack_gated` (the fully-gated
  * curate→pack loop) and `xs_pack_stream` (incremental packing with the
  * token-offset carry) — on the cached ScaleProbe fixtures.
  *
  * Two claims under test, per row:
  *   - cost is ~LINEAR in batch SIZE: the 10× corpus through the same
  *     3 drops should cost ~10× the per-batch work (plus the flat
  *     checkpoint overhead), never super-linear;
  *   - cost is ~FLAT in batch COUNT: the same 1× corpus through 6
  *     drops instead of 3 should cost about the same total (each doc
  *     is curated/encoded once either way; only the per-batch fixed
  *     overhead doubles).
  *
  * `runMain graft.tools.XsScaleSweep [m...]` (default: the two claims
  * above); results land in BENCHNOTES.md. */
object XsScaleSweep {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // returns (timed total across passes, root) — the caller reads any
    // outputs it wants OUTSIDE the timing, then deletes the root
    def orderedDrops(base: String, prefix: String, nDrops: Int)(
        pass: String => Unit): (Double, String) = {
      val docs = graft.core.Tables.load(spark, base, "documents")
      val rootPath = java.nio.file.Files.createTempDirectory(prefix)
      val root = rootPath.toString
      val r = docs.agg(min(col("doc_id")), max(col("doc_id"))).head
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      val cuts = (1 until nDrops).map(i => lo + i * ((hi - lo) / nDrops))
      val bounds = (Seq(lo - 1) ++ cuts) :+ hi
      var total = 0.0
      (0 until nDrops).foreach { i =>
        docs.filter(col("doc_id") > bounds(i) && col("doc_id") <= bounds(i + 1))
          .coalesce(2).write.parquet(s"$root/in/drop$i.parquet")
        total += timed(pass(root))
      }
      (total, root)
    }
    def rm(root: String): Unit =
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    // first config repeats as a throwaway JVM/codegen warm-up so the
    // 1×-vs-10× comparison is not polluted by first-run compilation
    for ((base, m, drops) <- Seq(
        ("/root/repo/out/scale/m1", 0, 3),
        ("/root/repo/out/scale/m1", 1, 3),
        ("/root/repo/out/scale/m1", 1, 6),
        ("/root/repo/out/scale/m10", 10, 3))) {
      val docs = graft.core.Tables.load(spark, base, "documents")
      val nDocs = docs.count()
      val packTok = graft.operators.TokenizerStore.ensureTokenizerFor(spark,
        s"$base/documents.parquet", "bpe-r8v256",
        d => graft.operators.TokenizerStore.trainBpe(docs, d, 8, 256))
      val lmTok = graft.operators.TokenizerStore.ensureTokenizerFor(spark,
        s"$base/documents.parquet", "biglm-a1-cd",
        d => graft.operators.TokenizerStore.trainBigramLm(docs, d))
      // corpus-relative LM cutoff (p90 cross-entropy) instead of the
      // declared row's fixture constant 3.41: the amplified corpora's
      // entropy distribution shifts, and a fixed cutoff gated out 100 %
      // of m10 (first r19 sweep run) — a degenerate workload that
      // measures nothing downstream of the gate
      val lmCut = graft.operators.TokenizerStore.scoreBigramLm(
          docs.select(col("doc_id"), col("text")), lmTok)
        .stat.approxQuantile("cross_entropy", Array(0.9), 0.001)(0)
      val (gatedSec, gatedRoot) = orderedDrops(base, "sweep-gated", drops) { root =>
        graft.streaming.CurateStream.startCurateAndPack(spark,
          s"$root/in/*", s"$root/out", s"$root/ck", packTok,
          nearDupJaccard = Some(0.8), lmGate = Some((lmTok, lmCut)),
          staleWhen = 100.0, staleTpwAbs = 100.0, requireOrdered = true)
          .awaitTermination()
      }
      val gatedSeqs =
        graft.streaming.PackStream.packed(spark, s"$gatedRoot/out/pack").count()
      rm(gatedRoot)
      val (packSec, packRoot) = orderedDrops(base, "sweep-pack", drops) { root =>
        graft.streaming.PackStream.runOnce(spark,
          s"$root/in/*", s"$root/out", s"$root/ck", packTok,
          requireOrdered = true)
      }
      val packSeqs =
        graft.streaming.PackStream.packed(spark, s"$packRoot/out").count()
      rm(packRoot)
      println(f"""{"scale":$m,"n_docs":$nDocs,"drops":$drops,""" +
        f""""curate_pack_gated_sec":$gatedSec%.2f,"gated_seqs":$gatedSeqs,""" +
        f""""pack_stream_sec":$packSec%.2f,"pack_seqs":$packSeqs}""")
    }
    spark.stop()
  }
}
