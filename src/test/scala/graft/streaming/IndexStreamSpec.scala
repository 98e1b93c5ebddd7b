package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.operators.IndexStore

class IndexStreamSpec extends SparkSpec {

  test("streamed build+append equals the manual composition; replay adds nothing") {
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    val n = emb.count()
    val root = java.nio.file.Files.createTempDirectory("ixstream").toString
    val cut = n / 2
    emb.filter(col("vec_id") < cut).coalesce(1).write.parquet(s"$root/in/drop0.parquet")
    IndexStream.runOnce(spark, s"$root/in/*", s"$root/ix", s"$root/ck")
    emb.filter(col("vec_id") >= cut).coalesce(1).write.parquet(s"$root/in/drop1.parquet")
    IndexStream.runOnce(spark, s"$root/in/*", s"$root/ix", s"$root/ck")
    // every vector is indexed, across two batch partitions
    val codes = spark.read.parquet(s"$root/ix/codes")
    assert(codes.count() == n)
    assert(codes.select("batch_id").distinct().count() == 2)
    // identical to the manual build-then-append composition
    val ref = s"$root/ref"
    IndexStore.buildIvfPq(emb.filter(col("vec_id") < cut), ref, 16, 4, 16, 1)
    IndexStore.appendIvfPq(emb.filter(col("vec_id") >= cut), ref, 1)
    val probes = emb.filter(col("vec_id") < 5)
    val got = IndexStore.searchIvfPq(spark, s"$root/ix", probes, 4, 5)
      .orderBy(col("probe_id"), col("rnk")).collect().toSeq
    val want = IndexStore.searchIvfPq(spark, ref, probes, 4, 5)
      .orderBy(col("probe_id"), col("rnk")).collect().toSeq
    assert(got.nonEmpty && got == want)
    // an AvailableNow pass with no new files replays nothing: same
    // batches, same rows (checkpoint-exactly-once, not re-append)
    IndexStream.runOnce(spark, s"$root/in/*", s"$root/ix", s"$root/ck")
    assert(spark.read.parquet(s"$root/ix/codes").count() == n)
    assert(spark.read.parquet(s"$root/ix/codes")
      .select("batch_id").distinct().count() == 2)
  }

  test("in-stream compaction (compactEvery) bounds batch count without changing results") {
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    val n = emb.count()
    val root = java.nio.file.Files.createTempDirectory("ixstream-c").toString
    val third = n / 3
    val drops = Seq(
      col("vec_id") < third,
      col("vec_id") >= third && col("vec_id") < 2 * third,
      col("vec_id") >= 2 * third)
    // plain stream (no compaction) as the parity reference
    drops.zipWithIndex.foreach { case (cond, i) =>
      emb.filter(cond).coalesce(1).write.parquet(s"$root/in/drop$i.parquet")
      IndexStream.start(spark, s"$root/in/*", s"$root/ref", s"$root/ckRef")
        .awaitTermination()
      IndexStream.start(spark, s"$root/in/*", s"$root/ix", s"$root/ck",
        compactEvery = 2).awaitTermination()
    }
    // batch 2 compacted {0,1} -> fold -1 before appending itself: two
    // LIVE batches in the manifest (superseded dirs linger as orphans
    // until the next compaction's GC — the snapshot grace period)
    val man = IndexStore.readManifest(spark, s"$root/ix")
    assert(man.codes == Seq(-1L, 2L), man.codes)
    assert(spark.read
      .parquet(man.codes.map(b => s"$root/ix/codes/batch_id=$b"): _*)
      .count() == n)
    val probes = emb.filter(col("vec_id") < 5)
    val got = IndexStore.searchIvfPq(spark, s"$root/ix", probes, 4, 5)
      .orderBy(col("probe_id"), col("rnk")).collect().toSeq
    val want = IndexStore.searchIvfPq(spark, s"$root/ref", probes, 4, 5)
      .orderBy(col("probe_id"), col("rnk")).collect().toSeq
    assert(got.nonEmpty && got == want, "compaction changed streamed search results")
  }
}
