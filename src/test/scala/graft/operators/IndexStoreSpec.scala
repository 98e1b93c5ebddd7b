package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class IndexStoreSpec extends SparkSpec {

  test("persisted IVF-PQ search equals the in-memory composition bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-ix").toString
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    val probes = emb.filter(col("vec_id") < 10)
    IndexStore.buildIvfPq(emb, dir, 16, 4, 16, 1)
    val persisted = IndexStore.searchIvfPq(spark, dir, probes, 4, 5)
      .orderBy(col("probe_id"), col("rnk")).collect()
    val direct = Similarity.ivfPqSearch(emb, probes, 16, 4, 4, 16, 1, 5)
      .orderBy(col("probe_id"), col("rnk")).collect()
    assert(persisted.length == direct.length && persisted.length > 0)
    assert(persisted.toSeq == direct.toSeq) // adist doubles included: bit-identical
  }

  test("search scans only the stored codes — no corpus embedding read, no training") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-ix2").toString
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    IndexStore.buildIvfPq(emb, dir, 16, 4, 16, 1)
    // probes handed in as local rows, so ANY embeddings.parquet scan in
    // the search plan would be a corpus-side full-vector read
    val probes = emb.filter(col("vec_id") < 3)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toSeq.toDF("vec_id", "embedding")
    val search = IndexStore.searchIvfPq(spark, dir, probes, 4, 5)
    val plan = search.queryExecution.executedPlan.toString
    // the corpus-sized input is the codes table from the index dir...
    assert(plan.contains("codes"), plan)
    // ...and the embeddings fixture (the full vectors) is never scanned
    // — queries are served from the m-ints-per-row codes alone
    assert(!plan.contains("embeddings.parquet"), plan)
  }

  test("a partially-written index is refused, not silently served") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-ix3").toString
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    IndexStore.buildIvfPq(emb, dir, 16, 4, 16, 1)
    // simulate a crash that lost the codes commit marker
    assert(new java.io.File(s"$dir/codes/_SUCCESS").delete())
    val e = intercept[IllegalArgumentException] {
      IndexStore.searchIvfPq(spark, dir, emb.filter(col("vec_id") < 3), 4, 5).collect()
    }
    assert(e.getMessage.contains("codes"), e.getMessage)
  }
}
