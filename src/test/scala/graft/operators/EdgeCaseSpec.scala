package graft.operators

import graft.SparkSpec

/** Degenerate-input behavior: empty tables and empty probe sets must
  * yield empty results, not exceptions — a driver or scheduler restart
  * at 100 TB routinely replays zero-row partitions. */
class EdgeCaseSpec extends SparkSpec {

  test("near-dup / simhash / similarity on empty input return empty") {
    import spark.implicits._
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.neardupMinhash(noDocs).count() == 0)
    assert(Dedup.simhash(noDocs).count() == 0)
    assert(Dedup.simhashPortable(noDocs).count() == 0)
    assert(Dedup.simhashPortableNeardup(noDocs).count() == 0)
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Dedup.embeddingNeardup(noVecs, 0.5).count() == 0)
    assert(Similarity.cosineTopK(noVecs, noVecs, 5).count() == 0)
  }

  test("embedding block grid handles n=1 and n < block floor") {
    import spark.implicits._
    val one = Seq((7L, Array.fill(4)(1.0f))).toDF("vec_id", "embedding")
    assert(Dedup.embeddingNeardup(one, 0.0).count() == 0) // no self-pairs
    // 3 vectors < the 8-block floor: every distinct pair still found once
    val tri = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.01f)), (2L, Array(0.99f, 0.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNeardup(tri, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((0L, 1L), (0L, 2L), (1L, 2L)), pairs.toSeq)
  }

  test("one-token and whitespace-heavy docs shingle without error") {
    import spark.implicits._
    val docs = Seq((1L, "single"), (2L, "  a   b  "), (3L, "x y z w v u"))
      .toDF("doc_id", "text")
    // self-comparison via duplicate ids at different keys
    val dup = docs.union(Seq((11L, "single"), (12L, "  a   b  ")).toDF("doc_id", "text"))
    val pairs = Dedup.neardupMinhash(dup).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 11L), (2L, 12L))) // whitespace normalization collapses doc 2/12
  }

  test("asof join with no matching earlier rows yields empty (not nulls)") {
    import spark.implicits._
    import java.sql.Timestamp
    val clicks = Seq((1L, 5L, Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("event_id", "user_id", "ts")
    val views = Seq((5L, Timestamp.valueOf("2024-01-02 00:00:00")))
      .toDF("user_id", "view_ts") // only AFTER the click
    val out = AsOf.asOfJoin(clicks, views, Seq("user_id"), "ts", "view_ts")
    assert(out.count() == 1 && out.filter(out("asof").isNotNull).count() == 0)
  }
}
