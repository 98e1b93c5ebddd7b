package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KmvAggSpec extends SparkSpec {
  import spark.implicits._

  test("UDAF buffer equals the k smallest distinct values per group") {
    val k = 4
    val rows = Seq( // group 1: dups + more than k values; group 2: fewer than k
      (1L, 50L), (1L, 10L), (1L, 30L), (1L, 10L), (1L, 20L), (1L, 40L), (1L, 30L),
      (2L, 7L), (2L, 7L), (2L, 3L))
    val got = rows.toDF("g", "h").repartition(4) // force multi-partition merge
      .groupBy($"g").agg(
        udaf(new KmvAgg(k), org.apache.spark.sql.Encoders.scalaLong)
          .apply($"h").as("sk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == Seq(10L, 20L, 30L, 40L))
    assert(got(2L) == Seq(3L, 7L)) // short buffer IS the exact distinct set
  }

  test("reduce/merge match a brute-force reference on seeded random streams") {
    val k = 16
    val agg = new KmvAgg(k)
    val rnd = new scala.util.Random(42)
    // duplicate-heavy stream: values drawn from a small range
    val xs = Seq.fill(500)(rnd.nextInt(120).toLong)
    val expected = xs.distinct.sorted.take(k)
    // reduce in stream order
    val reduced = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
    assert(reduced.toSeq == expected)
    // arbitrary split points merge to the same sketch (mergeability)
    for (cut <- Seq(1, 17, 250, 499)) {
      val (a, b) = xs.splitAt(cut)
      val m = agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(m).toSeq == expected, s"cut=$cut")
    }
  }

  test("merge is associative, commutative, and order-independent (randomized)") {
    // the mergeable-summary contract: any partitioning of the input,
    // merged in any shape, yields the same sketch — what lets per-shard
    // sketches combine without coordination
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 50) {
      val k = 1 + rnd.nextInt(12)
      val agg = new KmvAgg(k)
      val n = 1 + rnd.nextInt(200)
      val xs = Seq.fill(n)(rnd.nextInt(60).toLong) // duplicate-heavy
      val expected = xs.distinct.sorted.take(k)
      // random 3-way partition, two association orders + a swap
      val marks = xs.map(_ => rnd.nextInt(3))
      val parts = (0 until 3).map(p =>
        xs.zip(marks).collect { case (x, m) if m == p => x }
          .foldLeft(agg.zero)(agg.reduce))
      val leftAssoc = agg.merge(agg.merge(parts(0), parts(1)), parts(2))
      assert(agg.finish(leftAssoc).toSeq == expected, s"trial $trial k=$k leftAssoc")
      val parts2 = (0 until 3).map(p =>
        xs.zip(marks).collect { case (x, m) if m == p => x }
          .foldLeft(agg.zero)(agg.reduce))
      val rightAssoc = agg.merge(parts2(0), agg.merge(parts2(1), parts2(2)))
      assert(agg.finish(rightAssoc).toSeq == expected, s"trial $trial k=$k rightAssoc")
      val parts3 = (0 until 3).map(p =>
        xs.zip(marks).collect { case (x, m) if m == p => x }
          .foldLeft(agg.zero)(agg.reduce))
      val swapped = agg.merge(parts3(2), agg.merge(parts3(0), parts3(1)))
      assert(agg.finish(swapped).toSeq == expected, s"trial $trial k=$k swapped")
    }
  }

  test("KMV estimator is within 3 sigma on a known-cardinality universe") {
    val k = 256
    val agg = new KmvAgg(k)
    val n = 20000
    // md5-derived 48-bit hashes of 0..n-1 — the declared row's hash space
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = (0 until n).map { i =>
      val d = md.digest(i.toString.getBytes("UTF-8"))
      ((d(0) & 0xFFL) << 40) | ((d(1) & 0xFFL) << 32) | ((d(2) & 0xFFL) << 24) |
        ((d(3) & 0xFFL) << 16) | ((d(4) & 0xFFL) << 8) | (d(5) & 0xFFL)
    }
    val sk = agg.finish(hs.foldLeft(agg.zero)(agg.reduce))
    assert(sk.length == k)
    val est = (k - 1).toDouble * 281474976710656.0 / sk(k - 1)
    val sigma = n / math.sqrt(k - 2)
    assert(math.abs(est - n) < 3 * sigma, s"est=$est n=$n sigma=$sigma")
  }
}
