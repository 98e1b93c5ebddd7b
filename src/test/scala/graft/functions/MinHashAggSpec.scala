package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MinHashAggSpec extends SparkSpec {
  test("UDAF minima equal a direct per-group computation") {
    import spark.implicits._
    val k = 8
    val rows = Seq((1L, 11L), (1L, 22L), (1L, 33L), (2L, 44L))
    val got = rows.toDF("g", "x")
      .groupBy($"g").agg(
        udaf(new MinHashAgg(k), org.apache.spark.sql.Encoders.scalaLong)
          .apply($"x").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def expected(xs: Seq[Long]) =
      (0 until k).map(i => xs.map(Hashing.mixSeeded(_, i)).min)
    assert(got(1L) == expected(Seq(11L, 22L, 33L)))
    assert(got(2L) == expected(Seq(44L)))
  }
}
