package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  test("salted join returns exactly the plain-join result and spreads the hot key") {
    import spark.implicits._
    // one hot key (90% of rows) + a long tail
    val left = ((1 to 900).map(i => (7L, s"row$i")) ++ (1 to 100).map(i => (i.toLong + 100, s"t$i")))
      .toDF("k", "payload")
    val right = (1 to 250).map(i => (i.toLong, s"dim$i")).toDF("rk", "attr")

    val salted = Skew.saltedJoin(left, right, "k", "rk", salts = 8, disambigCol = "payload")
    val plain = left.join(right, $"k" === $"rk")
    assert(salted.count() == plain.count())
    assert(salted.select("k", "payload", "attr").except(
      plain.select("k", "payload", "attr")).isEmpty)

    // hot-key rows really spread across multiple salt buckets
    val spread = left.filter($"k" === 7)
      .withColumn("s", pmod(xxhash64($"k", $"payload"), lit(8L)))
      .select(countDistinct($"s")).as[Long].head()
    assert(spread >= 6, s"only $spread salt buckets used")
  }
}
