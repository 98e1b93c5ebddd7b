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

  test("AQE skew-join split fires at runtime (GraftSession posture, not just config)") {
    import spark.implicits._
    // GraftSession enables adaptive.skewJoin; prove the optimization
    // actually rewrites a skewed sort-merge join, with the thresholds
    // scaled down to fixture size (they are runtime-tunable per session)
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val pad = "x" * 64
      val left = spark.range(60000)
        .select(when($"id" % 10 =!= 0, 7L).otherwise($"id").as("k"), // 90 % on one key
          concat(lit(pad), $"id").as("payload"))
      val right = spark.range(200).select($"id".as("rk"), concat(lit("d"), $"id").as("attr"))
      val joined = left.join(right, $"k" === $"rk")
      joined.collect() // finalize the adaptive plan on THIS QueryExecution
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(3000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
