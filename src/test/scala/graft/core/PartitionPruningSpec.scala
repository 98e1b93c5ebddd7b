package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partition layout + pruning — the other half of the 100 TB read-path
  * story (PushedFilters handles row groups; partition pruning skips whole
  * directories). */
class PartitionPruningSpec extends SparkSpec {

  test("static partition pruning reads only the filtered date partitions") {
    val root = Files.createTempDirectory("graft-part").toString
    val events = Tables.load(spark, sf("sf0.001"), "events")
      .withColumn("date", to_date(col("ts")))
    events.write.mode("overwrite").partitionBy("date").parquet(s"$root/events")

    val dates = events.select("date").distinct().count()
    assert(dates > 1, "fixture must span multiple dates for this test")

    val firstDate = events.agg(min(col("date"))).collect().head.getDate(0)
    val pruned = spark.read.parquet(s"$root/events")
      .filter(col("date") === lit(firstDate))
    val plan = pruned.queryExecution.executedPlan.toString
    // the scan must report a pruned partition filter and read 1 partition
    assert(plan.contains("PartitionFilters"), plan)
    val expected = events.filter(col("date") === lit(firstDate)).count()
    assert(pruned.count() == expected)
  }

  test("dynamic partition pruning fires on a dimension-filtered join") {
    val root = Files.createTempDirectory("graft-dpp").toString
    val events = Tables.load(spark, sf("sf0.001"), "events")
      .withColumn("date", to_date(col("ts")))
    events.write.mode("overwrite").partitionBy("date").parquet(s"$root/events")
    val fact = spark.read.parquet(s"$root/events")
    // dim table with a real filter predicate selecting one date — the
    // classic star-schema shape DPP is built for
    val firstDate = events.agg(min(col("date"))).collect().head.getDate(0)
    events.select(col("date")).distinct()
      .withColumn("flag", (col("date") === lit(firstDate)).cast("int"))
      .write.mode("overwrite").parquet(s"$root/dim")
    val dim = spark.read.parquet(s"$root/dim").filter(col("flag") === 1)

    val joined = fact.join(dim, Seq("date"))
    val optimized = joined.queryExecution.optimizedPlan.toString
    val physical = joined.queryExecution.executedPlan.toString
    assert(optimized.contains("dynamicpruning") || physical.contains("dynamicpruning"),
      s"no DPP subquery found:\n$physical")
  }
}
