package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed co-located join: both sides pre-bucketed on the key join
  * without any Exchange — the at-scale layout for repeated fact⋈fact
  * joins. */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without a shuffle") {
    val orders = Tables.load(spark, sf("sf0.001"), "orders")
    val lineitem = Tables.load(spark, sf("sf0.001"), "lineitem")
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "l_orderkey", 4)

    // disable broadcast so the join-strategy choice (shuffle vs bucket
    // co-location) is what the plan shows — at real fact⋈fact scale
    // broadcast wouldn't apply anyway
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem").join(
        spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      assert(joined.count() == lineitem.count()) // every line item matches

      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)

      // the same join unbucketed DOES shuffle (sanity of the claim)
      val p2 = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(p2.contains("Exchange"), p2)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ensureBucketed builds once and reuses — no per-invocation rewrite") {
    val orders = Tables.load(spark, sf("sf0.001"), "orders")
    val name = Bucketing.ensureBucketed(orders, "eb_orders", "o_orderkey", 4, "fp-A")
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name)
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataMtimes: Map[String, Long] =
      fs.listStatus(warehouse).filter(_.getPath.getName.startsWith("part-"))
        .map(s => s.getPath.getName -> s.getModificationTime).toMap
    val first = dataMtimes
    assert(first.nonEmpty)

    // tier 1: same session → catalog hit, files untouched
    val again = Bucketing.ensureBucketed(orders, "eb_orders", "o_orderkey", 4, "fp-A")
    assert(again == name)
    assert(dataMtimes == first, "catalog-hit path must not rewrite data")

    // tier 2: catalog forgot the table (fresh-JVM analog) → fingerprint
    // marker re-registers the existing files metadata-only
    spark.sql(s"DROP TABLE `$name`") // in-memory catalog drop; external-style re-register follows
    val reReg = Bucketing.ensureBucketed(orders, "eb_orders", "o_orderkey", 4, "fp-A")
    assert(reReg == name)
    assert(dataMtimes == first, "marker-match path must not rewrite data")
    assert(spark.table(name).count() == orders.count())

    // a different fingerprint is a different dataset → separate table
    val other = Bucketing.ensureBucketed(orders, "eb_orders", "o_orderkey", 4, "fp-B")
    assert(other != name)
  }

  test("tier-2 re-registered tables still join without an Exchange (ADVICE r10)") {
    import org.apache.spark.sql.functions.col
    val orders = Tables.load(spark, sf("sf0.001"), "orders")
    val lineitem = Tables.load(spark, sf("sf0.001"), "lineitem")
    val tO = Bucketing.ensureBucketed(orders.select(col("o_orderkey"),
      col("o_orderpriority")), "eb2_orders", "o_orderkey", 4, "fp-X")
    val tL = Bucketing.ensureBucketed(lineitem.select(col("l_orderkey"),
      col("l_extendedprice")), "eb2_lineitem", "l_orderkey", 4, "fp-X")
    def mtimes(t: String): Map[String, Long] = {
      val p = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.getPath.getName.startsWith("part-"))
        .map(s => s.getPath.getName -> s.getModificationTime).toMap
    }
    val (mO, mL) = (mtimes(tO), mtimes(tL))
    // the catalog forgets (fresh-JVM analog: the in-memory catalog
    // starts empty while the warehouse dirs survive) ...
    spark.sql(s"DROP TABLE `$tO`")
    spark.sql(s"DROP TABLE `$tL`")
    // ... and the marker path re-registers BOTH sides metadata-only
    assert(Bucketing.ensureBucketed(orders.select(col("o_orderkey"),
      col("o_orderpriority")), "eb2_orders", "o_orderkey", 4, "fp-X") == tO)
    assert(Bucketing.ensureBucketed(lineitem.select(col("l_orderkey"),
      col("l_extendedprice")), "eb2_lineitem", "l_orderkey", 4, "fp-X") == tL)
    assert(mtimes(tO) == mO && mtimes(tL) == mL,
      "re-registration must not rewrite data files")
    // the q38 economics claim: the re-registered layout still carries
    // its bucketing metadata, so the join plans Exchange-free
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, tL, tO, "l_orderkey", "o_orderkey")
      assert(joined.count() == lineitem.count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
