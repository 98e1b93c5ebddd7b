package graft

import graft.core.Tables

/** The engine's SQL surface: fixture tables registered as views, queries
  * expressed in `spark.sql`, results identical to the DataFrame forms —
  * the two front-ends share one Catalyst plan space. */
class SqlSurfaceSpec extends SparkSpec {

  private def registerViews(): Unit =
    Tables.names.foreach { n =>
      Tables.load(spark, sf("sf0.001"), n).createOrReplaceTempView(n)
    }

  test("SQL and DataFrame front-ends produce identical results") {
    registerViews()
    val viaSql = spark.sql(
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin).collect()
    val viaDf = SparkEntry.queries("q2_join_agg")(spark, sf("sf0.001"))
      .selectExpr("c_mktsegment", "revenue", "n_orders").collect()
    assert(viaSql.toSeq == viaDf.toSeq)
  }

  test("anti-join and except declared queries are non-vacuous") {
    // Regression pin: these two oracles used to hash-match on 0 rows
    // (every customer has an order), verifying nothing. The restricted
    // forms must keep returning real rows.
    val anti = SparkEntry.queries("q4_anti_join")(spark, sf("sf0.001"))
    assert(anti.count() > 100)
    val except = SparkEntry.queries("q9_except")(spark, sf("sf0.001"))
    assert(except.count() > 10)
  }

  test("window + grouping-set SQL works over the views") {
    registerViews()
    val top = spark.sql(
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) rn
        |  FROM orders) WHERE rn = 1 ORDER BY o_custkey LIMIT 5""".stripMargin)
    assert(top.count() == 5)
    val gs = spark.sql(
      "SELECT o_orderstatus, COUNT(*) FROM orders GROUP BY ROLLUP(o_orderstatus)")
    assert(gs.count() >= 2)
  }

  test("injected native functions are SQL-callable (go_quote, zorder16)") {
    import spark.implicits._
    // zorder16 from SQL equals the Column-API composition
    val viaSql = spark.sql("SELECT zorder16(3, 3) AS z").as[Long].head()
    assert(viaSql == 15L)
    val viaCol = Seq((65535L, 0L)).toDF("x", "y")
      .select(graft.operators.Layout.zvalue16($"x", $"y")).as[Long].head()
    val viaSql2 = spark.sql("SELECT zorder16(65535, 0) AS z").as[Long].head()
    assert(viaSql2 == viaCol)
    // and it stays codegen arithmetic, not a UDF
    val plan = spark.sql("SELECT zorder16(13, 7) AS z")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
    // hilbert16: SQL form equals the kernel, and stays a native
    // expression (codegen'd HilbertExpr, no UDF dispatch)
    val hSql = spark.sql("SELECT hilbert16(65535, 65535) AS h").as[Long].head()
    assert(hSql == graft.functions.Hilbert.d16(65535L, 65535L))
    val hPlan = spark.sql("SELECT hilbert16(13, 7) AS h")
      .queryExecution.executedPlan.toString
    assert(!hPlan.contains("BatchEvalPython") && !hPlan.contains("ScalaUDF"), hPlan)
  }

  test("wrong arity raises a clean analysis error, not IndexOutOfBounds") {
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT zorder16(1)").collect()
    }
    assert(e1.getMessage.contains("zorder16"), e1.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT go_quote('a', 'b')").collect()
    }
    assert(e2.getMessage.contains("go_quote"), e2.getMessage)
  }
}
