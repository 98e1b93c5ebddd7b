package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.core.{Num, Tables}

/** Relational query library — SURVEY.md §2B Q1–Q11.
  *
  * Every query is declarative DataFrame API so Catalyst owns pushdown,
  * pruning, join selection and whole-stage codegen. Scale notes inline:
  * anything that would not survive a 1000-executor / 100 TB run is called
  * out with the mitigation used.
  */
object Relational {
  import Num._

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  // ---------------------------------------------------------------- Q1
  /** Pricing summary (TPC-H Q1 shape): scan → pushed filter → 2-phase
    * hash aggregate on a low-cardinality key → tiny sort. The group-by key
    * space is ~6 rows, so the shuffle after partial aggregation is
    * negligible at any scale.
    */
  private def q1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02 00:00:00").cast(TimestampType))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("sum_disc_price"),
        dsum(($"l_extendedprice" * (lit(1) - $"l_discount")) * (lit(1) + $"l_tax")).as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val q1Sql =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlSum("l_quantity")} AS sum_qty,
       |  ${sqlSum("l_extendedprice")} AS sum_base_price,
       |  ${sqlSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
       |  ${sqlSum("(l_extendedprice * (1 - l_discount)) * (1 + l_tax)")} AS sum_charge,
       |  ${sqlAvg("l_quantity")} AS avg_qty,
       |  ${sqlAvg("l_extendedprice")} AS avg_price,
       |  ${sqlAvg("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- Q2
  /** orders ⋈ customer revenue per market segment. customer is the small
    * side (1:10 vs orders) — broadcast it so the big side never shuffles.
    * At 100 TB customer may exceed the broadcast threshold; AQE would then
    * fall back to a shuffled hash join on the equi key, which is the right
    * plan there too.
    */
  private def q2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = t(spark, dir, "orders")
    val cust = t(spark, dir, "customer").select($"c_custkey", $"c_mktsegment")
    orders.join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(
        dsum($"o_totalprice").as("revenue"),
        count(lit(1)).as("n_orders"),
        davg($"o_totalprice").as("avg_price"))
      .orderBy($"c_mktsegment")
  }

  private val q2Sql =
    s"""SELECT c_mktsegment,
       |  ${sqlSum("o_totalprice")} AS revenue,
       |  COUNT(*) AS n_orders,
       |  ${sqlAvg("o_totalprice")} AS avg_price
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- Q3
  /** Five-table chain. Dimension tables (nation, region) are broadcast —
    * they are bounded-size at any scale factor. lineitem⋈orders is the one
    * genuine shuffle; Catalyst/AQE pick its strategy.
    */
  private def q3(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = t(spark, dir, "lineitem").select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val orders = t(spark, dir, "orders").select($"o_orderkey", $"o_custkey")
    val cust = t(spark, dir, "customer").select($"c_custkey", $"c_nationkey")
    val nation = t(spark, dir, "nation")
    val region = t(spark, dir, "region")
    li.join(orders, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"r_name", $"n_name")
  }

  private val q3Sql =
    s"""SELECT r_name, n_name,
       |  ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue,
       |  COUNT(*) AS n_lines
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation   ON c_nationkey = n_nationkey
       |JOIN region   ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name
       |ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- Q4
  /** Left-semi (EXISTS) and left-anti (NOT EXISTS). The probe side streams;
    * only the distinct keys of orders travel — Spark plans a broadcast or
    * shuffled semi join without materializing the join product.
    */
  private def q4Semi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = t(spark, dir, "customer")
    val orders = t(spark, dir, "orders").select($"o_custkey")
    cust.join(orders, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  private val q4SemiSql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Anti-join against a restricted orders slice (one month) so the result
    * is non-empty: "customers with no order in January 1995". An anti-join
    * against all orders is vacuously empty on this data — every customer
    * has at least one order — which would leave the operator verified only
    * by agreeing on zero rows.
    */
  private def q4Anti(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = t(spark, dir, "customer")
    val orders = t(spark, dir, "orders")
      .filter($"o_orderdate" >= lit("1995-01-01 00:00:00").cast(TimestampType) &&
        $"o_orderdate" < lit("1995-02-01 00:00:00").cast(TimestampType))
      .select($"o_custkey")
    cust.join(orders, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_acctbal")
      .orderBy($"c_custkey")
  }

  private val q4AntiSql =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1995-02-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin

  /** Left outer join + aggregation: every customer, order count and
    * revenue including the zero-order ones (null-group handling). */
  private def q4Left(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = t(spark, dir, "customer").select($"c_custkey", $"c_mktsegment")
    val orders = t(spark, dir, "orders").select($"o_custkey", $"o_totalprice")
    cust.join(orders, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey", $"c_mktsegment")
      .agg(
        count($"o_custkey").as("n_orders"),
        coalesce(dsum($"o_totalprice"), lit(0.0)).as("revenue"))
      .orderBy($"c_custkey")
  }

  private val q4LeftSql =
    s"""SELECT c_custkey, c_mktsegment,
       |  COUNT(o_custkey) AS n_orders,
       |  COALESCE(${sqlSum("o_totalprice")}, 0.0) AS revenue
       |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       |GROUP BY c_custkey, c_mktsegment
       |ORDER BY c_custkey""".stripMargin

  /** Full outer join of two keyed aggregates with presence indicators. */
  private def q4Full(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rich = t(spark, dir, "customer").filter($"c_acctbal" > 9000)
      .select($"c_custkey".as("k"), $"c_acctbal")
    val big = t(spark, dir, "orders").filter($"o_totalprice" > 450000)
      .groupBy($"o_custkey".as("k2")).agg(count(lit(1)).as("n_big"))
    rich.join(big, $"k" === $"k2", "full")
      .select(
        coalesce($"k", $"k2").as("custkey"),
        $"k".isNotNull.as("is_rich"),
        $"k2".isNotNull.as("has_big_order"),
        coalesce($"n_big", lit(0L)).as("n_big"))
      .orderBy($"custkey")
  }

  private val q4FullSql =
    """SELECT COALESCE(k, k2) AS custkey,
      |  k IS NOT NULL AS is_rich,
      |  k2 IS NOT NULL AS has_big_order,
      |  COALESCE(n_big, 0) AS n_big
      |FROM (SELECT c_custkey AS k, c_acctbal FROM customer WHERE c_acctbal > 9000) r
      |FULL OUTER JOIN (SELECT o_custkey AS k2, COUNT(*) AS n_big
      |                 FROM orders WHERE o_totalprice > 450000 GROUP BY o_custkey) b
      |  ON k = k2
      |ORDER BY custkey""".stripMargin

  /** Deliberate cross join of two bounded dimensions (the only place a
    * cartesian product is acceptable at scale: both sides tiny). */
  private def q4Cross(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "region").crossJoin(t(spark, dir, "nation"))
      .select($"r_name", $"n_name")
      .orderBy($"r_name", $"n_name")
  }

  private val q4CrossSql =
    """SELECT r_name, n_name FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- Q5
  /** Theta (band range) self-join: same-brand parts priced within ±0.5%.
    *
    * A naive non-equi self-join is a nested-loop cross product — O(n²) and
    * fatal at scale. Instead we join on an equi key (brand, price band)
    * where band width ≥ the range window, so any qualifying pair differs by
    * at most one band; the right side is expanded to its band and the band
    * above, and the exact range predicate filters after the hash join.
    * This turns the range join into a shuffle hash join with ~2× fanout —
    * the standard banded range-join trick, linear at 100 TB.
    */
  private def q5(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = t(spark, dir, "part").select($"p_partkey", $"p_brand", $"p_retailprice")
    // Band width is DERIVED from the data — ceil(max(price) * 0.005), the
    // widest possible ±0.5% window — so qualifying pairs always differ by
    // at most one band whatever the price domain (a hard-coded width
    // silently drops pairs once prices outgrow it). The 1-row aggregate
    // rides a 1-row IdentityBroadcastMode cross join (a broadcast scalar
    // — NOT a data×data nested loop); floor-of-1 guards an all-zero
    // domain.
    val bw = p.agg(greatest(lit(1.0),
      ceil(max($"p_retailprice") * 0.005).cast(DoubleType)).as("bw"))
    val pb = p.crossJoin(broadcast(bw))
    val left = pb.select(
      $"p_partkey".as("pk1"), $"p_brand".as("brand"), $"p_retailprice".as("price1"),
      floor($"p_retailprice" / $"bw").as("band"))
    val right = pb.select(
        $"p_partkey".as("pk2"), $"p_brand".as("brand"), $"p_retailprice".as("price2"),
        explode(array(floor($"p_retailprice" / $"bw"),
                      floor($"p_retailprice" / $"bw") + 1,
                      floor($"p_retailprice" / $"bw") - 1)).as("band"))
    // no distinct needed: the left side carries exactly one band value,
    // so each (pk1, pk2) pair joins through at most one of the right's
    // three candidate bands
    left.join(right, Seq("brand", "band"))
      .filter($"pk1" < $"pk2" &&
        $"price1" >= $"price2" * 0.995 && $"price1" <= $"price2" * 1.005)
      .select($"pk1", $"pk2", $"brand", $"price1", $"price2")
      .orderBy($"pk1", $"pk2")
  }

  private val q5Sql =
    """SELECT p1.p_partkey AS pk1, p2.p_partkey AS pk2, p1.p_brand AS brand,
      |       p1.p_retailprice AS price1, p2.p_retailprice AS price2
      |FROM part p1 JOIN part p2
      |  ON p1.p_brand = p2.p_brand
      | AND p1.p_partkey < p2.p_partkey
      | AND p1.p_retailprice >= p2.p_retailprice * 0.995
      | AND p1.p_retailprice <= p2.p_retailprice * 1.005
      |ORDER BY pk1, pk2""".stripMargin

  // ---------------------------------------------------------------- Q6
  /** ROLLUP / CUBE grouping sets + COUNT(DISTINCT). Distinct aggregation
    * over grouping sets expands the input once per set — fine for a
    * 2-column rollup; at extreme scale prefer approx_count_distinct (X4).
    */
  private def q6Rollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .rollup($"o_orderpriority", $"o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        countDistinct($"o_custkey").as("n_cust"),
        dsum($"o_totalprice").as("revenue"),
        grouping($"o_orderpriority").cast(IntegerType).as("gp"),
        grouping($"o_orderstatus").cast(IntegerType).as("gs"))
      .orderBy($"gp", $"gs", $"o_orderpriority".asc_nulls_first, $"o_orderstatus".asc_nulls_first)
  }

  private val q6RollupSql =
    s"""SELECT o_orderpriority, o_orderstatus,
       |  COUNT(*) AS n,
       |  COUNT(DISTINCT o_custkey) AS n_cust,
       |  ${sqlSum("o_totalprice")} AS revenue,
       |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS gp,
       |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS gs
       |FROM orders
       |GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
       |ORDER BY gp, gs, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  private def q6Cube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .cube($"o_orderpriority", $"o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        dsum($"o_totalprice").as("revenue"),
        grouping($"o_orderpriority").cast(IntegerType).as("gp"),
        grouping($"o_orderstatus").cast(IntegerType).as("gs"))
      .orderBy($"gp", $"gs", $"o_orderpriority".asc_nulls_first, $"o_orderstatus".asc_nulls_first)
  }

  private val q6CubeSql =
    s"""SELECT o_orderpriority, o_orderstatus,
       |  COUNT(*) AS n,
       |  ${sqlSum("o_totalprice")} AS revenue,
       |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS gp,
       |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS gs
       |FROM orders
       |GROUP BY CUBE(o_orderpriority, o_orderstatus)
       |ORDER BY gp, gs, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  /** Statistical aggregates: sample stddev/variance and exact
    * interpolated median. Variance is computed from exact decimal-routed
    * sum / sum-of-squares / count — the same formula, on the same exact
    * inputs, in both engines — so the doubles are bit-identical (native
    * stddev_samp/var_samp are summation-order-dependent partial
    * aggregates that can flake on a 4 dp rounding boundary). */
  private def q6Stats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = (($"ss" - $"s" * $"s" / $"n") / ($"n" - 1)).as("var_qty")
    t(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        dsum($"l_quantity").as("s"),
        dsum($"l_quantity" * $"l_quantity").as("ss"),
        count($"l_quantity").as("n"),
        expr("percentile(l_quantity, 0.5)").as("med_qty"),
        min($"l_quantity").as("min_qty"),
        max($"l_quantity").as("max_qty"))
      .select($"l_returnflag",
        sqrt(($"ss" - $"s" * $"s" / $"n") / ($"n" - 1)).as("sd_qty"),
        v, $"med_qty", $"min_qty", $"max_qty")
      .orderBy($"l_returnflag")
  }

  private val q6StatsSql =
    s"""SELECT l_returnflag,
      |  sqrt((ss - s*s/n)/(n-1)) AS sd_qty,
      |  (ss - s*s/n)/(n-1) AS var_qty,
      |  med_qty, min_qty, max_qty
      |FROM (SELECT l_returnflag,
      |  ${sqlSum("l_quantity")} AS s,
      |  ${sqlSum("l_quantity * l_quantity")} AS ss,
      |  COUNT(l_quantity) AS n,
      |  quantile_cont(l_quantity, 0.5) AS med_qty,
      |  min(l_quantity) AS min_qty,
      |  max(l_quantity) AS max_qty
      |FROM lineitem
      |GROUP BY l_returnflag) t
      |ORDER BY l_returnflag""".stripMargin

  /** Wide→long reshaping: the native `unpivot`/`melt` operator (the
    * inverse of q6_pivot). Three per-flag decimal-exact sums melt into
    * (l_returnflag, measure, value) rows — map-only on top of the
    * aggregate, no extra shuffle (Catalyst plans `Expand`, same node
    * family as rollup). Oracle is the portable UNION ALL formulation. */
  private def q6Unpivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        dsum($"l_quantity").as("s_qty"),
        dsum($"l_extendedprice").as("s_base"),
        dsum($"l_discount").as("s_disc"))
      .unpivot(
        ids = Array($"l_returnflag"),
        values = Array($"s_qty", $"s_base", $"s_disc"),
        variableColumnName = "measure",
        valueColumnName = "value")
      .orderBy($"l_returnflag", $"measure")
  }

  private val q6UnpivotSql =
    s"""WITH a AS (
       |  SELECT l_returnflag,
       |    ${sqlSum("l_quantity")} AS s_qty,
       |    ${sqlSum("l_extendedprice")} AS s_base,
       |    ${sqlSum("l_discount")} AS s_disc
       |  FROM lineitem GROUP BY l_returnflag)
       |SELECT l_returnflag, measure, value FROM (
       |  SELECT l_returnflag, 's_qty' AS measure, s_qty AS value FROM a
       |  UNION ALL SELECT l_returnflag, 's_base', s_base FROM a
       |  UNION ALL SELECT l_returnflag, 's_disc', s_disc FROM a) u
       |ORDER BY l_returnflag, measure""".stripMargin

  // ---------------------------------------------------------------- Q7
  /** Window functions. Partitioned by customer — parallel across the key
    * space, one shuffle on the partition key; no global sort until the
    * final (bounded) output ORDER BY. Ties broken by o_orderkey so ranking
    * is total and reproducible.
    */
  private def q7Top3(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
      .orderBy($"o_custkey", $"rn")
  }

  private val q7Top3Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) s
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** Running revenue per customer (frame: unbounded preceding → current).
    * The running sum is over exact decimals so every prefix is
    * order-independent-exact, then cast to double for the oracle.
    */
  private def q7Running(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "orders")
      .withColumn("running_rev",
        sum($"o_totalprice".cast(DataTypes.createDecimalType(28, 10))).over(w).cast(DoubleType))
      .select($"o_custkey", $"o_orderkey", $"running_rev")
      .orderBy($"o_custkey", $"o_orderkey")
  }

  private val q7RunningSql =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** lag/lead analytics: days since the customer's previous order. */
  private def q7Lag(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    t(spark, dir, "orders")
      .withColumn("prev_date", lag($"o_orderdate", 1).over(w))
      .withColumn("next_key", lead($"o_orderkey", 1).over(w))
      .withColumn("gap_days", datediff($"o_orderdate", $"prev_date"))
      .select($"o_custkey", $"o_orderkey", $"gap_days", $"next_key")
      .orderBy($"o_custkey", $"o_orderkey")
  }

  private val q7LagSql =
    """SELECT o_custkey, o_orderkey,
      |  CAST(date_diff('day',
      |    LAG(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |    o_orderdate) AS INTEGER) AS gap_days,
      |  LEAD(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_key
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Ranking-function battery: rank/dense_rank/ntile/percent_rank/
    * cume_dist plus first/last_value over an explicit frame. */
  private def q7Ranks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice".desc, $"o_orderkey")
    val frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(spark, dir, "orders")
      .filter($"o_totalprice" > 400000) // keep ranked sets small but multi-row
      .select(
        $"o_orderpriority", $"o_orderkey",
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        // unrounded: k/(n-1) rationals hit half-way decimals where the two
        // engines' round() diverge; raw doubles are bit-identical and the
        // compare layer rounds both sides with one implementation
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"),
        first($"o_orderkey").over(frame).as("top_key"),
        last($"o_orderkey").over(frame).as("bottom_key"))
      .orderBy($"o_orderpriority", $"rnk", $"o_orderkey")
  }

  private val q7RanksSql =
    """SELECT o_orderpriority, o_orderkey,
      |  RANK() OVER w AS rnk,
      |  DENSE_RANK() OVER w AS drnk,
      |  NTILE(4) OVER w AS quartile,
      |  PERCENT_RANK() OVER w AS prank,
      |  CUME_DIST() OVER w AS cdist,
      |  FIRST_VALUE(o_orderkey) OVER wf AS top_key,
      |  LAST_VALUE(o_orderkey) OVER wf AS bottom_key
      |FROM orders
      |WHERE o_totalprice > 400000
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey),
      |  wf AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin

  /** RANGE frame over a numeric ordering: 30-day trailing revenue per
    * customer (value-based window, not row-based). */
  private def q7RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val days30 = 30L * 86400
    val w = Window.partitionBy($"o_custkey").orderBy($"t")
      .rangeBetween(-days30, 0)
    t(spark, dir, "orders")
      .withColumn("t", unix_timestamp($"o_orderdate"))
      .withColumn("rev30",
        sum($"o_totalprice".cast(DataTypes.createDecimalType(28, 10))).over(w).cast(DoubleType))
      .select($"o_custkey", $"o_orderkey", $"rev30")
      .orderBy($"o_custkey", $"o_orderkey")
  }

  private val q7RangeFrameSql =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) OVER (
      |    PARTITION BY o_custkey ORDER BY EPOCH(o_orderdate)
      |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev30
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Pivot: revenue matrix orderstatus × orderpriority with an explicit
    * value list (deterministic output columns). */
  private def q6Pivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .groupBy($"o_orderstatus")
      .pivot("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(dsum($"o_totalprice"))
      .select($"o_orderstatus",
        coalesce($"1-URGENT", lit(0.0)).as("p1"),
        coalesce($"2-HIGH", lit(0.0)).as("p2"),
        coalesce($"3-MEDIUM", lit(0.0)).as("p3"),
        coalesce($"4-NOT SPECIFIED", lit(0.0)).as("p4"),
        coalesce($"5-LOW", lit(0.0)).as("p5"))
      .orderBy($"o_orderstatus")
  }

  private val q6PivotSql = {
    def cell(p: String) =
      s"COALESCE(CAST(SUM(CAST(CASE WHEN o_orderpriority = '$p' THEN o_totalprice END AS DECIMAL(28,10))) AS DOUBLE), 0.0)"
    s"""SELECT o_orderstatus,
       |  ${cell("1-URGENT")} AS p1,
       |  ${cell("2-HIGH")} AS p2,
       |  ${cell("3-MEDIUM")} AS p3,
       |  ${cell("4-NOT SPECIFIED")} AS p4,
       |  ${cell("5-LOW")} AS p5
       |FROM orders
       |GROUP BY o_orderstatus
       |ORDER BY o_orderstatus""".stripMargin
  }

  /** Generator/UDTF path: posexplode of a per-row array into rows. */
  private def q10Explode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "part")
      .filter($"p_partkey" <= 200)
      .select($"p_partkey", posexplode(split($"p_name", " ")).as(Seq("pos", "word")))
      .orderBy($"p_partkey", $"pos")
  }

  // DuckDB 1.0 has no WITH ORDINALITY; a correlated UNNEST over
  // range(len(words)) provides the position
  private val q10ExplodeSql =
    """SELECT p_partkey, CAST(u.i AS INTEGER) AS pos,
      |  words[CAST(u.i AS INTEGER) + 1] AS word
      |FROM (SELECT p_partkey, string_split(p_name, ' ') AS words
      |      FROM part WHERE p_partkey <= 200) t,
      |  UNNEST(range(len(words))) AS u(i)
      |ORDER BY p_partkey, pos""".stripMargin

  // ---------------------------------------------------------------- Q8
  /** Global top-k. orderBy().limit(k) plans TakeOrderedAndProject: each
    * partition keeps its local top-k and only k rows per partition reach
    * the driver — no global sort, safe at any scale.
    */
  private def q8(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber",
        ($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey", $"l_linenumber")
      .limit(10)
  }

  private val q8Sql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice * (1 - l_discount) AS revenue
      |FROM lineitem
      |ORDER BY revenue DESC, l_orderkey, l_linenumber
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- Q9
  /** Set operations. INTERSECT/EXCEPT are distinct-set semantics in both
    * engines; Spark plans them as (broadcast/shuffled) semi/anti joins on
    * the deduplicated sides.
    */
  private def q9Intersect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val buyers = t(spark, dir, "orders").select($"o_custkey".as("c_custkey"))
    val rich = t(spark, dir, "customer").filter($"c_acctbal" > 5000).select($"c_custkey")
    buyers.intersect(rich).orderBy($"c_custkey")
  }

  private val q9IntersectSql =
    """SELECT o_custkey AS c_custkey FROM orders
      |INTERSECT
      |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      |ORDER BY c_custkey""".stripMargin

  /** EXCEPT with a non-empty result: early buyers (pre-1996 orders) minus
    * high-balance customers. "all customers EXCEPT all buyers" is vacuously
    * empty on this data — both sides had to be restricted so the distinct
    * anti-set semantics are actually exercised (hundreds of surviving rows).
    */
  private def q9Except(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val early = t(spark, dir, "orders")
      .filter($"o_orderdate" < lit("1996-01-01 00:00:00").cast(TimestampType))
      .select($"o_custkey".as("c_custkey"))
    val rich = t(spark, dir, "customer").filter($"c_acctbal" > 3000).select($"c_custkey")
    early.except(rich).orderBy($"c_custkey")
  }

  private val q9ExceptSql =
    """SELECT o_custkey AS c_custkey FROM orders
      |WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      |EXCEPT
      |SELECT c_custkey FROM customer WHERE c_acctbal > 3000
      |ORDER BY c_custkey""".stripMargin

  private def q9Union(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rich = t(spark, dir, "customer").filter($"c_acctbal" > 7500).select($"c_custkey".as("k"))
    val big = t(spark, dir, "orders").filter($"o_totalprice" > 400000).select($"o_custkey".as("k"))
    rich.unionAll(big)
      .groupBy($"k").agg(count(lit(1)).as("n"))
      .orderBy($"k")
  }

  private val q9UnionSql =
    """SELECT k, COUNT(*) AS n FROM (
      |  SELECT c_custkey AS k FROM customer WHERE c_acctbal > 7500
      |  UNION ALL
      |  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000) u
      |GROUP BY k
      |ORDER BY k""".stripMargin

  // ---------------------------------------------------------------- Q10
  /** Scalar-function battery. Only cross-engine-exact functions appear in
    * hash-matched output (substr/upper/concat/regexp/length; floor/ceil/
    * abs/sqrt are IEEE-exact; ln/pow are libm-dependent and excluded).
    */
  private def q10String(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "part")
      .select(
        $"p_partkey",
        substring($"p_name", 1, 8).as("name8"),
        upper($"p_brand").as("brand_u"),
        concat($"p_brand", lit(":"), $"p_type").as("brand_type"),
        regexp_extract($"p_name", "([a-z]+)$", 1).as("last_word"),
        length($"p_name").as("name_len"),
        regexp_replace($"p_type", " ", "_").as("type_us"),
        trim(lower($"p_type")).as("type_l"))
      .orderBy($"p_partkey")
  }

  private val q10StringSql =
    """SELECT p_partkey,
      |  substr(p_name, 1, 8) AS name8,
      |  upper(p_brand) AS brand_u,
      |  p_brand || ':' || p_type AS brand_type,
      |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
      |  length(p_name) AS name_len,
      |  replace(p_type, ' ', '_') AS type_us,
      |  trim(lower(p_type)) AS type_l
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  private def q10Date(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .groupBy(
        date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("month"),
        year($"o_orderdate").as("yr"),
        month($"o_orderdate").as("mo"))
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("revenue"))
      .orderBy($"month")
  }

  private val q10DateSql =
    s"""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
       |  CAST(year(o_orderdate) AS INTEGER) AS yr,
       |  CAST(month(o_orderdate) AS INTEGER) AS mo,
       |  COUNT(*) AS n,
       |  ${sqlSum("o_totalprice")} AS revenue
       |FROM orders
       |GROUP BY 1, 2, 3
       |ORDER BY month""".stripMargin

  private def q10Math(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .filter($"l_linenumber" === 1)
      .select(
        $"l_orderkey",
        floor($"l_extendedprice").cast(LongType).as("price_floor"),
        ceil($"l_extendedprice").cast(LongType).as("price_ceil"),
        abs($"l_discount" - 0.05).as("disc_dev"),
        sqrt($"l_quantity").as("qty_sqrt"),
        ($"l_quantity" % 7).as("qty_mod7"),
        (-$"l_tax").as("neg_tax"))
      .orderBy($"l_orderkey")
  }

  private val q10MathSql =
    """SELECT l_orderkey,
      |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
      |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
      |  abs(l_discount - 0.05) AS disc_dev,
      |  sqrt(l_quantity) AS qty_sqrt,
      |  fmod(l_quantity, 7) AS qty_mod7,
      |  -l_tax AS neg_tax
      |FROM lineitem
      |WHERE l_linenumber = 1
      |ORDER BY l_orderkey""".stripMargin

  /** Array higher-order functions: construction, sort, element access,
    * transform/filter lambdas, left-fold aggregate — all codegen'd
    * collection expressions, no UDFs. */
  private def q10Array(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .filter($"l_linenumber" === 1)
      .withColumn("arr", array($"l_quantity", $"l_discount", $"l_tax"))
      .select(
        $"l_orderkey",
        size($"arr").as("n"),
        element_at(sort_array($"arr"), 1).as("lo"),
        element_at(sort_array($"arr"), -1).as("hi"),
        aggregate($"arr", lit(0.0), (acc, x) => acc + x).as("tot"),
        size(filter($"arr", x => x > 0.1)).as("n_big"),
        aggregate(transform($"arr", x => x * 2), lit(0.0), (acc, x) => acc + x).as("tot2"),
        array_contains($"arr", 0.0).as("has_zero"))
      .orderBy($"l_orderkey")
  }

  private val q10ArraySql =
    """SELECT l_orderkey,
      |  CAST(len(arr) AS INTEGER) AS n,
      |  list_sort(arr)[1] AS lo,
      |  list_sort(arr)[-1] AS hi,
      |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), arr), (acc, x) -> acc + x) AS tot,
      |  CAST(len(list_filter(arr, x -> x > 0.1)) AS INTEGER) AS n_big,
      |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(arr, x -> x * 2)), (acc, x) -> acc + x) AS tot2,
      |  list_contains(arr, 0.0) AS has_zero
      |FROM (SELECT l_orderkey, [l_quantity, l_discount, l_tax] AS arr
      |      FROM lineitem WHERE l_linenumber = 1) t
      |ORDER BY l_orderkey""".stripMargin

  /** Map functions: construction from columns, key/value extraction. */
  private def q10Map(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "part")
      .withColumn("m", map(lit("brand"), $"p_brand", lit("type"), $"p_type"))
      .select(
        $"p_partkey",
        size($"m").as("n_keys"),
        concat_ws(",", sort_array(map_keys($"m"))).as("keys"),
        element_at($"m", "brand").as("brand_v"),
        element_at($"m", "type").as("type_v"),
        concat_ws("|", map_values($"m")).as("vals"))
      .orderBy($"p_partkey")
  }

  private val q10MapSql =
    """SELECT p_partkey,
      |  CAST(cardinality(m) AS INTEGER) AS n_keys,
      |  array_to_string(list_sort(map_keys(m)), ',') AS keys,
      |  m['brand'][1] AS brand_v,
      |  m['type'][1] AS type_v,
      |  array_to_string(map_values(m), '|') AS vals
      |FROM (SELECT p_partkey, MAP {'brand': p_brand, 'type': p_type} AS m
      |      FROM part) t
      |ORDER BY p_partkey""".stripMargin

  /** Predicate battery: IN, BETWEEN, LIKE, null-safe equality. */
  private def q10Pred(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "part")
      .withColumn("maybe_brand", when($"p_size" % 2 === 0, $"p_brand"))
      .select(
        $"p_partkey",
        $"p_brand".isin("Brand#1", "Brand#2", "Brand#3").as("in_brands"),
        $"p_size".between(10, 20).as("mid_size"),
        $"p_name".like("%ring%").as("has_ring"),
        ($"maybe_brand" <=> $"p_brand").as("nsafe_eq"),
        $"maybe_brand".isNull.as("was_nulled"))
      .filter($"p_size".between(1, 40))
      .orderBy($"p_partkey")
  }

  private val q10PredSql =
    """SELECT p_partkey,
      |  p_brand IN ('Brand#1', 'Brand#2', 'Brand#3') AS in_brands,
      |  p_size BETWEEN 10 AND 20 AS mid_size,
      |  p_name LIKE '%ring%' AS has_ring,
      |  (CASE WHEN p_size % 2 = 0 THEN p_brand END) IS NOT DISTINCT FROM p_brand AS nsafe_eq,
      |  (CASE WHEN p_size % 2 = 0 THEN p_brand END) IS NULL AS was_nulled
      |FROM part
      |WHERE p_size BETWEEN 1 AND 40
      |ORDER BY p_partkey""".stripMargin

  /** Error-safe scalar battery: `try_cast` / `try_divide` /
    * `try_element_at` return null instead of failing — the semantics a
    * 100 TB ingest needs (one malformed row must not kill a stage).
    * DuckDB mirrors: TRY_CAST; division is null-on-zero natively; list
    * indexing is null-out-of-bounds natively. */
  private def q10Try(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "part")
      .select(
        $"p_partkey",
        expr("try_cast(p_name AS INT)").as("bad_cast"),
        expr("try_cast(cast(p_size AS STRING) AS INT)").as("good_cast"),
        expr("try_divide(p_retailprice, p_size - p_size)").as("div0"),
        expr("try_divide(p_retailprice, 4)").as("quarter"),
        expr("try_element_at(split(p_name, ' '), 99)").as("oob"),
        expr("try_element_at(split(p_name, ' '), 1)").as("first_word"))
      .orderBy($"p_partkey")
  }

  private val q10TrySql =
    """SELECT p_partkey,
      |  TRY_CAST(p_name AS INTEGER) AS bad_cast,
      |  TRY_CAST(CAST(p_size AS VARCHAR) AS INTEGER) AS good_cast,
      |  p_retailprice / (p_size - p_size) AS div0,
      |  p_retailprice / 4 AS quarter,
      |  (string_split(p_name, ' '))[99] AS oob,
      |  (string_split(p_name, ' '))[1] AS first_word
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  private def q10Json(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "events")
      .withColumn("k", get_json_object($"props", "$.k").cast(IntegerType))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum($"k").as("sum_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  private val q10JsonSql =
    """SELECT event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
      |  MIN(CAST(props->>'$.k' AS INTEGER)) AS min_k,
      |  MAX(CAST(props->>'$.k' AS INTEGER)) AS max_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- Q11
  /** events batch analytics: count/sum per event_type per 10-minute
    * tumbling bucket. Bucket is emitted as epoch seconds (BIGINT) — raw
    * timestamps never appear in verified output (tz-encoding differs
    * between Spark parquet and the DuckDB oracle).
    */
  private def q11(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "events")
      .withColumn("bucket", (floor(unix_timestamp($"ts") / 600) * 600).cast(LongType))
      .groupBy($"event_type", $"bucket")
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
      .orderBy($"event_type", $"bucket")
  }

  private val q11Sql =
    s"""SELECT event_type,
       |  CAST(FLOOR(EPOCH(ts) / 600) * 600 AS BIGINT) AS bucket,
       |  COUNT(*) AS n,
       |  ${sqlSum("value")} AS sum_value
       |FROM events
       |GROUP BY event_type, bucket
       |ORDER BY event_type, bucket""".stripMargin

  /** Dense time-series reconstruction (gap filling): every (event_type,
    * 10-min bucket) slot over the observed span, zero-filled where no
    * events landed — the step before any windowed model consumes the
    * series. The dense axis is `sequence` + explode over a ONE-ROW
    * bounds aggregate cross-joined with the distinct types (both sides
    * broadcast scalars/tiny), left-joined to the actual bucket counts —
    * the grid is generated distributed, never collected. */
  private def q11GapFill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = t(spark, dir, "events")
      .withColumn("bucket", (floor(unix_timestamp($"ts") / 600) * 600).cast(LongType))
    val bounds = ev.agg(min($"bucket").as("lo"), max($"bucket").as("hi"))
    val grid = ev.select($"event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select($"event_type",
        explode(sequence($"lo", $"hi", lit(600L))).as("bucket"))
    val counts = ev.groupBy($"event_type", $"bucket").agg(count(lit(1)).as("n"))
    grid.join(counts, Seq("event_type", "bucket"), "left")
      .select($"event_type", $"bucket",
        coalesce($"n", lit(0L)).as("n"),
        $"n".isNull.as("filled"))
      .orderBy($"event_type", $"bucket")
  }

  private val q11GapFillSql =
    """WITH ev AS (
      |  SELECT event_type, CAST(FLOOR(EPOCH(ts) / 600) * 600 AS BIGINT) AS bucket
      |  FROM events),
      |b AS (SELECT MIN(bucket) AS lo, MAX(bucket) AS hi FROM ev),
      |grid AS (
      |  SELECT t.event_type, g.bucket
      |  FROM (SELECT DISTINCT event_type FROM ev) t
      |  CROSS JOIN (SELECT unnest(range(lo, hi + 600, 600)) AS bucket FROM b) g),
      |c AS (SELECT event_type, bucket, COUNT(*) AS n FROM ev GROUP BY 1, 2)
      |SELECT grid.event_type, grid.bucket,
      |  COALESCE(c.n, 0) AS n, c.n IS NULL AS filled
      |FROM grid LEFT JOIN c USING (event_type, bucket)
      |ORDER BY event_type, bucket""".stripMargin

  // --------------------------------------------------------------- Q14
  /** Correlated scalar subquery (TPC-H Q17 shape): line items whose
    * quantity is under 40% of their part's average. Catalyst
    * decorrelates the subquery into an aggregate + join
    * (RewriteCorrelatedScalarSubquery) — expressed via the SQL front-end,
    * which is part of the engine surface. */
  private def q14(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem").createOrReplaceTempView("v_lineitem")
    spark.sql(
      """SELECT l_orderkey, l_partkey, l_quantity
        |FROM v_lineitem l1
        |WHERE l_quantity < 0.4 * (
        |  SELECT AVG(l_quantity) FROM v_lineitem l2
        |  WHERE l2.l_partkey = l1.l_partkey)
        |ORDER BY l_orderkey, l_partkey, l_quantity""".stripMargin)
  }

  private val q14Sql =
    """SELECT l_orderkey, l_partkey, l_quantity
      |FROM lineitem l1
      |WHERE l_quantity < 0.4 * (
      |  SELECT AVG(l_quantity) FROM lineitem l2
      |  WHERE l2.l_partkey = l1.l_partkey)
      |ORDER BY l_orderkey, l_partkey, l_quantity""".stripMargin

  // --------------------------------------------------------------- Q15
  /** Top supplier by quarterly revenue (TPC-H Q15 shape): an aggregated
    * revenue "view" compared against its own max — the classic
    * CTE-plus-scalar-aggregate pattern. The 1-row max rides a broadcast
    * equality join (no re-aggregation, no window over the whole view);
    * revenue goes through the decimal-routed sum so the equality join
    * picks identical winners in both engines. */
  private def q15(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rev = t(spark, dir, "lineitem")
      .filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1996-04-01")
      .groupBy($"l_suppkey")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("total_revenue"))
    val mx = rev.agg(max($"total_revenue").as("mx"))
    rev.join(broadcast(mx), $"total_revenue" === $"mx")
      .join(t(spark, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"total_revenue")
      .orderBy($"s_suppkey")
  }

  private val q15Sql =
    s"""WITH rev AS (
       |  SELECT l_suppkey,
       |    ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_revenue
       |FROM rev JOIN supplier ON l_suppkey = s_suppkey
       |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
       |ORDER BY s_suppkey""".stripMargin

  // --------------------------------------------------------------- Q16
  /** Parts/supplier stats (TPC-H Q16 shape, adapted: the fixture has no
    * partsupp/s_comment, so lineitem is the part↔supplier relation and
    * the exclusion subquery is negative-balance suppliers). The NOT IN
    * becomes a left-anti join (s_suppkey is non-null, so the null-aware
    * variant degenerates to plain anti); the excluded-supplier side is
    * tiny → broadcast anti, part is dim-sized → broadcast inner, and the
    * only real shuffle is the final distinct aggregation — which Spark
    * runs as two-phase (partial per-(keys, suppkey) dedup before the
    * exchange), so the shuffle carries distinct combinations, not
    * lineitem rows. */
  private def q16(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val badSupp = t(spark, dir, "supplier")
      .filter($"s_acctbal" < 0).select($"s_suppkey")
    // two-level count (group × supplier partial-agg, then count) instead
    // of countDistinct: same dedup work, no input-duplicating Expand.
    // NO pre-distinct of the (part, supplier) pairs, though: this
    // fixture's pairs are near-unique (measured 600k lines → 591k
    // distinct pairs at sf0.1, a 1.5 % shrink), so a dedicated distinct
    // costs a full extra shuffle to save nothing — the r10 "pre-distinct"
    // rewrite's warm-JVM win did not replicate in driver-shaped runs
    // (2.09 → 2.20 s cold-min). On a pair-repeating distribution (real
    // TPC-H partsupp fan-out) the pre-distinct IS the right first move;
    // measure the shrink before paying the shuffle.
    val pairs = t(spark, dir, "lineitem")
      .select($"l_partkey", $"l_suppkey")
      .join(broadcast(badSupp), $"l_suppkey" === $"s_suppkey", "left_anti")
    t(spark, dir, "part")
      .filter($"p_brand" =!= "Brand#13" && $"p_type" =!= "PROMO")
      .join(pairs, $"p_partkey" === $"l_partkey")
      .groupBy($"p_brand", $"p_type", $"p_size", $"l_suppkey")
      .agg(count(lit(1)).as("_c"))
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(count(lit(1)).as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  private val q16Sql =
    """SELECT p_brand, p_type, p_size,
      |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM part JOIN lineitem ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // --------------------------------------------------------------- Q18
  /** Large-volume customers (TPC-H Q18 shape): aggregate lineitem per
    * order, HAVING-filter to the big ones, then join orders + customer.
    * The HAVING side aggregates BEFORE joining — the join input shrinks
    * from all lineitem to the qualifying orders — and the customer/orders
    * probes ride hash joins on the already-aggregated key. At 100 TB the
    * one full shuffle is the per-orderkey aggregation (unavoidable and
    * map-side partial); everything after is proportional to qualifiers. */
  private def q18(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val big = t(spark, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(dsum($"l_quantity").as("sum_qty"))
      .filter($"sum_qty" > 180)
    t(spark, dir, "orders")
      .join(big, $"o_orderkey" === $"l_orderkey")
      .join(t(spark, dir, "customer"), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"o_orderkey", $"o_orderdate",
        $"o_totalprice", $"sum_qty")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
  }

  private val q18Sql =
    s"""SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
       |FROM orders
       |JOIN (SELECT l_orderkey, ${sqlSum("l_quantity")} AS sum_qty
       |      FROM lineitem GROUP BY l_orderkey
       |      HAVING ${sqlSum("l_quantity")} > 180) big
       |  ON o_orderkey = l_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin

  // --------------------------------------------------------------- Q19
  /** Disjunctive join predicate (TPC-H Q19 shape): an OR of three
    * brand/size/quantity conjunction branches ON the join. The optimizer
    * exercise is predicate decomposition: Catalyst extracts the
    * single-side implications of the OR — part gets the brand/size
    * disjunction, lineitem the quantity-range disjunction — and pushes
    * BOTH into the parquet scans (visible as Or(...) in PushedFilters),
    * so each side is pre-filtered before the join evaluates the full
    * cross-column condition. At 100 TB that pre-filter is the difference
    * between scanning the table and scanning the qualifying slice. */
  private def q19(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val branch = ($"p_brand" === "Brand#12" && $"l_quantity".between(1, 11) && $"p_size".between(1, 5)) ||
      ($"p_brand" === "Brand#23" && $"l_quantity".between(10, 20) && $"p_size".between(1, 10)) ||
      ($"p_brand" === "Brand#34" && $"l_quantity".between(20, 30) && $"p_size".between(1, 15))
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "part"), $"l_partkey" === $"p_partkey" && branch)
      .agg(
        dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n"))
  }

  private val q19Sql =
    s"""SELECT ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue,
       |  COUNT(*) AS n
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       | AND ((p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
       |   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
       |   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15))""".stripMargin

  // --------------------------------------------------------------- Q22
  /** Dormant high-balance customers (TPC-H Q22 shape): balance above
    * the positive-balance average (scalar subquery → 1-row broadcast
    * attach, the q15 pattern) and no orders in a window (NOT IN → anti
    * join against a date-pruned orders slice). The anti side is filtered
    * BEFORE the join, so its build input is the window's orders only. */
  private def q22(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = t(spark, dir, "customer")
    val avgBal = cust.filter($"c_acctbal" > 0)
      .agg(davg($"c_acctbal").as("ab"))
    val recent = t(spark, dir, "orders")
      .filter($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1996-03-01")
      .select($"o_custkey")
    cust.join(broadcast(avgBal), $"c_acctbal" > $"ab")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("numcust"), dsum($"c_acctbal").as("totacctbal"))
      .orderBy($"c_mktsegment")
  }

  private val q22Sql =
    s"""SELECT c_mktsegment, COUNT(*) AS numcust,
       |  ${sqlSum("c_acctbal")} AS totacctbal
       |FROM customer
       |WHERE c_acctbal > (SELECT ${sqlAvg("c_acctbal")} FROM customer WHERE c_acctbal > 0)
       |  AND c_custkey NOT IN (
       |    SELECT o_custkey FROM orders
       |    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
       |      AND o_orderdate < TIMESTAMP '1996-03-01')
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin

  // --------------------------------------------------------------- Q17
  /** Small-quantity revenue (TPC-H Q17 shape, fixture columns): lineitems
    * of a brand/size part slice whose quantity sits below 20 % of that
    * PART's average quantity — the correlated-scalar-per-group shape.
    * Spark-first decorrelation is explicit: the per-part average is one
    * partial-aggregated groupBy over the lineitem slice of qualifying
    * parts, broadcast back onto the join (at 100 TB the agg output is
    * |parts in the slice| rows — broadcastable by construction), so the
    * fact table is scanned ONCE and never self-joined row-per-row. The
    * DuckDB oracle states the same query with the textbook correlated
    * subquery — two decorrelation strategies, one hash-matched answer. */
  private def q17(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parts = t(spark, dir, "part")
      .filter($"p_brand" === "Brand#23" && $"p_size" <= 15)
      .select($"p_partkey")
    val li = t(spark, dir, "lineitem")
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
    val perPart = li.groupBy($"l_partkey".as("avg_partkey"))
      .agg(davg($"l_quantity").as("avg_qty"))
    li.join(broadcast(perPart), $"l_partkey" === $"avg_partkey")
      .filter($"l_quantity" < lit(0.2) * $"avg_qty")
      .agg((dsum($"l_extendedprice") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n"))
  }

  private val q17Sql =
    s"""SELECT ${sqlSum("l_extendedprice")} / 7.0 AS avg_yearly, COUNT(*) AS n
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE p_brand = 'Brand#23' AND p_size <= 15
       |  AND l_quantity < (SELECT 0.2 * ${sqlAvg("l2.l_quantity")}
       |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  // --------------------------------------------------------------- Q20
  /** Qualifying shippers (TPC-H Q20 shape, fixture columns): suppliers
    * that shipped > 50 units of some 'b…'-named part inside a one-year
    * window — the NESTED SEMI-JOIN CHAIN shape (part slice → aggregated
    * lineitem HAVING → supplier IN). Each stage shrinks before the next
    * joins: the part filter prunes the lineitem scan via a broadcast
    * semi-join, the (suppkey, partkey) aggregation reduces to qualifying
    * groups, and supplier probes that set with another semi-join — no
    * stage ever materializes a fact-sized intermediate. */
  private def q20(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bParts = t(spark, dir, "part")
      .filter($"p_name".startsWith("b")).select($"p_partkey")
    val qualSupp = t(spark, dir, "lineitem")
      .filter($"l_shipdate" >= "1995-01-01" && $"l_shipdate" < "1996-01-01")
      .join(broadcast(bParts), $"l_partkey" === $"p_partkey", "left_semi")
      .groupBy($"l_suppkey", $"l_partkey")
      .agg(dsum($"l_quantity").as("sum_qty"))
      .filter($"sum_qty" > 50)
      .select($"l_suppkey")
    t(spark, dir, "supplier")
      .join(qualSupp, $"s_suppkey" === $"l_suppkey", "left_semi")
      .join(broadcast(t(spark, dir, "nation")), $"s_nationkey" === $"n_nationkey")
      .select($"s_name", $"n_name")
      .orderBy($"s_name")
  }

  private val q20Sql =
    s"""SELECT s_name, n_name
       |FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |WHERE s_suppkey IN (
       |  SELECT l_suppkey FROM lineitem
       |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'b%')
       |    AND l_shipdate >= TIMESTAMP '1995-01-01'
       |    AND l_shipdate < TIMESTAMP '1996-01-01'
       |  GROUP BY l_suppkey, l_partkey HAVING ${sqlSum("l_quantity")} > 50)
       |ORDER BY s_name""".stripMargin

  // --------------------------------------------------------------- Q21
  /** Suppliers who alone returned (TPC-H Q21 shape, fixture columns:
    * l_returnflag = 'R' stands in for receipt > commit): count, per
    * supplier, the 'F'-status order lineitems where THIS supplier
    * returned while (EXISTS) another supplier shared the order and
    * (NOT EXISTS) no other supplier also returned. The two correlated
    * EXISTS become one semi- and one anti- self-join of lineitem on
    * l_orderkey with the ≠-supplier condition riding the hash join —
    * never a cartesian. At fixture scale every side broadcasts; at
    * scale all three lineitem frames shuffle on the same key
    * (l_orderkey), and the two R-filtered frames are canonically
    * identical so their exchange is computed once and reused. */
  private def q21(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = t(spark, dir, "lineitem")
    val l1 = li.filter($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_suppkey")
    val others = li.select($"l_orderkey".as("o2_orderkey"), $"l_suppkey".as("o2_suppkey"))
    val othersR = li.filter($"l_returnflag" === "R")
      .select($"l_orderkey".as("o3_orderkey"), $"l_suppkey".as("o3_suppkey"))
    val fOrders = t(spark, dir, "orders")
      .filter($"o_orderstatus" === "F").select($"o_orderkey")
    l1
      .join(fOrders, $"l_orderkey" === $"o_orderkey", "left_semi")
      .join(others,
        $"l_orderkey" === $"o2_orderkey" && $"l_suppkey" =!= $"o2_suppkey", "left_semi")
      .join(othersR,
        $"l_orderkey" === $"o3_orderkey" && $"l_suppkey" =!= $"o3_suppkey", "left_anti")
      .join(t(spark, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
  }

  private val q21Sql =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name""".stripMargin

  // --------------------------------------------------------------- Q23
  /** Customer order-count distribution (TPC-H Q13 shape): LEFT OUTER
    * join with the filter ON THE JOIN (not WHERE — a WHERE would turn
    * the outer join inner and drop zero-order customers, the classic
    * Q13 trap), then a two-level aggregation: orders per customer, then
    * customers per order-count — a histogram whose second aggregate is
    * tiny (distinct counts), so only the first shuffle touches data. */
  private def q23(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perCust = t(spark, dir, "customer")
      .join(t(spark, dir, "orders").filter($"o_orderpriority" =!= "1-URGENT"),
        $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
    perCust.groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  private val q23Sql =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey) cc
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // --------------------------------------------------------------- Q24
  /** Bilateral shipping volume (TPC-H Q7 shape): revenue between two
    * named nations per direction per ship-year. The shape exercise is
    * the SAME dimension joined TWICE under different roles (supplier's
    * nation, customer's nation) with a disjunction over the pair.
    *
    * Join order is the point (r6 verdict "What's wrong" #1): each
    * nation slice joins its OWNER dimension FIRST, so supplier and
    * customer shrink to the two named nations (~2/25 of rows) BEFORE
    * any fact join — lineitem is pruned ~12.5× by its very first join
    * instead of carrying every nation through
    * supplier⋈orders⋈customer only to discard ~92 % at a top-level
    * pair filter. The residual filter keeps only the two cross
    * directions (the within-nation half of the remaining rows), the
    * one predicate that genuinely needs both sides. Same
    * prune-before-join discipline as q20/q25/q26; pinned in PlanSpec
    * (nation joins sit BELOW the orders/customer joins). */
  private def q24(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pair = Seq("NATION_12", "NATION_13")
    val n1 = t(spark, dir, "nation").filter($"n_name".isin(pair: _*))
      .select($"n_nationkey".as("n1_key"), $"n_name".as("supp_nation"))
    val n2 = t(spark, dir, "nation").filter($"n_name".isin(pair: _*))
      .select($"n_nationkey".as("n2_key"), $"n_name".as("cust_nation"))
    val supp = t(spark, dir, "supplier").join(broadcast(n1), $"s_nationkey" === $"n1_key")
      .select($"s_suppkey", $"supp_nation")
    val cust = t(spark, dir, "customer").join(broadcast(n2), $"c_nationkey" === $"n2_key")
      .select($"c_custkey", $"cust_nation")
    t(spark, dir, "lineitem")
      .join(supp, $"l_suppkey" === $"s_suppkey")
      .join(t(spark, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .filter(($"supp_nation" === "NATION_12" && $"cust_nation" === "NATION_13") ||
        ($"supp_nation" === "NATION_13" && $"cust_nation" === "NATION_12"))
      .select($"supp_nation", $"cust_nation",
        year($"l_shipdate").as("yr"),
        ($"l_extendedprice" * (lit(1) - $"l_discount")).as("volume"))
      .groupBy($"supp_nation", $"cust_nation", $"yr")
      .agg(dsum($"volume").as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"yr")
  }

  private val q24Sql =
    s"""SELECT supp_nation, cust_nation, yr, ${sqlSum("volume")} AS revenue
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |    CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS yr,
       |    l_extendedprice * (1 - l_discount) AS volume
       |  FROM lineitem
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |  WHERE (n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_13')
       |     OR (n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_12')) v
       |GROUP BY supp_nation, cust_nation, yr
       |ORDER BY supp_nation, cust_nation, yr""".stripMargin

  // --------------------------------------------------------------- Q25
  /** National market share (TPC-H Q8 shape): NATION_3 suppliers' slice
    * of ASIA customers' PROMO-part order volume per year — the
    * conditional-aggregate-over-a-7-table-join shape. The numerator is
    * a CASE inside the same decimal sum as the denominator (one pass,
    * no self-join), and every dimension (part slice, both nation roles,
    * region) broadcasts; only lineitem/orders/customer shuffle. */
  private def q25(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n1 = t(spark, dir, "nation").select($"n_nationkey".as("n1_key"), $"n_name".as("supp_nation"))
    val n2 = t(spark, dir, "nation").select($"n_nationkey".as("n2_key"), $"n_regionkey".as("n2_region"))
    val asia = t(spark, dir, "region").filter($"r_name" === "ASIA").select($"r_regionkey")
    val promoParts = t(spark, dir, "part").filter($"p_type" === "PROMO").select($"p_partkey")
    t(spark, dir, "lineitem")
      .join(broadcast(promoParts), $"l_partkey" === $"p_partkey", "left_semi")
      .join(t(spark, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .join(t(spark, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(t(spark, dir, "customer"), $"o_custkey" === $"c_custkey")
      .join(broadcast(n2), $"c_nationkey" === $"n2_key")
      .join(broadcast(asia), $"n2_region" === $"r_regionkey", "left_semi")
      .join(broadcast(n1), $"s_nationkey" === $"n1_key")
      .select(year($"o_orderdate").as("yr"),
        ($"l_extendedprice" * (lit(1) - $"l_discount")).as("volume"),
        $"supp_nation")
      .groupBy($"yr")
      .agg((dsum(when($"supp_nation" === "NATION_3", $"volume").otherwise(0.0)) /
        dsum($"volume")).as("mkt_share"))
      .orderBy($"yr")
  }

  private val q25Sql =
    s"""SELECT yr,
       |  ${sqlSum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END")} /
       |  ${sqlSum("volume")} AS mkt_share
       |FROM (
       |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
       |    l_extendedprice * (1 - l_discount) AS volume, n1.n_name AS supp_nation
       |  FROM part JOIN lineitem ON p_partkey = l_partkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |  JOIN region ON n2.n_regionkey = r_regionkey
       |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |  WHERE r_name = 'ASIA' AND p_type = 'PROMO') v
       |GROUP BY yr
       |ORDER BY yr""".stripMargin

  // --------------------------------------------------------------- Q26
  /** Product-type profit (TPC-H Q9 shape; `p_retailprice · 0.6` stands
    * in for ps_supplycost — the fixture has no partsupp): per supplier
    * nation per order-year profit on a part-name slice. The name filter
    * prunes part before anything joins (broadcast semi), the profit
    * expression is computed once per row, and the two-key aggregate is
    * partial before its shuffle. */
  private def q26(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val redParts = t(spark, dir, "part")
      .filter($"p_name".contains("red"))
      .select($"p_partkey", $"p_retailprice")
    t(spark, dir, "lineitem")
      .join(broadcast(redParts), $"l_partkey" === $"p_partkey")
      .join(t(spark, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .join(t(spark, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(t(spark, dir, "nation")), $"s_nationkey" === $"n_nationkey")
      .select($"n_name".as("nation"), year($"o_orderdate").as("yr"),
        ($"l_extendedprice" * (lit(1) - $"l_discount") -
          $"p_retailprice" * lit(0.6) * $"l_quantity").as("amount"))
      .groupBy($"nation", $"yr")
      .agg(dsum($"amount").as("sum_profit"))
      .orderBy($"nation", $"yr".desc)
  }

  private val q26Sql =
    s"""SELECT nation, yr, ${sqlSum("amount")} AS sum_profit
       |FROM (
       |  SELECT n_name AS nation, CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
       |    l_extendedprice * (1 - l_discount) - p_retailprice * 0.6 * l_quantity AS amount
       |  FROM part JOIN lineitem ON p_partkey = l_partkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  WHERE p_name LIKE '%red%') v
       |GROUP BY nation, yr
       |ORDER BY nation, yr DESC""".stripMargin

  // --------------------------------------------------------------- Q27
  /** Batch sessionization (gaps-and-islands): a session is a maximal
    * run of a user's events with ≤ 30 min between neighbors — the
    * windowed state machine every clickstream pipeline runs, expressed
    * as lag → boundary flag → running sum of boundaries → session id,
    * then per-session aggregates. Both window passes share ONE
    * partitioning (user_id ordered by ts, event_id — the id breaks
    * timestamp ties deterministically), so the whole query is a single
    * shuffle on user_id followed by map-side arithmetic; the batch
    * analog of the streaming `s2_session_window`. */
  private def q27(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val run = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "events")
      .withColumn("_prev", lag($"ts", 1).over(w))
      .withColumn("_new",
        when($"_prev".isNull ||
          unix_timestamp($"ts") - unix_timestamp($"_prev") > 1800, 1L).otherwise(0L))
      .withColumn("sess_id", sum($"_new").over(run))
      .groupBy($"user_id", $"sess_id")
      .agg(count(lit(1)).as("n_events"),
        min($"ts").as("start_ts"), max($"ts").as("end_ts"),
        dsum($"value").as("total_value"))
      .orderBy($"user_id", $"sess_id")
  }

  private val q27Sql =
    s"""WITH e AS (
       |  SELECT user_id, event_id, ts, value,
       |    CASE WHEN LAG(ts) OVER w IS NULL
       |           OR epoch(date_trunc('second', ts)) - epoch(date_trunc('second', LAG(ts) OVER w)) > 1800
       |         THEN 1 ELSE 0 END AS new_sess
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s AS (
       |  SELECT user_id, ts, value,
       |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS UNBOUNDED PRECEDING) AS sess_id
       |  FROM e)
       |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id, COUNT(*) AS n_events,
       |  MIN(ts) AS start_ts, MAX(ts) AS end_ts,
       |  ${sqlSum("value")} AS total_value
       |FROM s GROUP BY user_id, sess_id
       |ORDER BY user_id, sess_id""".stripMargin

  // --------------------------------------------------------------- Q28
  /** Ordered conversion funnel: per user, the first view, the first
    * click STRICTLY AFTER that view, and the first purchase strictly
    * after that click — the sequential-pattern shape (each stage's
    * minimum is conditioned on the previous stage's time, so it cannot
    * be one flat groupBy). Three keyed aggregations, each over a
    * pre-filtered event slice joined to the previous stage's (small)
    * per-user frame; left joins keep partial funnels as nulls. */
  private def q28(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = t(spark, dir, "events")
    val views = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t_view"))
    val clicks = ev.filter($"event_type" === "click")
      .join(views, Seq("user_id"))
      .filter($"ts" > $"t_view")
      .groupBy($"user_id").agg(min($"ts").as("t_click"))
    val purchases = ev.filter($"event_type" === "purchase")
      .join(clicks, Seq("user_id"))
      .filter($"ts" > $"t_click")
      .groupBy($"user_id").agg(min($"ts").as("t_purchase"))
    views
      .join(clicks, Seq("user_id"), "left_outer")
      .join(purchases, Seq("user_id"), "left_outer")
      .select($"user_id", $"t_view", $"t_click", $"t_purchase")
      .orderBy($"user_id")
  }

  private val q28Sql =
    """WITH v AS (
      |  SELECT user_id, MIN(ts) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, MIN(ts) AS t_click FROM events e JOIN v USING (user_id)
      |  WHERE event_type = 'click' AND ts > t_view GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, MIN(ts) AS t_purchase FROM events e JOIN c USING (user_id)
      |  WHERE event_type = 'purchase' AND ts > t_click GROUP BY e.user_id)
      |SELECT user_id, t_view, t_click, t_purchase
      |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
      |ORDER BY user_id""".stripMargin

  // ------------------------------------------------- Q6 grouping sets
  /** Explicit GROUPING SETS — the two one-dimensional marginals in a
    * single pass (not expressible as ROLLUP; a CUBE would also pay for
    * the (a,b) and () sets nobody asked for). Spark expands the input
    * once per set under a single two-phase aggregate, so the scan runs
    * once regardless of the number of sets. */
  private def q6GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .groupingSets(
        Seq(Seq($"o_orderpriority"), Seq($"o_orderstatus")),
        $"o_orderpriority", $"o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        dsum($"o_totalprice").as("revenue"),
        grouping($"o_orderpriority").cast(IntegerType).as("gp"),
        grouping($"o_orderstatus").cast(IntegerType).as("gs"))
      .orderBy($"gp", $"gs", $"o_orderpriority".asc_nulls_first, $"o_orderstatus".asc_nulls_first)
  }

  private val q6GroupingSetsSql =
    s"""SELECT o_orderpriority, o_orderstatus,
       |  COUNT(*) AS n,
       |  ${sqlSum("o_totalprice")} AS revenue,
       |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS gp,
       |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS gs
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
       |ORDER BY gp, gs, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- all
  // --------------------------------------------------------------- Q29
  /** Returned-item revenue top-20 (TPC-H Q10 shape): which customers
    * returned goods in a quarter, ranked by lost revenue. The shape
    * exercise is a 4-table join whose GROUP BY carries the WIDE
    * customer attributes through the aggregate, capped by a global
    * top-k. Join order prunes before joining: orders shrinks to one
    * quarter (~1/26 of the date range) BEFORE touching lineitem, and
    * lineitem keeps only returned lines before either join; nation is
    * broadcast onto the post-aggregate top rows, not the fact table.
    * The final ORDER BY + LIMIT pins TakeOrderedAndProject — no global
    * sort of the aggregate, a driver-sized top-20 per partition merge
    * (revenue ties broken by c_custkey so the cut is deterministic). */
  private def q29(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val quarter = t(spark, dir, "orders")
      .filter($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1996-04-01")
      .select($"o_orderkey", $"o_custkey")
    val returned = t(spark, dir, "lineitem")
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey",
        ($"l_extendedprice" * (lit(1) - $"l_discount")).as("volume"))
    val perCust = returned
      .join(quarter, $"l_orderkey" === $"o_orderkey")
      .join(t(spark, dir, "customer"), $"o_custkey" === $"c_custkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"c_nationkey")
      .agg(dsum($"volume").as("revenue"))
    perCust
      .join(broadcast(t(spark, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_name", $"revenue", $"c_acctbal", $"n_name")
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  private val q29Sql =
    s"""SELECT c_custkey, c_name, ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue,
       |  c_acctbal, n_name
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1996-04-01'
       |  AND l_returnflag = 'R'
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin

  // --------------------------------------------------------------- Q30
  /** Late-line priority counts (TPC-H Q12 shape, adapted to this
    * schema: no l_shipmode/l_receiptdate here, so "late" is shipped
    * more than 60 days after the order date and the category is
    * l_linestatus). The shape exercise is conditional aggregation —
    * CASE-bucketed counts inside one pass over a joined year window —
    * plus a join predicate BETWEEN columns of the two tables
    * (l_shipdate vs o_orderdate + 60 days), which no single-side
    * pushdown can satisfy: the date-window filter prunes lineitem at
    * the scan, the lateness residual runs post-join, and the output is
    * two rows. COUNT(CASE …) not SUM(CASE …) so both engines emit
    * BIGINT without a cast. */
  private def q30(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hi = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
    t(spark, dir, "lineitem")
      .filter($"l_shipdate" >= "1997-01-01" && $"l_shipdate" < "1998-01-01")
      .select($"l_orderkey", $"l_linestatus", $"l_shipdate")
      .join(t(spark, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" >= $"o_orderdate" + expr("INTERVAL 60 DAYS"))
      .groupBy($"l_linestatus")
      .agg(
        count(when(hi, 1)).as("high_line_count"),
        count(when(!hi, 1)).as("low_line_count"))
      .orderBy($"l_linestatus")
  }

  private val q30Sql =
    """SELECT l_linestatus,
      |  COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count,
      |  COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  // --------------------------------------------------------------- Q31
  /** Forecast revenue change (TPC-H Q6 shape): the canonical
    * scan-dominated aggregate — one table, three conjunctive
    * predicates, one decimal sum, one output row. The entire query is
    * a single parquet scan with ALL THREE predicates pushed to the
    * reader (`PushedFilters` carries the shipdate range, the discount
    * band, and the quantity bound) and a two-phase aggregate over the
    * survivors; at 100 TB this is the pattern whose cost is I/O and
    * nothing else — no exchange carries more than one row per task. */
  private def q31(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .filter($"l_shipdate" >= "1997-01-01" && $"l_shipdate" < "1998-01-01" &&
        $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
      .agg(dsum($"l_extendedprice" * $"l_discount").as("revenue"))
  }

  private val q31Sql =
    s"""SELECT ${sqlSum("l_extendedprice * l_discount")} AS revenue
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
       |  AND l_shipdate < TIMESTAMP '1998-01-01'
       |  AND l_discount BETWEEN 0.05 AND 0.07
       |  AND l_quantity < 24""".stripMargin

  // --------------------------------------------------------------- Q32
  /** Promotion effect (TPC-H Q14 shape): the fraction of a month's
    * revenue from promo parts — a conditional NUMERATOR and the full
    * DENOMINATOR accumulated in the SAME single-pass aggregate (two
    * sums, one scan, one broadcast join), then one scalar division.
    * The month filter prunes lineitem at the scan; part broadcasts.
    * Both engines compute (100 * promo) / total in the same
    * left-associated IEEE order over the same DECIMAL(28,10)-exact
    * sums, so the double result is bit-identical. */
  private def q32(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vol = $"l_extendedprice" * (lit(1) - $"l_discount")
    t(spark, dir, "lineitem")
      .filter($"l_shipdate" >= "1997-09-01" && $"l_shipdate" < "1997-10-01")
      .join(broadcast(t(spark, dir, "part")), $"l_partkey" === $"p_partkey")
      .agg((lit(100.0) * dsum(when($"p_type" === "PROMO", vol).otherwise(0.0)) /
        dsum(vol)).as("promo_revenue"))
  }

  private val q32Sql =
    s"""SELECT 100.0 * ${sqlSum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
       |  / ${sqlSum("l_extendedprice * (1 - l_discount)")} AS promo_revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
       |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin

  // --------------------------------------------------------------- Q33
  /** Local supplier volume (TPC-H Q5 shape): revenue where the
    * customer and the supplier sit in the SAME nation of one region.
    * The shape exercise is a CYCLE in the join graph — lineitem joins
    * orders→customer on one side and supplier on the other, and
    * `c_nationkey = s_nationkey` closes the loop, a predicate neither
    * chain can evaluate alone. Plan discipline: region filter →
    * nation slice (broadcast) joins its OWNER dims first, so supplier
    * and customer shrink to one region's five nations before any fact
    * join; the year window prunes orders at the scan; the
    * nation-equality residual rides the supplier join. */
  private def q33(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nations = t(spark, dir, "nation")
      .join(broadcast(t(spark, dir, "region").filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val cust = t(spark, dir, "customer").join(broadcast(nations),
        $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_nationkey")
    val supp = t(spark, dir, "supplier").join(broadcast(nations),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_nationkey", $"n_name")
    t(spark, dir, "orders")
      .filter($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1997-01-01")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(t(spark, dir, "lineitem"), $"l_orderkey" === $"o_orderkey")
      .join(supp, $"l_suppkey" === $"s_suppkey" && $"s_nationkey" === $"c_nationkey")
      .groupBy($"n_name")
      .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  private val q33Sql =
    s"""SELECT n_name, ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  // --------------------------------------------------------------- Q34
  /** Priority waiting (TPC-H Q4 shape): orders in one quarter that had
    * at least one late-shipped line, counted by priority. The shape
    * exercise is an EXISTS whose correlated predicate CROSSES tables —
    * `l_shipdate ≥ o_orderdate + 45 days` cannot be evaluated on either
    * scan alone, so it rides the LEFT SEMI hash join as a residual
    * (q4_semi_join's semi is a bare key match; this is the correlated
    * form). The quarter window prunes orders at the scan; the semi join
    * short-circuits per order — at 100 TB each order probes until its
    * first late line, never materializing the multiplicity. */
  private def q34(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .filter($"o_orderdate" >= "1997-07-01" && $"o_orderdate" < "1997-10-01")
      .join(t(spark, dir, "lineitem").select($"l_orderkey", $"l_shipdate"),
        $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" >= $"o_orderdate" + expr("INTERVAL 45 DAYS"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  private val q34Sql =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      |  AND o_orderdate < TIMESTAMP '1997-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate >= o_orderdate + INTERVAL 45 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // --------------------------------------------------------------- Q35
  /** Skew-salted dimension enrichment: events join a 5-row per-type
    * weight table on `event_type` — a key where EACH value carries ~20 %
    * of the fact table, the textbook straggler join at 100 TB (one task
    * pinned with 20 TB while 999 executors idle). The Spark side goes
    * through [[graft.core.Skew.saltedJoin]]: the fact side spreads each
    * hot key across 8 deterministic sub-keys (xxhash64 of key +
    * event_id), the dimension side replicates 8× via explode, and the
    * join runs on (key, salt) — 8 even tasks per hot key, bounded 8×
    * blowup of a 5-row table. The oracle states the PLAIN join: the row
    * pins that salting is pure plan surgery — semantics (including the
    * decimal-exact weighted sum) survive bit-for-bit. */
  private def q35(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = t(spark, dir, "events")
    val dim = ev.select($"event_type".as("et")).distinct()
      .withColumn("weight", length($"et").cast(DoubleType))
    graft.core.Skew.saltedJoin(ev, dim, "event_type", "et",
        salts = 8, disambigCol = "event_id")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value" * $"weight").as("weighted"))
      .orderBy($"event_type")
  }

  private val q35Sql =
    s"""WITH dim AS (
       |  SELECT DISTINCT event_type AS et,
       |    CAST(length(event_type) AS DOUBLE) AS weight
       |  FROM events)
       |SELECT event_type, COUNT(*) AS n,
       |  ${sqlSum("value * weight")} AS weighted
       |FROM events JOIN dim ON event_type = et
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------- Q36
  /** Min-cost supplier (TPC-H Q2 shape, fixture columns: lineitem is the
    * part↔supplier supply relation, min l_extendedprice per pair is the
    * "cost"): for each part in a size slice, the region's suppliers whose
    * cost EQUALS the part's regional minimum — the correlated-MIN-equality
    * shape. Spark-first decorrelation: the supply aggregate is built once
    * (part slice and region-qualified suppliers both broadcast into the
    * single fact scan), the per-part MIN is a second tiny aggregate over
    * it, and the equality rides a hash join on (partkey, cost). At 100 TB
    * the fact table is scanned once; both aggregates are proportional to
    * |slice parts| × |region suppliers| — dim-sized by construction. The
    * static plan prints the `supply` subtree twice (min branch + probe
    * branch) but AQE exchange reuse collapses them at runtime — the final
    * adaptive plan carries ReusedExchange nodes, so the scan + shuffle
    * execute once (verified on the executed plan). The DuckDB oracle
    * states the textbook correlated subquery. The final
    * top-100 is TakeOrderedAndProject on a key made total by s_name's
    * uniqueness — no full sort materializes. */
  private def q36(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val asiaSupp = t(spark, dir, "supplier")
      .join(t(spark, dir, "nation"), $"s_nationkey" === $"n_nationkey")
      .join(t(spark, dir, "region").filter($"r_name" === "ASIA"),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
    val prt = t(spark, dir, "part")
      .filter($"p_size" === 15).select($"p_partkey", $"p_type")
    val supply = t(spark, dir, "lineitem")
      .select($"l_partkey", $"l_suppkey", $"l_extendedprice")
      .join(broadcast(prt), $"l_partkey" === $"p_partkey")
      .join(broadcast(asiaSupp.select($"s_suppkey")),
        $"l_suppkey" === $"s_suppkey")
      .groupBy($"p_partkey", $"p_type", $"l_suppkey")
      .agg(min($"l_extendedprice").as("cost"))
    val minCost = supply.groupBy($"p_partkey".as("mk"))
      .agg(min($"cost").as("min_cost"))
    supply
      .join(minCost, $"p_partkey" === $"mk" && $"cost" === $"min_cost")
      .join(broadcast(asiaSupp), $"l_suppkey" === $"s_suppkey")
      .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"p_type", $"cost")
      .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
      .limit(100)
  }

  private val q36Sql =
    """WITH supply AS (
      |  SELECT p_partkey, p_type, l_suppkey, MIN(l_extendedprice) AS cost
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |    JOIN supplier ON l_suppkey = s_suppkey
      |    JOIN nation ON s_nationkey = n_nationkey
      |    JOIN region ON n_regionkey = r_regionkey
      |  WHERE p_size = 15 AND r_name = 'ASIA'
      |  GROUP BY p_partkey, p_type, l_suppkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_type, cost
      |FROM supply JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |WHERE cost = (SELECT MIN(s2.cost) FROM supply s2
      |              WHERE s2.p_partkey = supply.p_partkey)
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  // --------------------------------------------------------------- Q37
  /** Important stock (TPC-H Q11 shape, fixture columns): per-part
    * discounted value over one region's suppliers, keeping parts whose
    * value exceeds a GLOBAL scalar threshold — the group-HAVING-vs-
    * global-aggregate shape. The threshold is 1.5× the average per-part
    * value (TPC-H's fixed fraction breaks under scale-up: more parts →
    * smaller shares → empty result; the average is scale-invariant).
    * Spark-first: the per-part aggregate is built once, the 1-row scalar
    * is a broadcast joined as a `>` theta condition (q22's pattern). The
    * static plan prints the per-part aggregate twice, but AQE exchange
    * reuse deduplicates it at runtime (ReusedExchange verified on the
    * executed plan) — the fact scan and the heavy shuffle happen exactly
    * once and the HAVING costs |parts| comparisons. Both sides' sums and the average
    * go through DECIMAL(28,10) so the threshold compare is bit-identical
    * across engines. */
  private def q37(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val asiaKeys = t(spark, dir, "supplier")
      .join(t(spark, dir, "nation"), $"s_nationkey" === $"n_nationkey")
      .join(t(spark, dir, "region").filter($"r_name" === "ASIA"),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey")
    val perPart = t(spark, dir, "lineitem")
      .join(broadcast(asiaKeys), $"l_suppkey" === $"s_suppkey")
      .groupBy($"l_partkey")
      .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("value"))
    val threshold = perPart.agg((davg($"value") * 1.5).as("thr"))
    perPart.join(broadcast(threshold), $"value" > $"thr")
      .select($"l_partkey", $"value")
      .orderBy($"value".desc, $"l_partkey")
  }

  private val q37Sql =
    s"""WITH perpart AS (
       |  SELECT l_partkey,
       |    ${sqlSum("l_extendedprice * (1 - l_discount)")} AS value
       |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |    JOIN nation ON s_nationkey = n_nationkey
       |    JOIN region ON n_regionkey = r_regionkey
       |  WHERE r_name = 'ASIA'
       |  GROUP BY l_partkey)
       |SELECT l_partkey, value FROM perpart
       |WHERE value > (SELECT ${sqlAvg("value")} * 1.5 FROM perpart)
       |ORDER BY value DESC, l_partkey""".stripMargin

  // --------------------------------------------------------------- Q38
  /** Bucketed co-located fact⋈fact join: both sides are first persisted
    * bucket-sorted on the join key ([[graft.core.Bucketing]]), then the
    * join reads bucket-for-bucket with NO Exchange on either side — the
    * physical layout that amortizes the shuffle of a repeated 100 TB
    * fact⋈fact join into a one-time write. `hint("merge")` forces the
    * sort-merge strategy so the plan demonstrates bucket co-location
    * rather than falling back to broadcast at test scale (at real
    * fact⋈fact scale broadcast would not apply); BucketingSpec pins the
    * no-Exchange claim, the plan pin freezes the skeleton, and the
    * DuckDB oracle states the PLAIN join — bucketing is pure layout,
    * semantics are untouched. The only remaining exchange is the final
    * 5-group aggregate, which is partial-aggregated map-side. */
  private def q38(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // fingerprint = fixture identity: a bucketed copy is built once per
    // distinct source file and reused by every later invocation (bench
    // re-runs, repeated sessions) — the layout write is amortized, the
    // timed work is the Exchange-free join itself
    // fail fast on a missing fixture (an absent path would silently
    // fingerprint as 0:0 and reuse a stale layout), and fold a content
    // signal: the CRC of the parquet footer tail — the footer carries
    // row-group statistics, so a regeneration that happens to preserve
    // length+mtime still flips the fingerprint (ADVICE r10). Handles
    // both fixture shapes: the driver's single-file tables and
    // directory-shaped ones (the sf1 amplification's part files).
    def tailCrc(f: java.io.File): Long = {
      val raf = new java.io.RandomAccessFile(f, "r")
      try {
        val n = math.min(4096L, raf.length).toInt
        raf.seek(raf.length - n)
        val buf = new Array[Byte](n)
        raf.readFully(buf)
        val c = new java.util.zip.CRC32()
        c.update(buf)
        c.getValue
      } finally raf.close()
    }
    def fp(name: String): String = {
      val f = new java.io.File(s"$dir/$name.parquet")
      require(f.exists, s"q38: fixture not found: ${f.getPath}")
      if (f.isFile) s"$dir/$name:${f.length}:${f.lastModified}:${tailCrc(f)}"
      else {
        val parts = f.listFiles()
          .filter(p => p.isFile && p.getName.startsWith("part-")).sortBy(_.getName)
        require(parts.nonEmpty, s"q38: no part files under ${f.getPath}")
        val c = new java.util.zip.CRC32()
        parts.foreach(p =>
          c.update(s"${p.getName}:${p.length}:${p.lastModified}".getBytes("UTF-8")))
        s"$dir/$name:dir:${parts.length}:${c.getValue}:${tailCrc(parts.last)}"
      }
    }
    val bLineitem = graft.core.Bucketing.ensureBucketed(
      t(spark, dir, "lineitem").select($"l_orderkey", $"l_extendedprice", $"l_discount"),
      "q38_b_lineitem", "l_orderkey", 16, fp("lineitem"))
    val bOrders = graft.core.Bucketing.ensureBucketed(
      t(spark, dir, "orders").select($"o_orderkey", $"o_orderpriority"),
      "q38_b_orders", "o_orderkey", 16, fp("orders"))
    spark.table(bLineitem).hint("merge")
      .join(spark.table(bOrders), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
      .orderBy($"o_orderpriority")
  }

  private val q38Sql =
    s"""SELECT o_orderpriority, COUNT(*) AS n_lines,
       |  ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  // --------------------------------------------------------------- Q39
  /** Shipping-priority order ranking (TPC-H Q3 shape): segment-filtered
    * customers drive a date-SPLIT fact join — orders placed before the
    * cutoff whose lines ship after it — aggregated per order, top-10 by
    * revenue. Both date predicates push to their fact scans (the
    * canonical "prune before joining" Q3 read), the aggregate carries
    * the order's attributes through the group-by, and the cap plans as
    * TakeOrderedAndProject. The customer slice joins UNHINTED: at
    * fixture scale Catalyst broadcasts it, at 100 TB a 1/5-of-customers
    * slice is not broadcastable and the same plan degrades gracefully
    * to a shuffle join — the right default for a slice whose size
    * tracks the dimension. Completes explicit TPC-H shape coverage
    * (Q3 was the one canonical shape q3_multi_join's revenue-per-nation
    * variant did not exercise). */
  private def q39(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cut = "1998-07-01"
    val building = t(spark, dir, "customer")
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val openOrders = t(spark, dir, "orders")
      .filter($"o_orderdate" < cut)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_orderpriority")
    val lateLines = t(spark, dir, "lineitem")
      .filter($"l_shipdate" > cut)
      .select($"l_orderkey",
        ($"l_extendedprice" * (lit(1) - $"l_discount")).as("volume"))
    lateLines
      .join(openOrders, $"l_orderkey" === $"o_orderkey")
      .join(building, $"o_custkey" === $"c_custkey")
      .groupBy($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(dsum($"volume").as("revenue"))
      .select($"o_orderkey", $"revenue", $"o_orderdate", $"o_orderpriority")
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
  }

  private val q39Sql =
    s"""SELECT o_orderkey, ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue,
       |  o_orderdate, o_orderpriority
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-07-01'
       |  AND l_shipdate > TIMESTAMP '1998-07-01'
       |GROUP BY o_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, o_orderkey
       |LIMIT 10""".stripMargin

  val all: Seq[Declared] = Seq(
    Declared("q1_pricing_summary", q1, Some(q1Sql)),
    Declared("q2_join_agg", q2, Some(q2Sql)),
    Declared("q3_multi_join", q3, Some(q3Sql)),
    Declared("q4_semi_join", q4Semi, Some(q4SemiSql)),
    Declared("q4_anti_join", q4Anti, Some(q4AntiSql)),
    Declared("q4_left_outer", q4Left, Some(q4LeftSql)),
    Declared("q4_full_outer", q4Full, Some(q4FullSql)),
    Declared("q4_cross_dims", q4Cross, Some(q4CrossSql)),
    Declared("q5_range_join", q5, Some(q5Sql)),
    Declared("q6_rollup", q6Rollup, Some(q6RollupSql)),
    Declared("q6_cube", q6Cube, Some(q6CubeSql)),
    Declared("q6_stats", q6Stats, Some(q6StatsSql)),
    Declared("q7_topk_per_group", q7Top3, Some(q7Top3Sql)),
    Declared("q7_running_sum", q7Running, Some(q7RunningSql)),
    Declared("q7_lag_lead", q7Lag, Some(q7LagSql)),
    Declared("q7_ranks", q7Ranks, Some(q7RanksSql)),
    Declared("q7_range_frame", q7RangeFrame, Some(q7RangeFrameSql)),
    Declared("q6_pivot", q6Pivot, Some(q6PivotSql)),
    Declared("q10_explode", q10Explode, Some(q10ExplodeSql)),
    Declared("q10_predicates", q10Pred, Some(q10PredSql)),
    Declared("q8_global_topk", q8, Some(q8Sql)),
    Declared("q9_intersect", q9Intersect, Some(q9IntersectSql)),
    Declared("q9_except", q9Except, Some(q9ExceptSql)),
    Declared("q9_union_agg", q9Union, Some(q9UnionSql)),
    Declared("q10_string_fns", q10String, Some(q10StringSql)),
    Declared("q10_date_fns", q10Date, Some(q10DateSql)),
    Declared("q10_math_fns", q10Math, Some(q10MathSql)),
    Declared("q10_json_fns", q10Json, Some(q10JsonSql)),
    Declared("q10_array_fns", q10Array, Some(q10ArraySql)),
    Declared("q10_map_fns", q10Map, Some(q10MapSql)),
    Declared("q11_event_buckets", q11, Some(q11Sql)),
    Declared("q6_unpivot", q6Unpivot, Some(q6UnpivotSql)),
    Declared("q10_try_fns", q10Try, Some(q10TrySql)),
    Declared("q11_gap_fill", q11GapFill, Some(q11GapFillSql)),
    Declared("q14_correlated_subquery", q14, Some(q14Sql)),
    Declared("q15_top_supplier", q15, Some(q15Sql)),
    Declared("q16_parts_supplier", q16, Some(q16Sql)),
    Declared("q17_small_quantity", q17, Some(q17Sql)),
    Declared("q18_large_volume", q18, Some(q18Sql)),
    Declared("q20_qualifying_shippers", q20, Some(q20Sql)),
    Declared("q21_lone_returner", q21, Some(q21Sql)),
    Declared("q23_custdist", q23, Some(q23Sql)),
    Declared("q27_sessionize", q27, Some(q27Sql)),
    Declared("q28_funnel", q28, Some(q28Sql)),
    Declared("q24_volume_shipping", q24, Some(q24Sql)),
    Declared("q25_market_share", q25, Some(q25Sql)),
    Declared("q26_product_profit", q26, Some(q26Sql)),
    Declared("q19_disjunctive_join", q19, Some(q19Sql)),
    Declared("q22_dormant_customers", q22, Some(q22Sql)),
    Declared("q6_grouping_sets", q6GroupingSets, Some(q6GroupingSetsSql)),
    Declared("q29_returned_items", q29, Some(q29Sql)),
    Declared("q30_late_lines", q30, Some(q30Sql)),
    Declared("q31_revenue_delta", q31, Some(q31Sql)),
    Declared("q32_promo_effect", q32, Some(q32Sql)),
    Declared("q33_local_suppliers", q33, Some(q33Sql)),
    Declared("q34_priority_waiting", q34, Some(q34Sql)),
    Declared("q35_skew_join", q35, Some(q35Sql)),
    Declared("q36_min_cost_supplier", q36, Some(q36Sql)),
    Declared("q37_important_stock", q37, Some(q37Sql)),
    Declared("q38_bucketed_join", q38, Some(q38Sql)),
    Declared("q39_shipping_priority", q39, Some(q39Sql)))
}
