package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.core.Tables

/** Data-layout optimization: Z-order (Morton) clustering for
  * multi-dimensional scan pruning.
  *
  * Parquet scans skip row groups / files whose column min/max range
  * misses the predicate. A single-column sort makes that work for ONE
  * column and destroys it for every other; interleaving the bits of two
  * (or more) key columns into one sort key gives every file a small
  * bounding BOX over all keyed dimensions, so point/range predicates on
  * ANY of them prune — the technique behind Delta/Iceberg `OPTIMIZE
  * ZORDER BY` (public literature: Morton 1966; Databricks/Iceberg docs).
  *
  * Scale posture: the z-value is a pure per-row bit expression (codegen,
  * no UDF), and the layout pass is one `repartitionByRange` on the
  * z-value + in-partition sort — the standard one-shuffle re-layout a
  * compaction job runs. Nothing collects; file count = partition count
  * is the only knob.
  */
object Layout {

  /** 32-bit Morton interleave of the low 16 bits of two long columns —
    * pure shift/mask arithmetic, identical in any engine. Bit i of x
    * lands at bit 2i, bit i of y at bit 2i+1. */
  def zvalue16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      val xb = shiftleft(shiftright(x.cast(LongType), i).bitwiseAND(1L), 2 * i)
      val yb = shiftleft(shiftright(y.cast(LongType), i).bitwiseAND(1L), 2 * i + 1)
      xb.plus(yb)
    }.reduce(_ plus _)

  /** [[zvalue16]] as a raw catalyst Expression tree — what the SQL
    * function registry needs (a Column-API tree handed back from a
    * function builder stays unresolved; these nodes analyze and
    * codegen like any built-in arithmetic). Semantically identical to
    * [[zvalue16]]; `SqlSurfaceSpec` pins SQL ≡ Column-API. */
  def zvalue16Expr(x: org.apache.spark.sql.catalyst.expressions.Expression,
      y: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    val xl = Cast(x, LongType); val yl = Cast(y, LongType)
    (0 until 16).map { i =>
      val xb = ShiftLeft(BitwiseAnd(ShiftRight(xl, Literal(i)), Literal(1L)), Literal(2 * i))
      val yb = ShiftLeft(BitwiseAnd(ShiftRight(yl, Literal(i)), Literal(1L)), Literal(2 * i + 1))
      Add(xb, yb): Expression
    }.reduce((a, b) => Add(a, b))
  }

  /** Re-layout `df` so files cluster on the z-order of (x, y):
    * range-partition on the z-value (balanced output files via the
    * range sampler), then sort within partitions so row groups inside
    * each file are tight too. `files` = output file count. */
  def layoutByZorder(df: DataFrame, x: String, y: String, files: Int): DataFrame = {
    val withZ = df.withColumn("_z", zvalue16(col(x), col(y)))
    withZ.repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }

  // ----------------------------------------------------------- declared
  /** Z-values of the (l_partkey, l_suppkey) pairs of the 1000 cheapest
    * lineitems — the sort key a compaction job would lay the table out
    * by, hash-oracled bit-for-bit (DuckDB computes the same interleave
    * with its native bitwise operators). */
  private def xlZorder(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        zvalue16(col("l_partkey"), col("l_suppkey")).as("zval"))
      .orderBy(col("zval"), col("l_orderkey"), col("l_linenumber"))
      .limit(1000)
  }

  private val xlZorderSql = {
    // BIGINT-cast each term: DuckDB's >> / << on INTEGER stays 32-bit, so
    // ((l_suppkey >> 15) & 1) << 31 would overflow int32 once suppkey has
    // bit 15 set (>= 32768) while Spark computes in LongType.
    val terms = (0 until 16).map { i =>
      s"(((CAST(l_partkey AS BIGINT) >> $i) & 1) << ${2 * i}) + (((CAST(l_suppkey AS BIGINT) >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
    s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |  CAST($terms AS BIGINT) AS zval
       |FROM lineitem
       |ORDER BY zval, l_orderkey, l_linenumber
       |LIMIT 1000""".stripMargin
  }

  /** Re-layout `df` clustered on the Hilbert index of (x, y) — same
    * one-shuffle pass as [[layoutByZorder]] with the tighter-locality
    * key ([[graft.functions.Hilbert]]): consecutive curve positions
    * are always grid neighbors, so equal key ranges cut tighter
    * bounding boxes than Z-order's quadrant-seam jumps
    * (`LayoutSpec` measures the box areas side by side). */
  def layoutByHilbert(df: DataFrame, x: String, y: String, files: Int): DataFrame = {
    val withH = df.withColumn("_h", graft.functions.Hilbert.hvalue16(col(x), col(y)))
    withH.repartitionByRange(files, col("_h"))
      .sortWithinPartitions(col("_h"))
      .drop("_h")
  }

  // ----------------------------------------------------------- declared
  /** Hilbert indices of the same key pairs as [[xlZorder]] — the
    * alternative clustering key, computed by the codegen'd
    * [[graft.functions.HilbertExpr]] kernel. The DuckDB oracle replays
    * the 16-round rotation loop as a generated 17-CTE chain (one CTE
    * per curve order, each rewriting (x, y, d) from the previous — the
    * same unrolled-iteration oracle idiom as x2_pq_codes), so the
    * engine's custom expression is value-checked bit-for-bit, not
    * rows-only. */
  private def xlHilbert(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        graft.functions.Hilbert.hvalue16(col("l_partkey"), col("l_suppkey")).as("hval"))
      .orderBy(col("hval"), col("l_orderkey"), col("l_linenumber"))
      .limit(1000)
  }

  private val xlHilbertSql = {
    val ctes = Seq(
      "c16 AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, " +
        "CAST(l_partkey AS BIGINT) & 65535 AS x, CAST(l_suppkey AS BIGINT) & 65535 AS y, " +
        "CAST(0 AS BIGINT) AS d FROM lineitem)") ++
      (15 to 0 by -1).map { i =>
        val s = 1L << i
        val rx = s"((x >> $i) & 1)"
        val ry = s"((y >> $i) & 1)"
        // (3·rx) XOR ry without an engine-specific xor function
        val quad = s"CASE WHEN $rx = 0 AND $ry = 0 THEN 0 WHEN $rx = 0 THEN 1 " +
          s"WHEN $ry = 0 THEN 3 ELSE 2 END"
        val newx = s"CASE WHEN $ry = 1 THEN x WHEN $rx = 1 THEN ${s - 1} - y ELSE y END"
        val newy = s"CASE WHEN $ry = 1 THEN y WHEN $rx = 1 THEN ${s - 1} - x ELSE x END"
        s"c$i AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, " +
          s"$newx AS x, $newy AS y, d + ${s * s} * ($quad) AS d FROM c${i + 1})"
      }
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, d AS hval FROM c0
       |ORDER BY hval, l_orderkey, l_linenumber
       |LIMIT 1000""".stripMargin
  }

  val all: Seq[Declared] = Seq(
    Declared("xl_zorder_key", xlZorder, Some(xlZorderSql)),
    Declared("xl_hilbert_key", xlHilbert, Some(xlHilbertSql)))
}
