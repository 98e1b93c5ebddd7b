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

  val all: Seq[Declared] = Seq(
    Declared("xl_zorder_key", xlZorder, Some(xlZorderSql)))
}
