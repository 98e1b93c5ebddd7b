package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataTypes, DoubleType}

/** Hash-stable numeric aggregation.
  *
  * Double summation is order-dependent, and Spark (32-way partial
  * aggregation) and the DuckDB oracle (single-node, vectorized) sum in
  * different orders — naive `sum(double)` can disagree in the 4th decimal
  * at 60k rows. Routing through an exact DECIMAL(28,10) sum makes the
  * result order-independent and therefore bit-identical across engines:
  * the per-row double→decimal cast is deterministic, the decimal sum is
  * exact, and the final decimal→double cast is correctly rounded in both.
  *
  * The Spark partial/final (map-side combine) aggregation still applies to
  * decimal sums — this costs a little CPU per row but no extra shuffle, and
  * it is the difference between a reproducible answer and a flaky one at
  * 100 TB where partition counts (and thus summation order) change run to
  * run.
  */
object Num {
  private val Dec = DataTypes.createDecimalType(28, 10)

  /** Order-independent sum of a double expression, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** avg as exact-sum / count: both engines perform the identical IEEE
    * double division, so the result is bit-identical (plain `avg(double)`
    * is order-dependent, and DuckDB's AVG over decimal returns double
    * computed differently from Spark's decimal average).
    */
  def davg(c: Column): Column = dsum(c) / count(c) // count(c): nulls excluded, true AVG semantics

  /** SQL fragment builders for the DuckDB oracle, mirroring dsum/davg. */
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(28,10))) AS DOUBLE)"
  def sqlAvg(expr: String): String =
    s"(${sqlSum(expr)} / COUNT($expr))"
}
