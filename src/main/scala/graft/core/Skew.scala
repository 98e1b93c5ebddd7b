package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting.
  *
  * AQE's skew-join splitting (enabled in [[GraftSession]]) handles most
  * runtime skew; explicit salting remains the tool when one side must be
  * replicated deterministically — e.g. a hot key carrying 1% of 100 TB
  * that would otherwise pin a single task.
  *
  * `saltedJoin` spreads the skewed (left) side across `salts` sub-keys
  * with a deterministic per-row salt and replicates the right side
  * `salts`× via explode — turning one giant task into `salts` even
  * ones at the cost of a bounded right-side blowup. Aggregations don't
  * need this: Spark's partial aggregation already combines per-partition
  * before the shuffle.
  */
object Skew {

  /** Deterministic salt in [0, salts): cheap, reproducible, and spread
    * evenly via a hash of the whole row's key + a disambiguator. */
  private def saltCol(on: Column, salts: Int, disambig: Column): Column =
    pmod(xxhash64(on, disambig), lit(salts.toLong))

  /** Equi-join `left ⋈ right` on `key`, with the left side salted and
    * the right side replicated across all salt values. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, salts: Int, disambigCol: String): DataFrame = {
    val l = left.withColumn("__salt",
      saltCol(col(leftKey), salts, col(disambigCol)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
