package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers — the shuffle-elimination tool for repeated
  * large-×-large joins at 100 TB.
  *
  * Writing both sides bucketed (and sorted) on the join key co-locates
  * matching keys in the same bucket file; a subsequent equi-join reads
  * bucket-for-bucket and needs NO Exchange on either side — the single
  * most important physical layout decision for a fact⋈fact join that
  * runs daily. Bucket counts must match (or divide) across the two
  * sides.
  */
object Bucketing {

  /** Persist `df` as a bucketed, bucket-sorted table in the session
    * catalog (parquet under the warehouse dir). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // the in-memory catalog forgets tables across sessions but their
    // warehouse directories survive — clear a stale location too
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(warehouse)) fs.delete(warehouse, true)
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key — planned without a
    * shuffle when bucketing lines up. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    // bind each table once: building the condition from fresh
    // spark.table() calls only resolves while the relation cache returns
    // identical exprIds
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
