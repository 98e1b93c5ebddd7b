package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query of the engine's contract (SURVEY.md §2B).
  *
  * `run` is the Spark-native implementation; `oracle`, when present, is the
  * equivalent ANSI SQL the driver executes in DuckDB over the same parquet
  * tables — column names must match exactly and results must hash-match
  * after a total-order sort. Queries whose semantics are not
  * SQL-expressible (streaming, UDF-heavy) leave `oracle` empty and get a
  * rows-only check plus dedicated unit tests.
  */
final case class Declared(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Declared {
  /** Assemble the SparkEntry maps from a module's query list. */
  def queryMap(qs: Seq[Declared]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.run).toMap
  def oracleMap(qs: Seq[Declared]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
