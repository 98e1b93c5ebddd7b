package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AsOf, Curation, Declared, Dedup, IndexStore, Ingest, Layout, Multimodal, Relational, Similarity, TextAnalysis}
import graft.streaming.{BitextStream, CurateStream, EventStreams, IndexStream, MediaStream, PackStream}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from the module-local declared-query lists so
  * each operator's Spark implementation and its DuckDB oracle stay
  * colocated and in sync.
  */
object SparkEntry {
  private def modules: Seq[Declared] =
    Relational.all ++ AsOf.all ++ Ingest.all ++ EventStreams.all ++
      Dedup.all ++ Similarity.all ++ TextAnalysis.all ++ Multimodal.all ++
      Curation.all ++ CurateStream.all ++ Layout.all ++ IndexStore.all ++
      IndexStream.all ++ PackStream.all ++ MediaStream.all ++ BitextStream.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.all.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Declared.queryMap(modules)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Declared.oracleMap(modules)
}
