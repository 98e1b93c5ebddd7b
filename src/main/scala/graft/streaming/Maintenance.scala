package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Sink maintenance jobs.
  *
  * A long-running append stream writes one small file per trigger per
  * partition; at 100 TB that means millions of kilobyte files that
  * destroy scan performance (footer reads dominate). Compaction
  * rewrites a closed date partition into few large files — run it on
  * partitions the watermark has passed, never on the one being written.
  */
object Maintenance {

  /** Rewrite one `date=`-partition of a JSONL sink directory into
    * `targetFiles` files (atomically: write aside, swap). Returns the
    * resulting file count, or -1 if the partition does not exist.
    *
    * CONTRACT: downstream readers must target partition paths
    * (`outDir/date=.../`) — a batch read of the sink ROOT resolves files
    * through the FileStreamSink's `_spark_metadata` log, which still
    * lists the pre-compaction files. Rewriting that log in place is not
    * safe while the stream is live, so compaction deliberately leaves it
    * alone and the root-read view stays consistent for the stream's own
    * exactly-once bookkeeping. */
  def compactJsonPartition(
      spark: SparkSession, outDir: String, date: String, targetFiles: Int = 1): Int = {
    val part = new Path(s"$outDir/date=$date")
    val fs = part.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(part)) return -1
    val tmp = new Path(s"$outDir/.compact-date=$date")
    spark.read.json(part.toString)
      .repartition(targetFiles)
      .write.mode("overwrite").json(tmp.toString)
    val bak = new Path(s"$outDir/.old-date=$date")
    fs.rename(part, bak)
    fs.rename(tmp, part)
    fs.delete(bak, true)
    fs.listStatus(part).count(_.getPath.getName.endsWith(".json"))
  }
}
