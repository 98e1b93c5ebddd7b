package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Sink maintenance jobs.
  *
  * A long-running append stream writes one small file per trigger per
  * partition; at 100 TB that means millions of kilobyte files that
  * destroy scan performance (footer reads dominate). Compaction
  * rewrites a closed date partition into few large files — run it on
  * partitions the watermark has passed, never on the one being written.
  */
object Maintenance {

  /** The LogEntry fields in Go struct declaration order (reference
    * main.go:43-51). Compaction reads with this explicit schema — JSON
    * inference would alphabetize the field order and could retype
    * fields, breaking the documented field-order parity of the sink. */
  private[streaming] val logEntrySchema: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("level", StringType),
    StructField("message", StringType),
    StructField("client_ip", StringType),
    StructField("byte_count", LongType),
    StructField("binary_data_hex", StringType),
    StructField("binary_data_string", StringType)))

  /** Rewrite one `date=`-partition of a JSONL sink directory into
    * `targetFiles` files. Returns the resulting file count, or -1 if the
    * partition does not exist.
    *
    * Swap visibility: HDFS-style filesystems offer no multi-path atomic
    * rename, so the swap is two renames (live→backup, compacted→live)
    * and the partition path does NOT exist for the instant between them
    * — concurrent readers of this one partition can transiently miss it.
    * Run compaction only on closed partitions (see class doc), where the
    * only readers are ad-hoc scans that retry. A crash between the
    * renames is recovered on the next invocation: the backup path is
    * restored if the live path is missing, so no data is stranded.
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
    val bak = new Path(s"$outDir/.old-date=$date")
    // crash recovery: the backup exists only inside an interrupted swap
    // window; restore it when the live path is gone, discard it when the
    // swap completed but cleanup died
    if (fs.exists(bak)) {
      if (!fs.exists(part)) fs.rename(bak, part)
      else fs.delete(bak, true)
    }
    if (!fs.exists(part)) return -1
    val tmp = new Path(s"$outDir/.compact-date=$date")
    fs.delete(tmp, true)
    spark.read.schema(logEntrySchema).json(part.toString)
      .select(logEntrySchema.fieldNames.map(col).toIndexedSeq: _*)
      .repartition(targetFiles)
      .write.mode("overwrite")
      .option("ignoreNullFields", "true") // keep the sink's omitempty shape
      .json(tmp.toString)
    require(fs.rename(part, bak), s"swap failed: $part -> $bak")
    require(fs.rename(tmp, part), s"swap failed: $tmp -> $part (backup at $bak)")
    fs.delete(bak, true)
    fs.listStatus(part).count(_.getPath.getName.endsWith(".json"))
  }
}
