package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.core.Tables
import graft.operators.{Curation, Dedup}

/** Incremental corpus curation: the batch [[graft.operators.Curation]]
  * stages applied continuously to a GROWING parquet directory — how a
  * 100 TB corpus is actually built (crawl drops land daily; re-running
  * the batch pipeline over all of history per drop is O(corpus) per day,
  * this is O(new data)).
  *
  * Each micro-batch (file-source increments, checkpoint-tracked):
  *   1. keep-first exact dedup WITHIN the batch (groupBy min doc_id +
  *      semi-join — the skew-safe formulation, same as [[Curation.curate]]);
  *   2. anti-join against the persisted key store of every previously
  *      ACCEPTED document's normalized-text md5 — cross-batch dedup
  *      without ever rescanning accepted documents themselves;
  *   3. repetition filter + md5 split (map-only);
  *   4. write survivors and their keys, each under a per-batch
  *      directory (`…/batch_id=N/`, overwrite mode).
  *
  * State is the key store: 16 bytes per accepted doc as parquet — at
  * 10^10 docs ~300 GB, a broadcast-or-shuffle anti-join per increment,
  * NOT driver state.
  *
  * Delivery is exactly-once under replay. Both sinks are per-batch
  * directories written with overwrite, so re-running batch N (after a
  * crash anywhere in step 4, or after the keys write but before the
  * checkpoint commit) overwrites batch N's own output instead of
  * appending a second copy. The key-store read excludes batch N's own
  * partition (`batch_id < N`), so a replay that finds its own
  * half-written keys cannot anti-join its documents away — the failure
  * mode the old append-append design had. The read also checks
  * directory existence explicitly and lets every real error (corrupt
  * file, permission) propagate: silently treating a failed read as "no
  * keys yet" would disable cross-batch dedup for the batch and admit
  * duplicates with no signal. Downstream readers see a `batch_id`
  * partition column on both outputs; a long-running deployment
  * periodically compacts old batch directories (see
  * [[Maintenance.compactJsonPartition]] for the crash-safe pattern).
  */
object CurateStream {

  private val keysSchema = StructType(Seq(
    StructField("_key", StringType), StructField("batch_id", LongType)))

  private def keyed(docs: DataFrame): DataFrame =
    docs.withColumn("_key", md5(Dedup.normText(col("text")).cast("binary")))

  /** One micro-batch of the pipeline (exposed for the replay tests:
    * calling it twice with the same `batchId` must be a no-op). */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
      keysDir: String, dataDir: String, minWords: Int,
      maxDupWordFrac: Double): Unit = {
    val sp = batch.sparkSession
    // 1. within-batch keep-first (skew-safe, as in Curation.curate)
    val keepers = batch
      .groupBy(Dedup.normText(col("text")).as("_k"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val firsts = keyed(batch.join(keepers, Seq("doc_id"), "left_semi"))
    // 2. cross-batch dedup against keys accepted by EARLIER batches only
    // (batch_id < N: a replay must not see its own keys). Existence is
    // checked explicitly; any other read failure propagates and fails
    // the batch rather than silently skipping dedup.
    val kPath = new Path(keysDir)
    val fs = kPath.getFileSystem(sp.sparkContext.hadoopConfiguration)
    val seen =
      if (fs.exists(kPath))
        sp.read.schema(keysSchema).parquet(keysDir)
          .filter(col("batch_id") < batchId).select(col("_key"))
      else sp.emptyDataFrame.select(lit("").as("_key")).limit(0)
    val fresh = firsts.join(seen, Seq("_key"), "left_anti")
    // 3. the map-only curation stages
    val curated = Curation.hashSplit(Curation.repetition(fresh)
      .filter(col("n_words") >= minWords && col("dup_word_frac") <= maxDupWordFrac))
    // 4. per-batch overwrite directories: replays converge instead of
    // duplicating (data) or self-cancelling (keys)
    curated.drop("_key").write.mode("overwrite")
      .parquet(s"$dataDir/batch_id=$batchId")
    curated.select(col("_key")).write.mode("overwrite")
      .parquet(s"$keysDir/batch_id=$batchId")
  }

  def start(spark: SparkSession, inDir: String, outDir: String,
      checkpoint: String, minWords: Int = 30,
      maxDupWordFrac: Double = 0.5): StreamingQuery = {
    val keysDir = s"$outDir/_keys"
    val dataDir = s"$outDir/data"
    spark.readStream
      .schema(Tables.documents)
      .parquet(inDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, keysDir, dataDir, minWords, maxDupWordFrac)
      }
      .start()
  }

  /** Run one AvailableNow pass to completion (test / cron entry). */
  def runOnce(spark: SparkSession, inDir: String, outDir: String,
      checkpoint: String): Unit = {
    val q = start(spark, inDir, outDir, checkpoint)
    q.awaitTermination()
  }
}
