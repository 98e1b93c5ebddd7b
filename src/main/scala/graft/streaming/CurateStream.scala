package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

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
  *   4. append survivors to the curated output, then append their keys
  *      to the store.
  *
  * State is the key store: 16 bytes per accepted doc as parquet — at
  * 10^10 docs ~300 GB, a broadcast-or-shuffle anti-join per increment,
  * NOT driver state. Delivery: the file-source checkpoint makes batches
  * replay-once; a crash between step 4's two writes can duplicate
  * output rows of that one batch on retry (append sinks are not
  * transactional) — downstream readers dedupe on doc_id, and every
  * LATER batch is exact because its keys were recorded. */
object CurateStream {

  private def keyed(docs: DataFrame): DataFrame =
    docs.withColumn("_key", md5(Dedup.normText(col("text")).cast("binary")))

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
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        // 1. within-batch keep-first (skew-safe, as in Curation.curate)
        val keepers = batch
          .groupBy(Dedup.normText(col("text")).as("_k"))
          .agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"))
        val firsts = keyed(batch.join(keepers, Seq("doc_id"), "left_semi"))
        // 2. cross-batch dedup against accepted keys
        val seen =
          try sp.read.parquet(keysDir).select(col("_key"))
          catch { case _: Exception => sp.emptyDataFrame.select(lit("").as("_key")).limit(0) }
        val fresh = firsts.join(seen, Seq("_key"), "left_anti")
        // 3. the map-only curation stages
        val curated = Curation.hashSplit(Curation.repetition(fresh)
          .filter(col("n_words") >= minWords && col("dup_word_frac") <= maxDupWordFrac))
        // 4. output first, then keys: a later batch can only be affected
        // by keys, which are written last (see delivery note above)
        curated.drop("_key").write.mode("append").parquet(dataDir)
        curated.select(col("_key")).write.mode("append").parquet(keysDir)
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
