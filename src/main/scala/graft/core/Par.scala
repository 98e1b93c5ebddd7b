package graft.core

import org.apache.spark.sql.DataFrame

/** Parallelism floor for row-proportional heavy stages (r21, guide
  * §2.5 input skew / §2.6 idle capacity — the BitextStream forward-pass
  * fix generalized).
  *
  * A micro-batch (or a small fixture file) arrives partitioned by file
  * BYTES — often 1-2 tiny splits — while the work downstream is
  * per-ROW and heavy (BPE encode of every word, per-doc shingling,
  * per-token explode), so a byte-small input runs a compute-bound
  * stage on 1-2 of N cores. Size-based planning (maxPartitionBytes,
  * AQE coalescing) cannot see per-row compute cost; this floor can.
  *
  * Scale posture: the repartition fires ONLY when the frame's actual
  * partition count is below the cluster's parallelism — at 100 TB a
  * drop arrives as thousands of splits and this is a no-op; the
  * shuffle it adds on small inputs is batch-sized (KBs-MBs), priced
  * far below the serial stage it unblocks. Call it on frames whose
  * partition count is KNOWN statically (scans, materialized
  * checkpoints) — an un-executed AQE shuffle reports its pre-coalesce
  * count and would defeat the condition. */
object Par {
  def widen(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }

  /** Pin a frame's parallelism at the configured shuffle-partition
    * count for a follow-on stage whose PER-ROW work wildly outweighs
    * its byte size (a per-token explode: one doc-level row generates
    * thousands of output rows) — AQE's size-based coalescing would
    * otherwise collapse the exchange feeding it to one task. The count
    * is `spark.sql.shuffle.partitions` — the deployment-scaled knob
    * (local cores here, 2-3× executor cores on a cluster per the
    * GraftSession note) — so the fan-out is parameterized, not tuned
    * to local mode; user repartitions are exempt from AQE coalescing,
    * which is exactly the point. */
  def fan(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.conf.get(
      "spark.sql.shuffle.partitions").toInt)
}
