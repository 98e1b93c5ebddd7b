package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Persisted IVF-PQ index: the build-once / query-many split a
  * production ANN service runs. [[Similarity.ivfPqSearch]] is the
  * composed dataflow, but it re-trains codebooks and re-encodes the
  * corpus on EVERY call — fine for a declared row, wrong for the 100 TB
  * regime where the encode pass is the expensive one-time scan (FAISS
  * practice: train on a sample, encode once, serve queries against the
  * stored codes). This store writes the three artifacts as parquet —
  *
  *   - `centroids`  (cid, centroid double[], norm): nlist rows
  *   - `codebooks`  (subspace, code, vec double[]): m × k rows
  *   - `codes`      (vec_id, cluster, code_0..code_{m-1}): corpus-sized,
  *                  the 100 TB table — dim floats → m bytes per vector,
  *                  batch-partitioned (`batch_id=N/`) so [[appendIvfPq]]
  *                  grows it without touching existing batches
  *   - `meta`       (nlist, m, k, sub, dim): 1 row
  *
  * and [[searchIvfPq]] serves queries with NO training and NO
  * full-vector read: centroids/codebooks/meta are bounded loads (the
  * same nlist × dim / m × k × sub driver-state bound every IVF path
  * argues from), and the codes table is the only corpus-sized scan.
  * Search results are bit-identical to the in-memory composition
  * ([[IndexStoreSpec]] asserts row equality vs [[Similarity.ivfPqSearch]];
  * the `x2_ivfpq_persisted` declared row hash-matches the SAME DuckDB
  * oracle as `x2_ivfpq_search`).
  *
  * Writes are plain overwrite-mode parquet: per-table `_SUCCESS`
  * markers gate partial dirs ([[load]] requires them), and the whole
  * index is rebuilt atomically-enough for the single-writer batch jobs
  * that build indexes — concurrent builders of the SAME dir are out of
  * contract (the q38 Bucketing caveat, documented not locked).
  */
object IndexStore {

  /** Train (sample-bounded), assign, encode, persist. One corpus scan
    * for the count-free path (nlist/m/k fixed), plus the bounded
    * training collects of [[Similarity.pqTrainD]]/[[Similarity.centroids]].
    * The codebooks are RESIDUAL codebooks (canonical IVFADC, since the
    * v4 layout): they quantize `x − centroid(cluster(x))`
    * ([[Similarity.ivfResiduals]]), and the stored codes describe each
    * vector's within-cell displacement. */
  def buildIvfPq(emb: DataFrame, dir: String, nlist: Int = 16, m: Int = 4,
      k: Int = 16, iters: Int = 1): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = Similarity.coarseCentroids(emb, nlist)
    val resid = Similarity.ivfResiduals(emb, cents)
    val (sub, books) = Similarity.pqTrainD(
      resid.select(col("vec_id"), col("v")), m, k, iters).getOrElse(
      throw new IllegalArgumentException("buildIvfPq: empty corpus"))
    cents.toSeq.map { case (cid, cv, cn) => (cid, cv.toSeq, cn) }
      .toDF("cid", "centroid", "norm")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    books.zipWithIndex.flatMap { case (cb, s) =>
      cb.zipWithIndex.map { case (cv, c) => (s, c, cv.toSeq) }
    }.toSeq.toDF("subspace", "code", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    writeCodesWithStats(
      Similarity.pqEncodeD(resid, sub, books, keep = Seq("cluster")),
      dir, batchId = 0)
    Seq((nlist, m, k, sub, books.head.head.length * m))
      .toDF("nlist", "m", "k", "sub", "dim")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Land one encoded batch as `codes/batch_id=N` (err column dropped —
    * 8 bytes/row would double the m-bytes/row 100 TB table) AND its
    * drift-monitor row as `stats/batch_id=N` (n, mean_err, max_err —
    * 1 row). The stats row is what [[graft.operators.IndexDriftSpec]]'s
    * reconstruction-error tripwire reads in production form — a drifted
    * drop encodes ~65× worse than the training batch, and the number is
    * QUERYABLE index state (`spark.read.json(dir + "/stats")`, charted
    * over batch_id), not a spec-only measurement.
    *
    * Cost discipline, measured on the per-call streaming row
    * (xs_index_stream, 3 micro-batches/call): a persist + separate agg
    * job cost ~1 s/call, and even `observe()` leaves a 1-row parquet
    * write as a full Spark job per batch. So the aggregate rides the
    * codes write via `observe()` (computed DURING the one write job —
    * zero extra passes) and the driver-resident result lands as a
    * 1-line JSON file through the Hadoop FS API: zero extra Spark jobs.
    * Temp-name + rename keeps a crash from leaving a half-written line
    * (dot-prefixed temp is invisible to Spark readers anyway), and
    * overwrite-by-batch replay discipline matches the codes. */
  private def writeCodesWithStats(encoded: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = encoded.sparkSession
    val obs = org.apache.spark.sql.Observation(s"graft-encode-$batchId-${System.nanoTime()}")
    encoded
      .observe(obs, count(lit(1)).as("n"), avg(col("err")).as("mean_err"),
        max(col("err")).as("max_err"))
      .drop("err")
      .write.mode("overwrite").parquet(s"$dir/codes/batch_id=$batchId")
    val m = obs.get
    val n = m("n").asInstanceOf[Long]
    def d(key: String): Double = m(key) match {
      case null => 0.0 // empty batch: no err samples
      case x: java.lang.Double => x.doubleValue()
    }
    val statsDir = new org.apache.hadoop.fs.Path(s"$dir/stats/batch_id=$batchId")
    val fs = statsDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(statsDir, true) // replay overwrites the batch, like the codes
    val tmp = new org.apache.hadoop.fs.Path(statsDir, ".stats.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(
      s"""{"n":$n,"mean_err":${d("mean_err")},"max_err":${d("max_err")}}\n"""
        .getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, new org.apache.hadoop.fs.Path(statsDir, "stats.json")),
      s"IndexStore: landing $statsDir/stats.json failed")
  }

  /** Logical delete — the tombstone half of index maintenance (SemDeDup
    * pipelines delete aggressively, and a 100 TB index cannot rewrite
    * corpus-sized codes per delete). Deleted vec_ids land as
    * `tombstones/batch_id=<id>/` (ids only, 8 bytes/row) under the same
    * overwrite-by-batch discipline as [[appendIvfPq]], so at-least-once
    * delivery of a delete batch lands exactly-once. [[searchIvfPq]]
    * anti-joins the codes scan against every committed tombstone batch
    * (an id-only join — AQE broadcasts it while deletes are small, and
    * it stays a keyed shuffle, never a rewrite, when they are not);
    * [[compactIvfPq]] makes the deletes physical and clears the
    * tombstones. */
  def deleteIvfPq(ids: DataFrame, dir: String, batchId: Long): Unit =
    ids.select(col("vec_id").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/tombstones/batch_id=$batchId")

  /** Physical maintenance — the missing half of [[appendIvfPq]]: a year
    * of streaming appends is the small-files problem at exactly the
    * scale the index exists for (one `codes/batch_id=N/` dir per
    * micro-batch), and tombstones accumulate query-time anti-join work.
    * Compaction folds every committed codes batch with id ≤ `upTo`
    * MINUS the tombstones into a single `batch_id=0` partitioned to
    * ~`targetBytes` files (sized from the measured on-disk footprint,
    * not a row count — no extra corpus scan). Batches above `upTo` are
    * untouched — the streaming caller passes the checkpoint-derived
    * `upTo = batchId − 1` ([[graft.streaming.IndexStream]]): those
    * batches are committed and can never replay, so folding them can
    * never race a replayed append (the CurateStream /
    * `Maintenance.compactBatchStore` replay contract).
    *
    * Crash posture — the staged-marker plan:
    *  1. stage the folded+filtered codes to `codes__compact/batch_id=0`
    *     (its own `_SUCCESS`);
    *  2. write `_compacting` listing exactly the fold + tombstone
    *     batch dirs to remove — from here until step 5,
    *     [[searchIvfPq]] REFUSES the index (a half-deleted fold set
    *     must never be silently served);
    *  3. delete the listed dirs; 4. rename the staging batch in as the
    *     new `batch_id=0`; 5. remove the marker.
    * A crash before 2 leaves a dead staging dir (overwritten by the
    * next attempt, index never degraded); a crash in 3-5 strands the
    * marker, and the next [[compactIvfPq]] call FINISHES the
    * interrupted plan from the marker before doing anything else
    * (streaming replay re-runs the compaction batch, which is exactly
    * that call). Tombstones are cleared only when every live batch is
    * folded (always true for the streaming `upTo = batchId − 1` call,
    * where batch `batchId` appends after); a partial fold keeps them
    * so deleted ids in kept batches stay excluded. Single-writer by
    * contract like every other mutation here ([[ensureIndexFor]]).
    * Search results are identical before and after ([[IndexStoreSpec]]
    * proves row equality, including across a simulated mid-plan
    * crash). `stats/` (the per-batch drift-monitor history,
    * [[writeCodesWithStats]]) is deliberately NOT folded: it is a log
    * of encode quality per original drop — 1 row per batch — and its
    * value is the time series; compacting the serving table must not
    * erase the monitoring history. */
  def compactIvfPq(spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20, upTo: Long = Long.MaxValue): Unit = {
    require(upTo >= 0, s"IndexStore: upTo must cover the build batch 0, got $upTo")
    val codesRoot = new org.apache.hadoop.fs.Path(s"$dir/codes")
    val fs = codesRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    resumeCompaction(spark, dir) // finish a stranded plan first
    require(fs.exists(codesRoot), s"IndexStore: $codesRoot missing — nothing to compact")
    def batchIds(root: org.apache.hadoop.fs.Path): Seq[Long] =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch_id="))
        .map(_.getPath.getName.stripPrefix("batch_id=").toLong)
    val all = batchIds(codesRoot)
    val fold = all.filter(_ <= upTo).sorted
    if (fold.isEmpty) return
    for (b <- fold)
      require(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/codes/batch_id=$b/_SUCCESS")),
        s"IndexStore: codes/batch_id=$b partially written (no _SUCCESS) — cannot fold a torn batch")
    val foldAll = fold.size == all.size
    val tombs = if (foldAll) batchIds(new org.apache.hadoop.fs.Path(s"$dir/tombstones")) else Seq.empty
    // 1. stage: folded batches minus tombstones, sized from disk footprint
    val bytes = fold.map(b =>
      fs.getContentSummary(new org.apache.hadoop.fs.Path(s"$dir/codes/batch_id=$b")).getLength).sum
    val nParts = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val staging = new org.apache.hadoop.fs.Path(s"$dir/codes__compact")
    fs.delete(staging, true) // a dead prior pre-marker attempt
    val live = tombstoneFilter(spark, dir,
      spark.read.parquet(s"$dir/codes")
        .filter(col("batch_id").isin(fold: _*)).drop("batch_id"))
    live.repartition(nParts)
      .write.mode("overwrite").parquet(s"$staging/batch_id=0")
    // 2. marker: the exact removal list (search refuses from here on)
    writeMarker(fs, dir, fold, tombs)
    finishCompaction(spark, dir, fold, tombs)
  }

  /** Steps 3-5 of the compaction plan (see [[compactIvfPq]]) —
    * idempotent, so a stranded plan can re-run it verbatim. */
  private def finishCompaction(spark: SparkSession, dir: String,
      fold: Seq[Long], tombs: Seq[Long]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (b <- fold) fs.delete(new org.apache.hadoop.fs.Path(s"$dir/codes/batch_id=$b"), true)
    for (b <- tombs) fs.delete(new org.apache.hadoop.fs.Path(s"$dir/tombstones/batch_id=$b"), true)
    val tombRoot = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    if (fs.exists(tombRoot) &&
        !fs.listStatus(tombRoot).exists(_.getPath.getName.startsWith("batch_id=")))
      fs.delete(tombRoot, true) // drained: drop the root so "no tombstones" is visible
    val stagedBatch = new org.apache.hadoop.fs.Path(s"$dir/codes__compact/batch_id=0")
    require(fs.rename(stagedBatch, new org.apache.hadoop.fs.Path(s"$dir/codes/batch_id=0")),
      s"IndexStore: rename $stagedBatch into codes/ failed")
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/codes__compact"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$CompactingMarker"), true)
  }

  private[operators] val CompactingMarker = "_compacting"

  private def writeMarker(fs: org.apache.hadoop.fs.FileSystem, dir: String,
      fold: Seq[Long], tombs: Seq[Long]): Unit = {
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/$CompactingMarker"), true)
    try out.write(s"fold:${fold.mkString(",")}|tomb:${tombs.mkString(",")}".getBytes("UTF-8"))
    finally out.close()
  }

  /** Finish an interrupted compaction if `_compacting` is stranded.
    * The marker is written only AFTER the staging batch is complete
    * (plan step 2), so resume = re-run the idempotent steps 3-5: the
    * already-deleted dirs no-op, the staged batch renames in, the
    * marker clears. If the rename already happened (staging gone, a
    * crash between 4 and 5), only the marker is left to clear. */
  private def resumeCompaction(spark: SparkSession, dir: String): Unit = {
    val marker = new org.apache.hadoop.fs.Path(s"$dir/$CompactingMarker")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) return
    val in = fs.open(marker)
    val txt = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    def ids(part: String): Seq[Long] = {
      val body = part.split(":", 2).lift(1).getOrElse("")
      if (body.isEmpty) Seq.empty else body.split(",").toSeq.map(_.toLong)
    }
    val Array(foldPart, tombPart) = txt.split("\\|", 2)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$dir/codes__compact/batch_id=0/_SUCCESS")))
      finishCompaction(spark, dir, ids(foldPart), ids(tombPart))
    else // crash between rename (4) and marker clear (5)
      fs.delete(marker, true)
  }

  /** Anti-join `codes` against every committed tombstone batch (no-op
    * when no tombstones exist). Every batch dir must carry `_SUCCESS` —
    * a torn delete batch is refused like a torn append: serving it
    * would silently resurrect half a delete. */
  private def tombstoneFilter(spark: SparkSession, dir: String,
      codes: DataFrame): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return codes
    val batches = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch_id="))
    if (batches.isEmpty) return codes
    for (b <- batches)
      require(fs.exists(new org.apache.hadoop.fs.Path(b.getPath, "_SUCCESS")),
        s"IndexStore: ${b.getPath} partially written (no _SUCCESS) — re-run the delete for that batch")
    codes.join(
      spark.read.schema("vec_id BIGINT, batch_id BIGINT")
        .parquet(s"$dir/tombstones").select("vec_id"),
      Seq("vec_id"), "left_anti")
  }

  /** Incremental maintenance — the FAISS `add()` shape: encode NEW
    * vectors against the FROZEN centroids/codebooks (one bounded reload
    * + one map-only pass over the batch, never the existing corpus) and
    * land them as `codes/batch_id=<id>/`. Codebooks are deliberately
    * not retrained (PQ practice: the sampled training distribution
    * stands for the stream; re-training would silently re-mean every
    * EXISTING code's semantics — rebuild via [[buildIvfPq]] when drift
    * demands it). Re-appending a batch id OVERWRITES that directory:
    * at-least-once upstream delivery lands exactly-once in the index —
    * the CurateStream batch-store replay discipline. */
  def appendIvfPq(emb: DataFrame, dir: String, batchId: Long): Unit = {
    require(batchId > 0, s"appendIvfPq: batchId must be > 0 (0 is the build batch), got $batchId")
    val spark = emb.sparkSession
    val (_, _, _, sub, cents, books) = loadCached(spark, dir)
    writeCodesWithStats(
      Similarity.pqEncodeD(Similarity.ivfResiduals(emb, cents), sub, books,
        keep = Seq("cluster")), dir, batchId)
  }

  private def requireTable(spark: SparkSession, dir: String, t: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$t/_SUCCESS")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"IndexStore: $dir/$t missing or partially written (no _SUCCESS) — rebuild the index")
    s"$dir/$t"
  }

  /** Driver-side cache of the bounded index state — the "query-many"
    * half of build-once/query-many: a production ANN server holds
    * centroids/codebooks in memory and does NOT re-read them per query
    * (FAISS keeps the whole index resident; here only the bounded
    * state is, ~nlist×dim + m×k×sub doubles, KBs at the declared
    * configs). Keyed by dir, validated by a filesystem signature over
    * the three state tables (file name:length:mtime per file), so a
    * REBUILD into the same dir — the only operation that rewrites
    * state; [[appendIvfPq]]/[[deleteIvfPq]]/[[compactIvfPq]] touch
    * only codes/tombstones/stats — changes the signature and forces a
    * reload. Bounded at [[StateCacheMax]] dirs (state is KBs; the
    * bound is a leak guard, not a memory budget), cleared wholesale on
    * overflow. Single-JVM like every IndexStore mutation contract;
    * cross-JVM rebuild visibility rides the signature, not the cache.
    * [[IndexStoreSpec]] pins hit/invalidate behavior via
    * [[stateLoads]]. */
  private val stateCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String,
      (Int, Int, Int, Int, Array[(Long, Array[Double], Double)], Array[Array[Array[Double]]]))]
  private val StateCacheMax = 16
  private[operators] val stateLoads = new java.util.concurrent.atomic.AtomicLong

  private def stateSignature(spark: SparkSession, dir: String): String = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("meta", "centroids", "codebooks").map { t =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$t")
      if (!fs.exists(p)) s"$t:absent"
      else fs.listStatus(p).filter(_.isFile).sortBy(_.getPath.getName)
        .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
        .mkString(s"$t[", ",", "]")
    }.mkString("|")
  }

  private[operators] def loadCached(spark: SparkSession, dir: String)
      : (Int, Int, Int, Int, Array[(Long, Array[Double], Double)], Array[Array[Array[Double]]]) = {
    val sig = stateSignature(spark, dir)
    val hit = stateCache.get(dir)
    if (hit != null && hit._1 == sig) hit._2
    else {
      val state = load(spark, dir)
      if (stateCache.size >= StateCacheMax) stateCache.clear()
      stateCache.put(dir, (sig, state))
      state
    }
  }

  /** Bounded index state reloaded from disk: (meta, centroids, books).
    * Read schemas are EXPLICIT (they are this store's write contract,
    * fixed at [[buildIvfPq]]): parquet schema inference costs one Spark
    * job per read, and these three reloads run on every append — a
    * streaming micro-batch path where per-batch job count is latency
    * ([[IndexStoreSpec]] pins the total at 3 reloads + 1 encode+write). */
  private[operators] def load(spark: SparkSession, dir: String)
      : (Int, Int, Int, Int, Array[(Long, Array[Double], Double)], Array[Array[Array[Double]]]) = {
    import spark.implicits._
    stateLoads.incrementAndGet()
    val meta = spark.read
      .schema("nlist INT, m INT, k INT, sub INT, dim INT")
      .parquet(requireTable(spark, dir, "meta"))
      .select("nlist", "m", "k", "sub").as[(Int, Int, Int, Int)].head()
    val (nlist, m, k, sub) = meta
    val cents = spark.read
      .schema("cid BIGINT, centroid ARRAY<DOUBLE>, norm DOUBLE")
      .parquet(requireTable(spark, dir, "centroids"))
      .select("cid", "centroid", "norm").as[(Long, Array[Double], Double)]
      .collect().sortBy(_._1)
    require(cents.length == nlist, s"IndexStore: ${cents.length} centroids, meta says $nlist")
    val bookRows = spark.read
      .schema("subspace INT, code INT, vec ARRAY<DOUBLE>")
      .parquet(requireTable(spark, dir, "codebooks"))
      .select("subspace", "code", "vec").as[(Int, Int, Array[Double])].collect()
    require(bookRows.length == m * k, s"IndexStore: ${bookRows.length} codewords, meta says ${m * k}")
    val books = Array.ofDim[Array[Double]](m, k)
    bookRows.foreach { case (s, c, v) => books(s)(c) = v }
    (nlist, m, k, sub, cents, books.map(_.toArray))
  }

  /** Query the persisted index: probe routing against the reloaded
    * centroids (probe-sized broadcast), candidate join on cluster id
    * against the stored codes (the only corpus-sized scan — m ints per
    * row, no embedding column), ADC + bounded top-k exactly as the
    * in-memory path. */
  def searchIvfPq(spark: SparkSession, dir: String, probes: DataFrame,
      nprobe: Int = 4, topK: Int = 5): DataFrame = {
    val markerPath = new org.apache.hadoop.fs.Path(s"$dir/$CompactingMarker")
    require(!markerPath.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(markerPath),
      s"IndexStore: $dir has a stranded compaction ($CompactingMarker present) — " +
        "a half-deleted fold set must never be served; re-run compactIvfPq to finish the plan")
    val (_, m, _, sub, cents, books) = loadCached(spark, dir)
    // codes/ is batch-partitioned (batch_id=N per build/append); every
    // batch must carry its own commit marker — a torn append is refused
    // as a whole rather than silently serving half a batch
    val codesRoot = new org.apache.hadoop.fs.Path(s"$dir/codes")
    val fs = codesRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(codesRoot), s"IndexStore: $codesRoot missing — build the index first")
    val batches = fs.listStatus(codesRoot)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch_id="))
    require(batches.nonEmpty, s"IndexStore: $codesRoot has no batches — build the index first")
    for (b <- batches)
      require(fs.exists(new org.apache.hadoop.fs.Path(b.getPath, "_SUCCESS")),
        s"IndexStore: ${b.getPath} partially written (no _SUCCESS) — re-run the append for that batch")
    // explicit schema (the store's own write contract, m from meta):
    // schema inference on a schemaless read is one extra Spark job per
    // QUERY on the serving path
    val codeSchema = "vec_id BIGINT, cluster BIGINT, " +
      (0 until m).map(s => s"code_$s INT").mkString(", ") + ", batch_id BIGINT"
    val codes = tombstoneFilter(spark, dir,
        spark.read.schema(codeSchema).parquet(s"$dir/codes"))
      .withColumn("codes", array((0 until m).map(s => col(s"code_$s").cast(IntegerType)): _*))
    val routes = Similarity.probeRoutes(probes, cents, nprobe)
    val pc = Similarity.routesDf(spark, routes)
    Similarity.adcRankResidual(codes.join(broadcast(pc), Seq("cluster")),
      routes, cents, books, sub, topK)
  }

  // ----------------------------------------------------------- declared
  /** Build-once/query-many as a driver-checked row: builds the index
    * into a fingerprint-keyed warehouse dir (re-used across passes, the
    * q38 amortization discipline — the BUILD is the one-time 100 TB
    * scan, so benching it per-pass would measure the wrong thing), then
    * serves the same 10 probes as `x2_ivfpq_search` from the stored
    * codes. Same oracle: the round-trip must be invisible. */
  private[operators] def x2IvfPqPersisted(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val ixDir = ensureIndexFor(spark, s"$dir/embeddings.parquet", "emb-n16m4k16",
      d => buildIvfPq(graft.core.Tables.load(spark, dir, "embeddings"), d, 16, 4, 16, 1))
    searchIvfPq(spark, ixDir, emb.filter(col("vec_id") < 10), 4, 5)
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** Warehouse location keyed on the SOURCE fixture's content
    * fingerprint (size + mtime + part count, directory-aware like
    * q38's); `build` runs on first use, later calls reuse the dir.
    *
    * The FULL fingerprint string (sanitized) is embedded in the dir
    * name — a 32-bit hash would let a cross-fixture collision make the
    * marker check fail both ways and rebuild on every pass (ADVICE
    * r11). The marker still exists and still carries the fingerprint:
    * the dir name proves which source the dir is FOR, the marker proves
    * the build COMPLETED for exactly that source+layout (a crashed
    * build leaves a dir with no marker → rebuilt, and a marker written
    * by an older layout version mismatches → rebuilt). `tag` keys the
    * index family AND its build parameters (callers embed nlist/m/k —
    * e.g. `emb-n16m4k16` — so a code-level config change can never
    * serve an index built under the old config; the fingerprint only
    * sees the source fixture).
    *
    * Single-writer, single-JVM by contract: the check-then-build
    * marker protocol is not atomic across concurrent JVMs sharing
    * `java.io.tmpdir` — exactly the q38 Bucketing caveat (two writers
    * racing the same warehouse dir are out of contract; the loser's
    * half-built dir is refused by the marker/`_SUCCESS` gates, never
    * silently served). [[IndexStoreSpec]] pins the rebuild-on-mismatch
    * behavior. */
  private[graft] def ensureIndexFor(spark: SparkSession, srcPath: String,
      tag: String, build: String => Unit): String = {
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(src), s"IndexStore: fixture $src missing")
    val st = fs.getFileStatus(src)
    // "v4" = the on-disk LAYOUT version (v2 added batch-partitioned
    // codes/, v3 added tombstones + compaction, v4 switched the
    // codebooks/codes to IVF-RESIDUAL encoding): bumping it invalidates
    // markers written by an older layout, so a layout change rebuilds
    // instead of serving codes whose SEMANTICS the reader would
    // misinterpret (raw-vector codes scored against residual LUTs)
    val fp = "v4:" + (
      if (st.isDirectory) {
        val parts = fs.listStatus(src).filter(_.isFile).sortBy(_.getPath.getName)
        s"${parts.map(_.getLen).sum}:${parts.map(_.getModificationTime).max}:${parts.length}"
      } else s"${st.getLen}:${st.getModificationTime}")
    val ixDir = s"${sys.props("java.io.tmpdir")}/graft-ivfpq-$tag-" +
      fp.replaceAll("[^A-Za-z0-9]", "-")
    val marker = new org.apache.hadoop.fs.Path(s"$ixDir/_graft_fingerprint")
    val ok = fs.exists(marker) && {
      val in = fs.open(marker)
      val read = try scala.io.Source.fromInputStream(in).mkString finally in.close()
      read == fp
    }
    if (!ok) {
      build(ixDir)
      val out = fs.create(marker, true)
      try out.write(fp.getBytes("UTF-8")) finally out.close()
    }
    ixDir
  }

  /** Delete + compaction as a driver-checked row: build, tombstone the
    * deterministic slice `vec_id ≡ 3 (mod 7)`, COMPACT (deletes made
    * physical, tombstones cleared), then serve the standard 10 probes
    * from the compacted index. The DuckDB oracle replays IVFADC with
    * the exclusion applied to the CANDIDATE set only — training,
    * centroids, and probe routing still see the full corpus, exactly
    * the delete semantics ([[deleteIvfPq]]: a removed vector stops
    * being served; its historical contribution to frozen codebooks is
    * not rewritten). The whole delete → compact → serve path is
    * value-checked, not just spec-equality-checked; probes that are
    * themselves deleted (vec_id 3) still query — a removed document
    * may still be a query — and simply can't retrieve themselves. */
  private[operators] def x2IvfPqDeleted(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val ixDir = ensureIndexFor(spark, s"$dir/embeddings.parquet", "emb-del-n16m4k16", { d =>
      buildIvfPq(emb, d, 16, 4, 16, 1)
      deleteIvfPq(emb.filter(col("vec_id") % 7 === 3), d, batchId = 1)
      compactIvfPq(spark, d)
    })
    searchIvfPq(spark, ixDir, emb.filter(col("vec_id") < 10), 4, 5)
      .orderBy(col("probe_id"), col("rnk"))
  }

  private val x2IvfPqDeletedSql =
    Similarity.ivfPqSearchSqlWith(serveWhere = "WHERE a.vec_id % 7 <> 3")

  /** The BETWEEN-compactions serving path: same deterministic delete
    * slice as [[x2IvfPqDeleted]] but NOT compacted — queries anti-join
    * the live tombstone batches at serve time, which is what a
    * production index does for most of its life (compaction is
    * periodic maintenance, not a prerequisite for correct deletes).
    * Hash-matches the SAME oracle as the compacted row: logical and
    * physical deletion must be indistinguishable to a reader. */
  private[operators] def x2IvfPqTombstoned(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val ixDir = ensureIndexFor(spark, s"$dir/embeddings.parquet", "emb-tomb-n16m4k16", { d =>
      buildIvfPq(emb, d, 16, 4, 16, 1)
      deleteIvfPq(emb.filter(col("vec_id") % 7 === 3), d, batchId = 1)
    })
    searchIvfPq(spark, ixDir, emb.filter(col("vec_id") < 10), 4, 5)
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** Refined retrieval SERVED FROM THE STORE — the production shape of
    * `x2_ivfpq_refined`, closing the same composed-vs-serving gap the
    * text tier closed with `xt_hashvec_persisted`: the shortK-deep ADC
    * shortlist comes from [[searchIvfPq]] (no training, codes-only
    * scan; shares the very index `x2_ivfpq_persisted` built), and only
    * the shortlist's full vectors are fetched for the exact re-rank
    * ([[Similarity.exactRerank]] — at 100 TB the full-vector table is
    * the point-lookup store the refine tier reads, here the fixture
    * itself via a broadcast semi-join). Same oracle as the composed
    * row: the store must be invisible to the refined results too. */
  private[operators] def x2IvfPqRefinedPersisted(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val probes = emb.filter(col("vec_id") < 10)
    val ixDir = ensureIndexFor(spark, s"$dir/embeddings.parquet", "emb-n16m4k16",
      d => buildIvfPq(graft.core.Tables.load(spark, dir, "embeddings"), d, 16, 4, 16, 1))
    Similarity.exactRerank(searchIvfPq(spark, ixDir, probes, 4, 20), emb, probes, 5)
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** The drift monitor as a driver-checked row: build on the first half
    * of the corpus (batch 0 trains), append the second half against the
    * FROZEN codebooks (batch 1 — the [[appendIvfPq]] contract), then
    * read the persisted `stats/` artifact itself. The DuckDB oracle
    * replays training-on-half + encode-all and aggregates
    * reconstruction error per batch ([[Similarity.x2IndexStatsSql]]),
    * so the monitoring tier — not just the serving tier — is
    * value-checked end to end: n exactly, mean/max err under the
    * driver's 4-dp compare (the [[Similarity.pqCodes]] err parity
    * class). At 100 TB this artifact is the rebuild-decision input
    * ([[graft.operators.IndexDriftSpec]] pins the ≥10× drifted-batch
    * jump); here it is proven to hold the numbers the declared
    * semantics say it holds. */
  private[operators] def x2IndexStats(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val ixDir = ensureIndexFor(spark, s"$dir/embeddings.parquet", "emb-stats-n16m4k16", { d =>
      // the split point is only needed on first build — counting here
      // keeps warehouse-cached serves job-free up to the stats read
      val h = emb.count() / 2
      buildIvfPq(emb.filter(col("vec_id") < h), d, 16, 4, 16, 1)
      appendIvfPq(emb.filter(col("vec_id") >= h), d, batchId = 1)
    })
    spark.read.schema("n BIGINT, mean_err DOUBLE, max_err DOUBLE, batch_id BIGINT")
      .json(s"$ixDir/stats")
      .select(col("batch_id"), col("n"), col("mean_err"), col("max_err"))
      .orderBy("batch_id")
  }

  val all: Seq[Declared] = Seq(
    Declared("x2_ivfpq_persisted", x2IvfPqPersisted, Some(Similarity.x2IvfPqSearchSql)),
    Declared("x2_ivfpq_deleted", x2IvfPqDeleted, Some(x2IvfPqDeletedSql)),
    Declared("x2_ivfpq_tombstoned", x2IvfPqTombstoned, Some(x2IvfPqDeletedSql)),
    Declared("x2_ivfpq_refined_persisted", x2IvfPqRefinedPersisted,
      Some(Similarity.x2IvfPqRefinedSql)),
    Declared("x2_index_stats", x2IndexStats, Some(Similarity.x2IndexStatsSql)))
}
