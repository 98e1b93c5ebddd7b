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
  * Visibility protocol (since the v5 layout): a single
  * `manifest.json` — swapped by ATOMIC RENAME — lists the live
  * codes/tombstone batch ids plus a per-build nonce. Readers resolve
  * the whole index from that one driver-side file read (O(1) serving
  * metadata: no directory listings, no per-batch `_SUCCESS` probes —
  * on the object stores a 100 TB index lives on, per-query listings
  * are latency AND request cost), and writers only ever reference
  * `_SUCCESS`-complete batches from a manifest (checked once, at
  * commit time). A batch written but not yet committed — the torn
  * append/delete shape — is simply invisible; a crashed compaction
  * leaves orphan dirs the next compaction garbage-collects; readers
  * during compaction keep serving the pre-swap snapshot instead of
  * being refused. Even a REBUILD into a live dir is invisible until
  * its commit: state lands under a fresh `state/<nonce>/` generation
  * and the build batch under a fresh id, so there is NO
  * read-unavailability window anywhere in the protocol. Single-writer
  * per index dir by contract (the q38 Bucketing caveat, documented
  * not locked); per-table `_SUCCESS` still gates the bounded state
  * tables ([[load]]).
  *
  * Snapshot grace period: dirs a compaction supersedes are NOT deleted
  * by the compaction that supersedes them — they become orphans the
  * NEXT compaction's GC reclaims (the Iceberg expire-snapshots split:
  * swapping the manifest is the commit, reclaiming storage is separate
  * maintenance). A reader that resolved the old manifest therefore has
  * a full compaction cycle to finish its scan.
  */
object IndexStore {

  /** Train (sample-bounded), assign, encode, persist. One corpus scan
    * for the count-free path (nlist/m/k fixed), plus the bounded
    * training collects of [[Similarity.pqTrainD]]/[[Similarity.centroids]].
    * The codebooks are RESIDUAL codebooks (canonical IVFADC, since the
    * v4 layout): they quantize `x − centroid(cluster(x))`
    * ([[Similarity.ivfResiduals]]), and the stored codes describe each
    * vector's within-cell displacement.
    *
    * `subsume` > 0 marks this build as a mid-stream REBUILD: the given
    * corpus covers every streaming batch ≤ `subsume`, so their
    * replayed appends no-op (see [[Manifest.subsumed]];
    * [[graft.streaming.IndexStream]]'s `rebuildWhen` drift hook is the
    * caller).
    *
    * A rebuild into a LIVE dir is atomic like every other mutation
    * here: state lands under a fresh generation dir
    * (`state/<nonce>/`), the build batch under a fresh id that cannot
    * collide with the prior generation's, and the manifest swap is the
    * commit — readers keep serving the old generation until then, a
    * crash strands only orphans, and the superseded generation
    * survives as the usual snapshot grace period. (Through v5 a
    * rebuild overwrote state in place and had to RETRACT the manifest
    * first — the one read-unavailability window in the protocol; v6
    * closed it.)
    *
    * Deletes survive a rebuild: the build corpus is anti-joined
    * against the prior manifest's LIVE tombstones here, inside the
    * build, so a direct rebuild over an unfiltered upstream corpus
    * cannot resurrect vectors a deletion (SemDeDup rejection, a
    * compliance removal) already retracted — without the guard, a
    * caller who forgot the [[liveVecIds]] pre-filter would silently
    * re-serve them. The rebuild's manifest then carries NO tombstones:
    * like compaction, a rebuild makes prior deletes physical (the ids
    * never enter the new generation's codes). [[graft.streaming.IndexStream.maintain]]'s
    * live-id pin keeps being applied upstream too — there the
    * anti-join is a no-op by construction. Tombstone batches are bare
    * vec_id lists (format stable since the v3 layout), so the guard
    * also holds across layout upgrades (below).
    *
    * An OLDER-layout manifest in `dir` does not refuse the rebuild
    * (readers must refuse old codes — their semantics differ — but the
    * rebuild is exactly the remedy the refusal message prescribes, so
    * refusing here would be circular; ADVICE r13): the prior manifest
    * is parsed laxly, its tombstones still honored and its batch ids
    * still avoided, and everything else it owned becomes orphans for
    * the next maintenance GC. */
  def buildIvfPq(emb: DataFrame, dir: String, nlist: Int = 16, m: Int = 4,
      k: Int = 16, iters: Int = 1, subsume: Long = 0L): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    // lax parse (no layout gate): a rebuild never READS prior codes or
    // state, only the id namespace and the tombstone lists — both
    // layout-stable — and rebuilding is precisely how an older-layout
    // dir upgrades in place
    val prior = if (hasManifest(spark, dir)) Some(parseManifest(spark, dir)) else None
    val nonce = java.util.UUID.randomUUID().toString
    val stateDir = s"$dir/state/$nonce"
    // fresh dir → the canonical batch 0; rebuild → a fresh NEGATIVE id
    // (the fold-id discipline: invisible until committed, can never
    // collide with a live batch or a future positive append id)
    val builtId = prior.map(_.codes.filter(_ < 0).minOption.getOrElse(0L) - 1)
      .getOrElse(0L)
    val corpus = prior.map(p => tombstoneFilter(spark, dir, p, emb)).getOrElse(emb)
    val cents = Similarity.coarseCentroids(corpus, nlist)
    val resid = Similarity.ivfResiduals(corpus, cents)
    val (sub, books) = Similarity.pqTrainD(
      resid.select(col("vec_id"), col("v")), m, k, iters).getOrElse(
      throw new IllegalArgumentException("buildIvfPq: empty corpus"))
    // k-means can only mint as many codewords as the training slice has
    // points: persisting fewer than meta's k would write an index every
    // later load refuses ("N codewords, meta says m*k") — fail at BUILD
    // time with the remedy instead
    require(books.forall(_.length == k),
      s"buildIvfPq: training yielded only ${books.map(_.length).min} codewords " +
        s"in some subspace (corpus too small/degenerate for k=$k) — lower k " +
        "or grow the corpus")
    cents.toSeq.map { case (cid, cv, cn) => (cid, cv.toSeq, cn) }
      .toDF("cid", "centroid", "norm")
      .coalesce(1).write.mode("overwrite").parquet(s"$stateDir/centroids")
    books.zipWithIndex.flatMap { case (cb, s) =>
      cb.zipWithIndex.map { case (cv, c) => (s, c, cv.toSeq) }
    }.toSeq.toDF("subspace", "code", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$stateDir/codebooks")
    writeCodesWithStats(
      Similarity.pqEncodeD(resid, sub, books, keep = Seq("cluster")),
      dir, batchId = builtId)
    Seq((nlist, m, k, sub, books.head.head.length * m))
      .toDF("nlist", "m", "k", "sub", "dim")
      .coalesce(1).write.mode("overwrite").parquet(s"$stateDir/meta")
    // the build COMMIT: one atomic swap — the fresh nonce addresses the
    // new generation's state (and is the content token the driver state
    // cache keys on), exactly the build batch is live, and everything
    // the previous generation owned becomes orphans for the next
    // compaction's GC
    writeManifest(spark, dir, Manifest(LayoutVersion, nonce,
      Seq(builtId), Nil, subsumed = subsume, built = builtId))
  }

  /** Does `dir` hold a committed index? (False = never built, or a
    * fresh build's first commit has not landed yet.) */
  private[graft] def hasManifest(spark: SparkSession, dir: String): Boolean = {
    val p = manifestPath(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
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
      // Num.sumE6, not davg(double) (VERDICT r18 #1, the xs_dsir_drift
      // class): the DRIVER-HASHED statistic must be an integer —
      // Σ round(err·1e6) is order-independent and immune to any
      // engine's double formatting/canonicalization; mean_err derives
      // from it by the same IEEE division in both engines (the
      // x2_index_stats oracle mirrors via Num.sqlSumE6/sqlMeanFromE6).
      // max is order-independent already and stays under the driver's
      // 4-dp compare.
      .observe(obs, count(lit(1)).as("n"),
        graft.core.Num.sumE6(col("err")).as("sum_err_e6"),
        max(col("err")).as("max_err"))
      .drop("err")
      .write.mode("overwrite").parquet(s"$dir/codes/batch_id=$batchId")
    val m = obs.get
    val n = m("n").asInstanceOf[Long]
    val sumErrE6 = m("sum_err_e6") match {
      case null => 0L // empty batch: no err samples
      case x: java.lang.Long => x.longValue()
    }
    val maxErr = m("max_err") match {
      case null => 0.0
      case x: java.lang.Double => x.doubleValue()
    }
    // mean_err stays landed full-precision for driftBreached and human
    // telemetry — derived from the integer carrier exactly as the
    // declared row derives it
    val meanErr = if (n > 0) sumErrE6.toDouble / 1e6 / n else 0.0
    val statsDir = new org.apache.hadoop.fs.Path(s"$dir/stats/batch_id=$batchId")
    val fs = statsDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(statsDir, true) // replay overwrites the batch, like the codes
    val tmp = new org.apache.hadoop.fs.Path(statsDir, ".stats.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(
      s"""{"n":$n,"sum_err_e6":$sumErrE6,"mean_err":$meanErr,"max_err":$maxErr}\n"""
        .getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, new org.apache.hadoop.fs.Path(statsDir, "stats.json")),
      s"IndexStore: landing $statsDir/stats.json failed")
  }

  /** The drift tripwire over the persisted stats artifact: did batch
    * `batchId` encode ≥ `factor`× worse (mean reconstruction error)
    * than the CURRENT build's training batch (`stats/batch_id=<built>`
    * from the manifest — a rebuild repoints it, so the baseline always
    * tracks the codebooks actually serving)? Two driver-side 1-line JSON reads,
    * zero Spark jobs — the production cadence is once per micro-batch
    * ([[graft.streaming.IndexStream]]'s `rebuildWhen`). Empty batches
    * and a zero/absent baseline never fire ([[IndexDriftSpec]] pins
    * the ~65× drifted-batch jump this guards against; ≥10× is the
    * declared firing line). */
  private[graft] def driftBreached(spark: SparkSession, dir: String,
      batchId: Long, factor: Double): Boolean = {
    def stat(b: Long): Option[(Long, Double)] = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/stats/batch_id=$b/stats.json")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
        Some((root.get("n").asLong(), root.get("mean_err").asDouble()))
      }
    }
    (stat(readManifest(spark, dir).built), stat(batchId)) match {
      case (Some((n0, e0)), Some((n1, e1))) if n0 > 0 && n1 > 0 && e0 > 0 =>
        e1 >= factor * e0
      case _ => false
    }
  }

  // --------------------------------------------------------- manifest
  /** The index's visibility root: which codes/tombstone batches are
    * LIVE (dirs are `codes/batch_id=<id>`, `tombstones/batch_id=<id>`;
    * compaction folds land under NEGATIVE ids so a fold can never
    * collide with — and be silently overwritten by — a future streaming
    * append's monotone positive batch id), plus the per-build `nonce`
    * that tokens the bounded state tables' content.
    *
    * `subsumed` is the rebuild watermark: a mid-stream REBUILD
    * ([[buildIvfPq]] with `subsume = N`) re-encodes the full upstream
    * corpus — including every batch ≤ N — into its build batch, so a
    * replayed append of any batch ≤ N must land as a NO-OP
    * ([[appendIvfPq]]); without it, a crash between the rebuild and
    * the checkpoint commit would re-append vectors the rebuild already
    * holds and serve them twice.
    *
    * `built` is the build batch's id (0 for a fresh dir, a negative
    * generation id after an in-place rebuild) — the drift monitor's
    * baseline pointer: `stats/batch_id=<built>` is the row describing
    * how the SERVING codebooks encoded their own training corpus. */
  private[graft] case class Manifest(layout: Int, nonce: String,
      codes: Seq[Long], tombstones: Seq[Long], subsumed: Long = 0L,
      built: Long = 0L)

  private[operators] val LayoutVersion = 7
  private[operators] val ManifestName = "manifest.json"

  private def manifestPath(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/$ManifestName")

  /** Lax parse — no layout gate. Only [[buildIvfPq]] may use this:
    * a rebuild reads nothing whose semantics the layout versions (only
    * the id namespace and the layout-stable tombstone lists), and the
    * layout gate would otherwise refuse the very call its message
    * prescribes as the remedy. Unparseable content refuses with the
    * path and remedy in the message (the write path makes this
    * unreachable short of external corruption: the manifest is only
    * ever swapped in by atomic rename of a fully-written temp). */
  private def parseManifest(spark: SparkSession, dir: String): Manifest = {
    val p = manifestPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"IndexStore: $dir has no $ManifestName — build the index first " +
        "(or re-run the interrupted buildIvfPq that retracted it)")
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = om.readTree(txt)
      def ids(field: String): Seq[Long] = {
        val n = root.get(field)
        (0 until n.size()).map(i => n.get(i).asLong())
      }
      Manifest(root.get("layout").asInt(), root.get("nonce").asText(),
        ids("codes"), ids("tombstones"), root.path("subsumed").asLong(0L),
        root.path("built").asLong(0L))
    } catch {
      // the remedy must NOT be "rebuild with buildIvfPq": buildIvfPq
      // itself parses the prior manifest (for the tombstone guard and
      // the id namespace), so that instruction would loop right back
      // here (review r14). Deleting the manifest first is the real
      // escape — stated with its cost.
      case e: Exception => throw new IllegalStateException(
        s"IndexStore: $p is unparseable (${e.getMessage}) — external corruption; " +
          "restore it from a backup, or delete it and rebuild with buildIvfPq " +
          "(deleting the manifest forfeits any pending tombstones: vectors " +
          "deleted but not yet compacted away would re-enter the rebuilt index " +
          "unless the rebuild corpus is pre-filtered)", e)
    }
  }

  /** One driver-side file read — the ENTIRE serving-metadata cost of a
    * query. Readers (and every mutation that reads codes/state) go
    * through HERE: an older-layout manifest refuses, because codes
    * written under another layout have different SEMANTICS (e.g.
    * raw-vector codes scored against residual LUTs). */
  private[graft] def readManifest(spark: SparkSession, dir: String): Manifest = {
    val man = parseManifest(spark, dir)
    require(man.layout == LayoutVersion,
      s"IndexStore: $dir is layout v${man.layout}, this build reads v$LayoutVersion — " +
        "rebuild with buildIvfPq (codes written under another layout have " +
        "different SEMANTICS, e.g. raw-vector codes under residual LUTs)")
    man
  }

  /** Atomic swap: dot-prefixed temp + `FileContext.rename(OVERWRITE)`.
    * `FileContext` (not `FileSystem`) on BOTH write and rename: the
    * plain local `FileSystem` is checksummed and would strand a `.crc`
    * sidecar keyed to the temp name on every swap, and its `rename`
    * refuses an existing destination. Readers see the old manifest or
    * the new one, never a torn one.
    *
    * Atomicity rides the filesystem's rename (POSIX, HDFS). A store
    * WITHOUT atomic rename (S3's copy+delete) needs the commit routed
    * through a conditional PUT or a catalog service — the same split
    * Iceberg makes between its metadata swap and its data files; the
    * data-side protocol here (invisible-until-committed batch dirs,
    * GC'd orphans) carries over unchanged. */
  private def writeManifest(spark: SparkSession, dir: String, m: Manifest): Unit = {
    import org.apache.hadoop.fs.{CreateFlag, FileContext, Options}
    val dst = manifestPath(dir)
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/.$ManifestName.tmp")
    val fc = FileContext.getFileContext(dst.toUri,
      spark.sparkContext.hadoopConfiguration)
    val json =
      s"""{"layout":${m.layout},"nonce":"${m.nonce}",""" +
        s""""codes":[${m.codes.sorted.mkString(",")}],""" +
        s""""tombstones":[${m.tombstones.sorted.mkString(",")}],""" +
        s""""subsumed":${m.subsumed},"built":${m.built}}"""
    val out = fc.create(tmp,
      java.util.EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
      org.apache.hadoop.fs.Options.CreateOpts.createParent())
    try out.write((json + "\n").getBytes("UTF-8")) finally out.close()
    fc.rename(tmp, dst, Options.Rename.OVERWRITE)
  }

  /** Publish a written batch into the manifest — the ONLY way a batch
    * becomes visible. The `_SUCCESS` gate runs HERE, once per commit,
    * instead of per query: a torn write can therefore never be
    * referenced, and readers need no per-batch probes. Idempotent
    * (replayed batch ids union in), like the dir overwrites above it. */
  private[operators] def commitBatch(spark: SparkSession, dir: String,
      codesId: Option[Long] = None, tombId: Option[Long] = None): Unit = {
    val fs = manifestPath(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def committed(table: String, b: Long): Unit = require(
      fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$table/batch_id=$b/_SUCCESS")),
      s"IndexStore: $dir/$table/batch_id=$b is partially written (no _SUCCESS) — " +
        "re-run the write for that batch before committing it")
    codesId.foreach(committed("codes", _))
    tombId.foreach(committed("tombstones", _))
    val man = readManifest(spark, dir)
    writeManifest(spark, dir, man.copy(
      codes = (man.codes ++ codesId).distinct.sorted,
      tombstones = (man.tombstones ++ tombId).distinct.sorted))
  }

  /** Delete every `batch_id=*` dir the manifest does NOT reference —
    * crashed appends/deletes that never committed, folded batches a
    * finished compaction superseded, fold attempts a crash stranded.
    * Run at the START of compaction (never on the append hot path):
    * orphans are invisible to readers by construction, so reclaiming
    * them is pure hygiene and can wait for maintenance. */
  private def gcOrphans(spark: SparkSession, dir: String, man: Manifest,
      minAgeMs: Long = 0L): Unit = {
    val fs = manifestPath(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // The retention gate ([[expireSnapshots]]'s olderThan) keys on
    // ORPHANING time, not write time (ADVICE r15): a generation
    // superseded by a compaction that committed seconds ago has an
    // OLD mtime, so an mtime cutoff would reclaim it immediately and
    // the floor would not protect the primary supersede scenario.
    // Instead, the first GC pass that SIGHTS an orphan stamps a
    // `_GC_SIGHTED` marker inside it (orphans are invisible to
    // current-manifest readers, and the `_` prefix hides the file
    // from Hadoop globs regardless) and spares it; a later pass
    // reclaims it once the SIGHTING is at least minAgeMs old —
    // Iceberg's olderThan, keyed on when the snapshot stopped being
    // current. The clock is filesystem-derived (a probe file's mtime
    // on the same store) so driver/remote-store clock skew cannot
    // widen or collapse the floor.
    lazy val fsNow: Long = {
      val probe = new org.apache.hadoop.fs.Path(s"$dir/._gc_clock_probe")
      fs.create(probe, true).close()
      val t = fs.getFileStatus(probe).getModificationTime
      fs.delete(probe, false)
      t
    }
    // The marker CARRIES its floor (ADVICE r16): a floored expiry pass
    // that sights-and-spares an orphan writes the promised retention
    // into the marker, so a LATER unfloored pass — compaction's hygiene
    // GC, or expireSnapshots() called bare — still honors the promise
    // instead of voiding it. Without this, any compaction between two
    // floored expiry passes reclaimed spared orphans immediately and
    // "retention is a setting, not an operator promise" held only if
    // nothing else ever GC'd. An orphan FIRST sighted by an unfloored
    // pass is reclaimed immediately, as before — the floor protects
    // promises already made, it does not invent one.
    def storedFloor(marker: org.apache.hadoop.fs.Path): Long =
      try {
        val in = fs.open(marker)
        val buf = new Array[Byte](32)
        val n = in.read(buf); in.close()
        if (n <= 0) 0L else new String(buf, 0, n, "US-ASCII").trim.toLong
      } catch { case _: Exception => 0L } // legacy empty marker → no stored floor
    def reclaimable(st: org.apache.hadoop.fs.FileStatus): Boolean = {
      val marker = new org.apache.hadoop.fs.Path(st.getPath, "_GC_SIGHTED")
      if (fs.exists(marker)) {
        // honor the WIDER of the caller's floor and the sighting's own
        val eff = math.max(minAgeMs, storedFloor(marker))
        eff <= 0 || fs.getFileStatus(marker).getModificationTime <= fsNow - eff
      } else if (minAgeMs > 0) { // sighted; record the promise, spare this pass
        val out = fs.create(marker, true)
        out.write(minAgeMs.toString.getBytes("US-ASCII")); out.close()
        false
      } else true
    }
    def sweep(table: String, live: Set[Long]): Unit = {
      val root = new org.apache.hadoop.fs.Path(s"$dir/$table")
      if (fs.exists(root)) {
        fs.listStatus(root)
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch_id="))
          .filterNot(st => live.contains(
            st.getPath.getName.stripPrefix("batch_id=").toLong))
          .filter(reclaimable)
          .foreach(st => fs.delete(st.getPath, true))
        if (live.isEmpty &&
            !fs.listStatus(root).exists(_.getPath.getName.startsWith("batch_id=")))
          fs.delete(root, true) // drained: "no tombstones" stays visible
      }
    }
    sweep("codes", man.codes.toSet)
    sweep("tombstones", man.tombstones.toSet)
    // dead state GENERATIONS: everything but the manifest's nonce
    // (a superseded rebuild's centroids/codebooks/meta, or a crashed
    // rebuild's half-written generation)
    val stateRoot = new org.apache.hadoop.fs.Path(s"$dir/state")
    if (fs.exists(stateRoot))
      fs.listStatus(stateRoot)
        .filter(st => st.isDirectory && st.getPath.getName != man.nonce)
        .filter(reclaimable)
        .foreach(st => fs.delete(st.getPath, true))
  }

  /** Explicit storage reclamation — the Iceberg `expireSnapshots`
    * split, as its own maintenance entry: delete every batch dir and
    * state generation the CURRENT manifest does not reference. Without
    * it, superseded generations are reclaimed only by the next
    * compaction's GC ([[gcOrphans]] runs at the start of
    * [[compactIvfPq]]) — correct, but a rebuild-heavy deployment that
    * compacts rarely holds N dead generations of state + codes between
    * compactions (ADVICE/verdict r13). Calling this COLLAPSES the
    * snapshot grace period: a reader that resolved a pre-rebuild (or
    * pre-compaction) manifest and has not finished its scan loses its
    * files — exactly Iceberg's contract, where snapshot retention is
    * the operator's cadence choice; run it when no reader can hold a
    * stale manifest older than the last commit. Orphans are invisible
    * to every CURRENT-manifest reader by construction, so beyond that
    * grace trade-off this is pure hygiene, idempotent, and never
    * touches the manifest itself.
    *
    * `minAgeMs` > 0 BOUNDS the collapse instead of relying on
    * out-of-band coordination (Iceberg's `olderThan` threshold,
    * ADVICE r14): an orphan is reclaimed only once at least that long
    * has passed since a GC pass FIRST SIGHTED it as an orphan (a
    * `_GC_SIGHTED` marker stamped on first sighting — orphaning time,
    * not dir write time, which for a just-superseded generation is
    * arbitrarily old; ADVICE r15), so "no reader holds a manifest
    * older than X" becomes a retention setting rather than an
    * operator promise. Spared orphans stay invisible and are
    * reclaimed by a later pass once the sighting ages past the
    * floor — so a bounded expiry needs TWO passes at least minAgeMs
    * apart, matching Iceberg's cadence-driven maintenance. The marker
    * CARRIES the promised floor (ADVICE r16), so intervening unfloored
    * GC — [[compactIvfPq]]'s hygiene pass, or a bare expireSnapshots —
    * honors it too; only a pass where the sighting has genuinely aged
    * past max(stored, caller) floor reclaims. */
  def expireSnapshots(spark: SparkSession, dir: String,
      minAgeMs: Long = 0L): Unit =
    gcOrphans(spark, dir, readManifest(spark, dir), minAgeMs)

  /** Logical delete — the tombstone half of index maintenance (SemDeDup
    * pipelines delete aggressively, and a 100 TB index cannot rewrite
    * corpus-sized codes per delete). Deleted vec_ids land as
    * `tombstones/batch_id=<id>/` (ids only, 8 bytes/row) then COMMIT
    * into the manifest, the same write-then-publish discipline as
    * [[appendIvfPq]]: at-least-once delivery lands exactly-once, and a
    * crash between write and commit leaves the delete invisible until
    * its replay. [[searchIvfPq]] anti-joins the codes scan against the
    * committed tombstone batches (an id-only join — AQE broadcasts it
    * while deletes are small, and it stays a keyed shuffle, never a
    * rewrite, when they are not); [[compactIvfPq]] makes the deletes
    * physical and clears the tombstones.
    *
    * Scope contract — a tombstone masks vectors PRESENT at delete
    * time; it is not a ban on the id: appending the same vec_id after
    * the tombstone is folded away serves it again (standard ANN-index
    * semantics — FAISS `remove_ids` does not block a later `add`, an
    * Iceberg delete does not block a later insert). Deleting an id
    * that was never indexed is therefore a documented no-op, and a
    * caller that needs delete-then-never-readd must filter its append
    * stream upstream (the curate-and-index loop does exactly that:
    * rejects never enter the append path at all). */
  def deleteIvfPq(ids: DataFrame, dir: String, batchId: Long): Unit = {
    ids.select(col("vec_id").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/tombstones/batch_id=$batchId")
    commitBatch(ids.sparkSession, dir, tombId = Some(batchId))
  }

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
    * Crash posture — the manifest plan (since v5, replacing the v3
    * staged-marker protocol and its read-refusal window):
    *  1. GC orphan batch dirs the manifest does not reference (crashed
    *     prior attempts, dirs a FINISHED prior compaction superseded);
    *  2. write the folded+filtered codes to `codes/batch_id=<foldId>`
    *     where foldId is a fresh NEGATIVE id (invisible: not in the
    *     manifest; can never collide with streaming's monotone
    *     positive append ids);
    *  3. COMMIT: one atomic manifest swap — fold sources out, foldId
    *     in, tombstones cleared when every live batch folded.
    * A crash anywhere leaves the manifest untouched: readers keep
    * serving the pre-compaction snapshot throughout (no refusal
    * window), and the stranded fold dir is step-1 hygiene for the next
    * call. Superseded fold-source dirs likewise survive until the next
    * compaction's GC, so a reader that resolved the old manifest
    * finishes its scan (see the snapshot-grace note in the object
    * scaladoc). Tombstones are folded into the output always, but
    * CLEARED from the manifest only when every live batch is folded
    * (always true for the streaming `upTo = batchId − 1` call, where
    * batch `batchId` appends after); a partial fold keeps them so
    * deleted ids in kept batches stay excluded. Single-writer by
    * contract like every other mutation here ([[ensureIndexFor]]).
    * Search results are identical before and after ([[IndexStoreSpec]]
    * proves row equality, including across a simulated mid-plan
    * crash). `stats/` (the per-batch drift-monitor history,
    * [[writeCodesWithStats]]) is deliberately NOT folded: it is a log
    * of encode quality per original drop — 1 row per batch — and its
    * value is the time series; compacting the serving table must not
    * erase the monitoring history. */
  def compactIvfPq(spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20, upTo: Long = Long.MaxValue,
      gcMinAgeMs: Long = 0L): Unit = {
    require(upTo >= 0, s"IndexStore: upTo must cover the build batch 0, got $upTo")
    val man = readManifest(spark, dir)
    // 1. reclaim what no reader can reference. Even at the default
    // gcMinAgeMs=0 this honors floors PROMISED by earlier floored
    // expireSnapshots sightings (the marker carries its floor) — a
    // compaction between two bounded expiry passes no longer collapses
    // the documented retention window (ADVICE r16).
    gcOrphans(spark, dir, man, gcMinAgeMs)
    // negative fold ids are always ≤ upTo: prior folds re-fold freely
    val fold = man.codes.filter(_ <= upTo).sorted
    if (fold.isEmpty) return
    val foldAll = fold.size == man.codes.size
    val fs = manifestPath(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // fresh negative id, below every id any manifest ever referenced
    val foldId = man.codes.filter(_ < 0).minOption.getOrElse(0L) - 1
    // folds write NO stats row (stats/ is the per-original-drop encode
    // history), so a stats row already AT foldId can only be the
    // stranding of a rebuild that crashed before its manifest swap —
    // left in place it would attribute that dead generation's training
    // error to this fold batch in the drift chart; clear it
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/stats/batch_id=$foldId"), true)
    // 2. write the fold: sources minus tombstones, file count sized
    // from the measured on-disk footprint (no extra corpus scan)
    val bytes = fold.map(b =>
      fs.getContentSummary(new org.apache.hadoop.fs.Path(s"$dir/codes/batch_id=$b")).getLength).sum
    val nParts = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val m = loadCached(spark, dir, man.nonce)._2
    val live = tombstoneFilter(spark, dir, man,
      spark.read.schema(codeSchema(m))
        .parquet(fold.map(b => s"$dir/codes/batch_id=$b"): _*))
    live.repartition(nParts)
      .write.mode("overwrite").parquet(s"$dir/codes/batch_id=$foldId")
    // 3. commit: fold sources out, foldId in, one atomic swap
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/codes/batch_id=$foldId/_SUCCESS")),
      s"IndexStore: fold write $dir/codes/batch_id=$foldId left no _SUCCESS")
    writeManifest(spark, dir, man.copy(
      codes = (man.codes.filterNot(fold.contains) :+ foldId).sorted,
      tombstones = if (foldAll) Nil else man.tombstones))
  }

  /** Anti-join `codes` against the manifest's live tombstone batches
    * (no-op when none). Manifest membership IS the torn-write gate:
    * only `_SUCCESS`-complete batches are ever committed
    * ([[commitBatch]]), so no per-batch probes run here. */
  private def tombstoneFilter(spark: SparkSession, dir: String,
      man: Manifest, codes: DataFrame): DataFrame =
    if (man.tombstones.isEmpty) codes
    else codes.join(
      spark.read.schema("vec_id BIGINT")
        .parquet(man.tombstones.map(b => s"$dir/tombstones/batch_id=$b"): _*)
        .select("vec_id"),
      Seq("vec_id"), "left_anti")

  /** The codes table's write contract (fixed at [[buildIvfPq]]) —
    * explicit on every serving/maintenance read: parquet schema
    * inference costs one Spark job per schemaless read. */
  private def codeSchema(m: Int): String =
    "vec_id BIGINT, cluster BIGINT, " +
      (0 until m).map(s => s"code_$s INT").mkString(", ")

  /** Every vec_id the index currently serves: the manifest's live
    * codes batches minus its live tombstones, as an id-only column
    * scan (8 B/row — parquet column pruning never touches the code
    * columns). The streaming drift-rebuild uses this to pin its
    * corpus to PROCESSED batches: re-reading the input directory alone
    * would also swallow files of batches the source has not yet
    * processed, whose later appends would then serve those vectors
    * twice ([[graft.streaming.IndexStream.maintain]]). */
  private[graft] def liveVecIds(spark: SparkSession, dir: String): DataFrame = {
    val man = readManifest(spark, dir)
    tombstoneFilter(spark, dir, man,
      spark.read.schema("vec_id BIGINT")
        .parquet(man.codes.map(b => s"$dir/codes/batch_id=$b"): _*)
        .select("vec_id"))
  }

  /** Incremental maintenance — the FAISS `add()` shape: encode NEW
    * vectors against the FROZEN centroids/codebooks (one bounded reload
    * + one map-only pass over the batch, never the existing corpus) and
    * land them as `codes/batch_id=<id>/`. Codebooks are deliberately
    * not retrained (PQ practice: the sampled training distribution
    * stands for the stream; re-training would silently re-mean every
    * EXISTING code's semantics — rebuild via [[buildIvfPq]] when drift
    * demands it). Re-appending a batch id OVERWRITES that directory
    * and re-COMMITS idempotently: at-least-once upstream delivery
    * lands exactly-once in the index — the CurateStream batch-store
    * replay discipline; a crash between write and commit leaves the
    * batch invisible until its replay. */
  def appendIvfPq(emb: DataFrame, dir: String, batchId: Long): Unit = {
    require(batchId > 0, s"appendIvfPq: batchId must be > 0 (build batches " +
      s"use id <= 0 — 0 fresh, negative for rebuilds/folds; streaming " +
      s"appends must be positive), got $batchId")
    val spark = emb.sparkSession
    val man = readManifest(spark, dir)
    if (batchId <= man.subsumed) return // a rebuild absorbed this batch (replay)
    val (_, _, _, sub, cents, books) = loadCached(spark, dir, man.nonce)
    writeCodesWithStats(
      Similarity.pqEncodeD(Similarity.ivfResiduals(emb, cents), sub, books,
        keep = Seq("cluster")), dir, batchId)
    commitBatch(spark, dir, codesId = Some(batchId))
  }

  private[operators] def requireTable(spark: SparkSession, dir: String, t: String): String = {
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
    * configs). Keyed by dir, validated by the manifest NONCE — a
    * CONTENT token [[buildIvfPq]] refreshes on every rebuild (the only
    * operation that rewrites state;
    * [[appendIvfPq]]/[[deleteIvfPq]]/[[compactIvfPq]] touch only
    * codes/tombstones/stats). The pre-v5 scheme signed the state files
    * by name:length:mtime, which a byte-identical rebuild inside the
    * filesystem's mtime granularity could defeat (ADVICE r12); the
    * nonce cannot be defeated and costs zero extra fs calls — callers
    * already hold the manifest. Bounded at [[StateCacheMax]] dirs
    * (state is KBs; the bound is a leak guard, not a memory budget),
    * cleared wholesale on overflow. Single-JVM like every IndexStore
    * mutation contract; cross-JVM rebuild visibility rides the nonce,
    * not the cache. [[IndexStoreSpec]] pins hit/invalidate behavior
    * via [[stateLoads]]. */
  private val stateCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String,
      (Int, Int, Int, Int, Array[(Long, Array[Double], Double)], Array[Array[Array[Double]]]))]
  private val StateCacheMax = 16
  private[operators] val stateLoads = new java.util.concurrent.atomic.AtomicLong

  private[operators] def loadCached(spark: SparkSession, dir: String, nonce: String)
      : (Int, Int, Int, Int, Array[(Long, Array[Double], Double)], Array[Array[Array[Double]]]) = {
    val hit = stateCache.get(dir)
    if (hit != null && hit._1 == nonce) hit._2
    else {
      val state = load(spark, dir, nonce)
      if (stateCache.size >= StateCacheMax) stateCache.clear()
      stateCache.put(dir, (nonce, state))
      state
    }
  }

  /** Bounded index state reloaded from disk — the `nonce`-addressed
    * generation (`state/<nonce>/{meta,centroids,codebooks}`): (meta,
    * centroids, books). Read schemas are EXPLICIT (they are this
    * store's write contract, fixed at [[buildIvfPq]]): parquet schema
    * inference costs one Spark job per read, and these three reloads
    * run on every cold append — a streaming micro-batch path where
    * per-batch job count is latency ([[IndexStoreSpec]] pins the total
    * at 3 reloads + 1 encode+write). */
  private[operators] def load(spark: SparkSession, dir: String, nonce: String)
      : (Int, Int, Int, Int, Array[(Long, Array[Double], Double)], Array[Array[Array[Double]]]) = {
    import spark.implicits._
    stateLoads.incrementAndGet()
    val gen = s"state/$nonce"
    val meta = spark.read
      .schema("nlist INT, m INT, k INT, sub INT, dim INT")
      .parquet(requireTable(spark, dir, s"$gen/meta"))
      .select("nlist", "m", "k", "sub").as[(Int, Int, Int, Int)].head()
    val (nlist, m, k, sub) = meta
    val cents = spark.read
      .schema("cid BIGINT, centroid ARRAY<DOUBLE>, norm DOUBLE")
      .parquet(requireTable(spark, dir, s"$gen/centroids"))
      .select("cid", "centroid", "norm").as[(Long, Array[Double], Double)]
      .collect().sortBy(_._1)
    require(cents.length == nlist, s"IndexStore: ${cents.length} centroids, meta says $nlist")
    val bookRows = spark.read
      .schema("subspace INT, code INT, vec ARRAY<DOUBLE>")
      .parquet(requireTable(spark, dir, s"$gen/codebooks"))
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
    * in-memory path.
    *
    * `idSelector` must be a DETERMINISTIC plan (it is referenced more
    * than once — eagerly for sizing/bloom, lazily in the verify join):
    * with `selectorBloomFpp` set, a selector that re-materializes
    * differently (e.g. sampled) can surface ids absent from the bloom
    * and the map-side gate silently drops true members. Land a
    * nondeterministic selection to parquet and pass the re-read. */
  def searchIvfPq(spark: SparkSession, dir: String, probes: DataFrame,
      nprobe: Int = 4, topK: Int = 5,
      idSelector: Option[DataFrame] = None,
      selectorBloomFpp: Option[Double] = None): DataFrame = {
    // ONE driver-side manifest read resolves the whole index — the
    // snapshot this query serves, pinned here: batches a concurrent
    // compaction supersedes stay on disk until the next compaction's
    // GC, so the scan below cannot lose files mid-plan. Manifest
    // membership is the torn-write gate (only _SUCCESS-complete
    // batches commit), so no per-batch probes run per query.
    val man = readManifest(spark, dir)
    require(man.codes.nonEmpty,
      s"IndexStore: $dir has no committed codes batches — build the index first")
    val (_, m, _, sub, cents, books) = loadCached(spark, dir, man.nonce)
    val live = tombstoneFilter(spark, dir, man,
        spark.read.schema(codeSchema(m))
          .parquet(man.codes.map(b => s"$dir/codes/batch_id=$b"): _*))
    // FAISS IDSelector semantics: the selector restricts which STORED
    // vectors a query may return — a semi-join on the candidate codes,
    // applied before routing so excluded candidates pay no LUT work.
    // The index itself is predicate-agnostic (selectors vary per query,
    // the frozen geometry must not); a dim-table-sized selector
    // broadcasts, and a WIDE one takes the bloom-gated path below
    // (`selectorBloomFpp`) — no longer just documented (r16), now a
    // parameter: the selector is summarized into a driver-built Bloom
    // filter (fixed-size broadcast no matter how wide the id set), the
    // stored codes are gated MAP-SIDE, and the exact semi-join verifies
    // only the surviving sliver WITHOUT a broadcast (shuffle-hash, the
    // xc_bloom_decontaminate shape) — so neither the selector nor the
    // join hash table ever needs to fit in one executor's memory, and
    // false positives cannot reach results.
    val selected = (idSelector, selectorBloomFpp) match {
      case (None, _) => live
      case (Some(ids), None) =>
        live.join(ids.select(col("vec_id")), Seq("vec_id"), "left_semi")
      case (Some(ids), Some(fpp)) =>
        val sel = ids.select(col("vec_id")).persist()
        val n = sel.count() // selector-sized action, shared with the build
        if (n == 0) { sel.unpersist(); live.limit(0) }
        else {
          val bloom = sel.stat.bloomFilter("vec_id", n, fpp)
          // eager uses done — the lazy verify join below recomputes the
          // selector once when it runs rather than pinning the cache.
          // DETERMINISM CONTRACT (ADVICE r17): recompute-over-pin is only
          // sound because an idSelector must be a deterministic plan — a
          // nondeterministic one (e.g. sampled) could re-materialize with
          // ids ABSENT from this bloom, and the map-side gate would then
          // silently drop true members before the verify join ever sees
          // them. Callers with a nondeterministic selector must land it
          // (write + re-read) first; the non-bloom path has the same
          // contract for result stability, just without the silent-drop
          // failure mode.
          sel.unpersist()
          val b = spark.sparkContext.broadcast(bloom)
          val mightContain = udf((id: Long) => b.value.mightContainLong(id))
          // hint the BUILD side (a left-semi's build is the right side;
          // a left-side hint is unsatisfiable there and the planner
          // would silently fall back to a broadcast)
          live.filter(mightContain(col("vec_id")))
            .join(sel.hint("shuffle_hash"), Seq("vec_id"), "left_semi")
        }
    }
    val codes = selected
      .withColumn("codes", array((0 until m).map(s => col(s"code_$s").cast(IntegerType)): _*))
    val routes = Similarity.probeRoutes(probes, cents, nprobe)
    val pc = Similarity.routesDf(spark, routes)
    Similarity.adcRankResidual(codes.join(broadcast(pc), Seq("cluster")),
      routes, cents, books, sub, topK)
  }

  /** [[searchIvfPq]] with the starved-probe remedy BUILT IN — the
    * production serve path for filtered retrieval: run at `nprobe`,
    * and for exactly the probes that came back with fewer than `topK`
    * rows (a selective ID selector can exhaust a probe's pruned
    * clusters — the documented pre-filter tradeoff), re-run with NO
    * cluster pruning (nprobe = nlist) and serve the widened ranking
    * for those probes only. Non-starved probes keep their pruned
    * results untouched, so the fast path pays nothing; the widened
    * re-query is per-starved-probe work, the recall-recovery shape the
    * ANN bound rows measure. Per-probe results are independent, so the
    * composition is exactly "narrow where sufficient, full-scan where
    * starved" — which is what the oracle replays.
    *
    * Cost note for GATED wide selectors (`selectorBloomFpp`): each
    * searchIvfPq construction pays the selector count + bloom build
    * eagerly, so a widening serve pays it twice (narrow + widened),
    * and the unpersisted selector re-scans once per execution of the
    * verify join — the bloomDecontaminate recompute-over-pin tradeoff,
    * accepted because the gate exists precisely when the selector is
    * too wide to pin. A serving layer that widens OFTEN under a wide
    * filter should raise nprobe instead of paying the two-pass shape
    * per query. */
  def searchIvfPqAutoWiden(spark: SparkSession, dir: String, probes: DataFrame,
      nprobe: Int = 4, topK: Int = 5,
      idSelector: Option[DataFrame] = None,
      selectorBloomFpp: Option[Double] = None): DataFrame = {
    val man = readManifest(spark, dir)
    val (nlist, _, _, _, _, _) = loadCached(spark, dir, man.nonce)
    val narrow = searchIvfPq(spark, dir, probes, nprobe, topK, idSelector,
      selectorBloomFpp)
    // The starved set is PROBE-COUNT-BOUNDED — the query side, small by
    // definition — so it lands on the driver (the bounded-collect
    // discipline) and the final plan carries the narrow subtree ONCE
    // (a lazy starved-id frame would embed it three times: the count,
    // the anti-join, and the widened probe list). Probes with NO rows
    // at all are absent from narrow, hence the left join against the
    // full probe set.
    val starved = probes.select(col("vec_id").as("probe_id"))
      .join(narrow.groupBy(col("probe_id"))
        .agg(count(lit(1)).as("_nr")), Seq("probe_id"), "left")
      .filter(coalesce(col("_nr"), lit(0L)) < topK)
      .select(col("probe_id"))
      .collect().map(_.getLong(0)).toSeq
    if (starved.isEmpty) narrow
    else {
      val widened = searchIvfPq(spark, dir,
        probes.filter(col("vec_id").isin(starved: _*)), nlist, topK, idSelector,
        selectorBloomFpp)
      narrow.filter(!col("probe_id").isin(starved: _*)).unionByName(widened)
    }
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

  /** Filtered search FROM THE STORE — the same predicate-restricted
    * retrieval as `x2_ivfpq_filtered`, served through the persisted
    * index via an ID selector (the store is predicate-agnostic; the
    * selector — here the label-3 slice's ids — arrives with the
    * query). Hash-matches the same oracle: serving and composed
    * filtered search must be indistinguishable. */
  private[operators] def x2IvfPqFilteredPersisted(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val ixDir = ensureIndexFor(spark, s"$dir/embeddings.parquet", "emb-n16m4k16",
      d => buildIvfPq(graft.core.Tables.load(spark, dir, "embeddings"), d, 16, 4, 16, 1))
    searchIvfPq(spark, ixDir, emb.filter(col("vec_id") < 10), 4, 5,
        idSelector = Some(emb.filter(col("label") === 3).select(col("vec_id"))))
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** The WIDE-selector serve — the escalation `x2_ivfpq_filtered_persisted`
    * only documented, now a verified path (VERDICT r16 follow-through):
    * when the id set is too wide to broadcast as a join side, the
    * selector is summarized into a fixed-size Bloom filter that gates
    * the stored codes MAP-SIDE, and the exact semi-join verifies only
    * the surviving sliver without a broadcast (shuffle-hash — the
    * xc_bloom_decontaminate shape), so neither the selector nor a hash
    * table of it ever has to fit in one executor's memory. False
    * positives cannot reach results (the verify join is exact), so the
    * row hash-matches the same replay oracle as an exact selector
    * would — here the label≠3 slice, 90 % of the corpus, the
    * wide-filter regime. */
  private[operators] def x2IvfPqFilteredWide(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val ixDir = ensureIndexFor(spark, s"$dir/embeddings.parquet", "emb-n16m4k16",
      d => buildIvfPq(graft.core.Tables.load(spark, dir, "embeddings"), d, 16, 4, 16, 1))
    searchIvfPq(spark, ixDir, emb.filter(col("vec_id") < 10), 4, 5,
        idSelector = Some(emb.filter(col("label") =!= 3).select(col("vec_id"))),
        selectorBloomFpp = Some(0.01))
      .orderBy(col("probe_id"), col("rnk"))
  }

  private val x2IvfPqFilteredWideSql = Similarity.ivfPqSearchSqlWith(
    serveWhere = "WHERE a.vec_id IN (SELECT vec_id FROM embeddings WHERE label <> 3)")

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
      tag: String, build: String => Unit): String =
    // "v7" = the on-disk LAYOUT version (v2 added batch-partitioned
    // codes/, v3 added tombstones + compaction, v4 switched the
    // codebooks/codes to IVF-RESIDUAL encoding, v5 the manifest
    // visibility protocol, v6 nonce-addressed state generations, v7 the
    // integer-carrier stats JSON — sum_err_e6, VERDICT r18 #1):
    // bumping it invalidates markers written by an older layout, so a
    // layout change rebuilds instead of serving state the reader would
    // misinterpret (raw-vector codes scored against residual LUTs; a
    // manifest-less dir refused as unbuilt; an old-shape stats.json
    // read as null telemetry)
    ensureArtifactFor(spark, srcPath, tag, "ivfpq", "v7", build)

  /** The generic form of [[ensureIndexFor]] — any train-once artifact
    * family keyed to a source fixture gets the same fingerprint/marker
    * discipline ([[TokenizerStore]] is the other user; `family` keys
    * the warehouse namespace, `layout` the artifact format version). */
  private[graft] def ensureArtifactFor(spark: SparkSession, srcPath: String,
      tag: String, family: String, layout: String, build: String => Unit): String = {
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(src), s"IndexStore: fixture $src missing")
    val st = fs.getFileStatus(src)
    val fp = s"$layout:" + (
      if (st.isDirectory) {
        val parts = fs.listStatus(src).filter(_.isFile).sortBy(_.getPath.getName)
        s"${parts.map(_.getLen).sum}:${parts.map(_.getModificationTime).max}:${parts.length}"
      } else s"${st.getLen}:${st.getModificationTime}")
    val ixDir = s"${sys.props("java.io.tmpdir")}/graft-$family-$tag-" +
      fp.replaceAll("[^A-Za-z0-9]", "-")
    val marker = new org.apache.hadoop.fs.Path(s"$ixDir/_graft_fingerprint")
    // the marker lives in the LOCAL warehouse regardless of where the
    // source fixture lives — resolve its filesystem from its own path,
    // not the (possibly remote) fixture's (review r14)
    val mfs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ok = mfs.exists(marker) && {
      val in = mfs.open(marker)
      val read = try scala.io.Source.fromInputStream(in).mkString finally in.close()
      read == fp
    }
    if (!ok) {
      build(ixDir)
      val out = mfs.create(marker, true)
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

  /** Filtered search × live tombstones on ONE candidate stream — the
    * composition a production index actually serves (VERDICT r16 #2):
    * `x2_ivfpq_filtered_persisted` verifies the predicate axis and
    * `x2_ivfpq_tombstoned` the delete axis, each alone; here the SAME
    * [[searchIvfPq]] call applies both — the tombstone anti-join and
    * the FAISS-IDSelector semi-join restrict the same stored-codes
    * scan before routing, so excluded candidates (by either axis) pay
    * no LUT work. Reuses `x2_ivfpq_tombstoned`'s warehouse artifact
    * (same store, live tombstones, NOT compacted). The DuckDB oracle
    * replays IVFADC with BOTH exclusions on the candidate CTE —
    * training and routing still see the full corpus, exactly the
    * delete + filter semantics. */
  private[operators] def x2IvfPqFilteredTombstoned(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val ixDir = ensureIndexFor(spark, s"$dir/embeddings.parquet", "emb-tomb-n16m4k16", { d =>
      buildIvfPq(emb, d, 16, 4, 16, 1)
      deleteIvfPq(emb.filter(col("vec_id") % 7 === 3), d, batchId = 1)
    })
    searchIvfPq(spark, ixDir, emb.filter(col("vec_id") < 10), 4, 5,
        idSelector = Some(emb.filter(col("label") === 3).select(col("vec_id"))))
      .orderBy(col("probe_id"), col("rnk"))
  }

  private val x2IvfPqFilteredTombstonedSql = Similarity.ivfPqSearchSqlWith(
    serveWhere = "WHERE a.vec_id % 7 <> 3 " +
      "AND a.vec_id IN (SELECT vec_id FROM embeddings WHERE label = 3)")

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

  /** Starved-probe honesty for NARROW filters, engine-checked (VERDICT
    * r16 #3): the documented pre-filter tradeoff is that a selective
    * predicate can return fewer than topK rows at the default nprobe —
    * the selector's survivors in the probe's pruned clusters are all
    * there is. This bound row makes the tradeoff AND its remedy a
    * checked contract instead of a doc comment: with an 8-id selector
    * (fixed COUNT at every SF — selectivity that scales with the
    * corpus would un-starve at bigger fixtures), at nprobe=4 at least
    * one probe comes back short (`starved_ok`), and the auto-widened
    * nprobe=nlist search — the recall-floor discipline the ANN family
    * uses — recovers the FULL topK for EVERY probe (`recovered_ok`:
    * all 8 selected candidates are ranked once no cluster is pruned,
    * and 8 ≥ k). Both runs serve from the shared persisted store; all
    * counts are engine-computed single-row aggregates, the
    * [[Similarity.annBoundSummary]] pattern. */
  private[operators] def x2IvfPqFilteredStarved(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val probes = emb.filter(col("vec_id") < 10)
    val sel = emb.filter(col("vec_id") < 8).select(col("vec_id"))
    val ixDir = ensureIndexFor(spark, s"$dir/embeddings.parquet", "emb-n16m4k16",
      d => buildIvfPq(graft.core.Tables.load(spark, dir, "embeddings"), d, 16, 4, 16, 1))
    def rowsPerProbe(nprobe: Int) =
      probes.select(col("vec_id").as("probe_id"))
        .join(searchIvfPq(spark, ixDir, probes, nprobe, 5, idSelector = Some(sel))
          .groupBy(col("probe_id")).agg(count(lit(1)).as("nr")),
          Seq("probe_id"), "left")
        .select(coalesce(col("nr"), lit(0L)).as("nr"))
    val narrow = rowsPerProbe(4).agg(min(col("nr")).as("min_narrow"))
    val wide = rowsPerProbe(16)
      .agg(min(col("nr")).as("min_wide"), count(lit(1)).as("n_probes"))
    wide.crossJoin(narrow).select(
      col("n_probes"),
      lit(5).as("k"),
      (col("min_narrow") < 5).as("starved_ok"),
      (col("min_wide") === 5).as("recovered_ok"))
  }

  private val x2IvfPqFilteredStarvedSql =
    """SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_probes,
      |  CAST(5 AS INTEGER) AS k,
      |  TRUE AS starved_ok,
      |  TRUE AS recovered_ok
      |FROM embeddings WHERE vec_id < 10""".stripMargin

  /** The auto-widen serve path VALUE-CHECKED (not just bounded): the
    * same starvation-prone shape as `x2_ivfpq_filtered_starved` served
    * through [[searchIvfPqAutoWiden]] with a 20-id selector sized so
    * the fixture starves SOME probes and not others — both branches of
    * the adaptive path land in one result. The DuckDB oracle replays
    * the full composition: the IVFADC chain at nprobe=4, the per-probe
    * row count against the whole probe set, and the nprobe=nlist
    * replay swapped in for exactly the starved probes — every (probe,
    * neighbor, rank, adist) tuple hash-matched. */
  private[operators] def x2IvfPqFilteredAutowiden(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val ixDir = ensureIndexFor(spark, s"$dir/embeddings.parquet", "emb-n16m4k16",
      d => buildIvfPq(graft.core.Tables.load(spark, dir, "embeddings"), d, 16, 4, 16, 1))
    searchIvfPqAutoWiden(spark, ixDir, emb.filter(col("vec_id") < 10), 4, 5,
        idSelector = Some(emb.filter(col("vec_id") < 20).select(col("vec_id"))))
      .orderBy(col("probe_id"), col("rnk"))
  }

  private val x2IvfPqFilteredAutowidenSql = {
    val narrow = Similarity.ivfPqSearchSqlWith(serveWhere = "WHERE a.vec_id < 20")
    val wide = Similarity.ivfPqSearchSqlWith(serveWhere = "WHERE a.vec_id < 20",
      nprobe = 16)
    s"""WITH narrow AS (SELECT * FROM ($narrow)),
       |wide AS (SELECT * FROM ($wide)),
       |pset AS (SELECT vec_id AS probe_id FROM embeddings WHERE vec_id < 10),
       |cnt AS (SELECT p.probe_id, COUNT(n.vec_id) AS c
       |        FROM pset p LEFT JOIN narrow n USING (probe_id) GROUP BY 1),
       |starved AS (SELECT probe_id FROM cnt WHERE c < 5)
       |SELECT probe_id, vec_id, rnk, adist FROM narrow
       |WHERE probe_id NOT IN (SELECT probe_id FROM starved)
       |UNION ALL
       |SELECT probe_id, vec_id, rnk, adist FROM wide
       |WHERE probe_id IN (SELECT probe_id FROM starved)
       |ORDER BY probe_id, rnk""".stripMargin
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
    spark.read.schema("n BIGINT, sum_err_e6 BIGINT, max_err DOUBLE, batch_id BIGINT")
      .json(s"$ixDir/stats")
      // integers carry the hash (VERDICT r18 #1); mean_err derives from
      // them by the division the oracle writes identically
      .select(col("batch_id"), col("n"), col("sum_err_e6"),
        // empty batch: the landed JSON records 0.0, the derivation would
        // be 0/0 = NaN (r19 review); the oracle can never produce an
        // n = 0 group, so the guard only keeps the reader NaN-free
        when(col("n") > 0,
          graft.core.Num.meanFromE6(col("sum_err_e6"), col("n")))
          .otherwise(lit(0.0)).as("mean_err"),
        col("max_err"))
      .orderBy("batch_id")
  }

  /** The atomic-rebuild path as a driver-checked row: build on the
    * first half (batch 0 trains), append the second half frozen — the
    * drift shape — then REBUILD over the full corpus with
    * `subsume = 1` (the `rebuildWhen` remedy run by hand) and
    * IMMEDIATELY replay the append of batch 1, which the subsumed
    * watermark must turn into a no-op. The rebuild trains on the same
    * full corpus with the same deterministic seeding as a plain
    * build, so the committed generation's artifacts equal
    * `x2_ivfpq_search`'s and the row hash-matches the SAME oracle: a
    * rebuild leaves no trace but fresh codebooks — and if the
    * replayed append were NOT a no-op, the duplicated second-half
    * vectors would occupy extra ranks and the hash would catch it. */
  private[operators] def x2IvfPqRebuilt(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val ixDir = ensureIndexFor(spark, s"$dir/embeddings.parquet", "emb-reb-n16m4k16", { d =>
      val h = emb.count() / 2
      buildIvfPq(emb.filter(col("vec_id") < h), d, 16, 4, 16, 1)
      appendIvfPq(emb.filter(col("vec_id") >= h), d, batchId = 1)
      buildIvfPq(emb, d, 16, 4, 16, 1, subsume = 1)
      appendIvfPq(emb.filter(col("vec_id") >= h), d, batchId = 1) // replay: must no-op
    })
    searchIvfPq(spark, ixDir, emb.filter(col("vec_id") < 10), 4, 5)
      .orderBy(col("probe_id"), col("rnk"))
  }

  val all: Seq[Declared] = Seq(
    Declared("x2_ivfpq_persisted", x2IvfPqPersisted, Some(Similarity.x2IvfPqSearchSql)),
    Declared("x2_ivfpq_filtered_persisted", x2IvfPqFilteredPersisted,
      Some(Similarity.x2IvfPqFilteredSql)),
    Declared("x2_ivfpq_filtered_wide", x2IvfPqFilteredWide,
      Some(x2IvfPqFilteredWideSql)),
    Declared("x2_ivfpq_filtered_tombstoned", x2IvfPqFilteredTombstoned,
      Some(x2IvfPqFilteredTombstonedSql)),
    Declared("x2_ivfpq_filtered_starved", x2IvfPqFilteredStarved,
      Some(x2IvfPqFilteredStarvedSql)),
    Declared("x2_ivfpq_filtered_autowiden", x2IvfPqFilteredAutowiden,
      Some(x2IvfPqFilteredAutowidenSql)),
    Declared("x2_ivfpq_rebuilt", x2IvfPqRebuilt, Some(Similarity.x2IvfPqSearchSql)),
    Declared("x2_ivfpq_deleted", x2IvfPqDeleted, Some(x2IvfPqDeletedSql)),
    Declared("x2_ivfpq_tombstoned", x2IvfPqTombstoned, Some(x2IvfPqDeletedSql)),
    Declared("x2_ivfpq_refined_persisted", x2IvfPqRefinedPersisted,
      Some(Similarity.x2IvfPqRefinedSql)),
    Declared("x2_index_stats", x2IndexStats, Some(Similarity.x2IndexStatsSql)))
}
