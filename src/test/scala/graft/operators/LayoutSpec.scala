package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue16 interleaves bits (known vectors)") {
    val rows = Seq(
      (0L, 0L, 0L),    // all zero
      (1L, 0L, 1L),    // x bit 0 → z bit 0
      (0L, 1L, 2L),    // y bit 0 → z bit 1
      (1L, 1L, 3L),
      (2L, 0L, 4L),    // x bit 1 → z bit 2
      (0L, 2L, 8L),    // y bit 1 → z bit 3
      (3L, 3L, 15L),
      (65535L, 65535L, (1L << 32) - 1)) // full 16+16 bits
    val got = rows.map { case (x, y, _) => (x, y) }.toDF("x", "y")
      .select(Layout.zvalue16($"x", $"y")).as[Long].collect().toSeq
    assert(got == rows.map(_._3))
  }

  test("z-order layout gives every file a tight bounding box on BOTH dims") {
    // 64×64 uniform grid; 16 output files
    val grid = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    def fileSpreads(laid: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val spreads = laid
        .withColumn("_f", spark_partition_id())
        .groupBy("_f")
        .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
        .collect()
      (spreads.map(_.getLong(1)).sum.toDouble / spreads.length,
        spreads.map(_.getLong(2)).sum.toDouble / spreads.length)
    }
    // single-column sort: x tight, y covers the FULL range in every file
    val bySingle = df.repartitionByRange(16, $"x").sortWithinPartitions($"x")
    val (sx1, sy1) = fileSpreads(bySingle)
    assert(sx1 < 16, s"x-sorted x-spread $sx1")
    assert(sy1 > 55, s"x-sorted y-spread should be ~full range, got $sy1")
    // z-order: BOTH dims bounded — each file is a sub-rectangle
    val byZ = Layout.layoutByZorder(df, "x", "y", 16)
    val (sxz, syz) = fileSpreads(byZ)
    assert(sxz < 32, s"z-ordered x-spread $sxz")
    assert(syz < 32, s"z-ordered y-spread $syz")
  }

  test("hilbert d16: known vectors, bijective on a subgrid, neighbors adjacent") {
    import graft.functions.Hilbert.d16
    // first two curve orders + the three 16-bit corners
    val vectors = Seq(
      (0L, 0L, 0L), (0L, 1L, 3L), (1L, 1L, 2L), (1L, 0L, 1L),
      (2L, 0L, 14L), (3L, 0L, 15L), (3L, 1L, 12L), (2L, 1L, 13L),
      (65535L, 0L, 4294967295L), (0L, 65535L, 1431655765L),
      (65535L, 65535L, 2863311530L))
    for ((x, y, d) <- vectors) assert(d16(x, y) == d, s"d16($x,$y)")
    // the order-16 curve restricted to the 64×64 corner is exactly the
    // order-6 curve: dense 0..4095, and CONSECUTIVE indices are grid
    // NEIGHBORS (|Δx|+|Δy| = 1) — the locality property Z-order lacks
    val inv = new Array[(Long, Long)](4096)
    for (x <- 0L until 64L; y <- 0L until 64L) {
      val d = d16(x, y)
      assert(d >= 0 && d < 4096, s"($x,$y) -> $d escapes the subgrid")
      inv(d.toInt) = (x, y)
    }
    for (i <- 0 until 4095) {
      val (x1, y1) = inv(i); val (x2, y2) = inv(i + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"jump at $i")
    }
  }

  test("hilbert layout boxes are at least as tight as z-order's") {
    val grid = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    def meanBoxArea(laid: org.apache.spark.sql.DataFrame): Double = {
      val boxes = laid.withColumn("_f", spark_partition_id())
        .groupBy("_f")
        .agg(((max($"x") - min($"x") + 1) * (max($"y") - min($"y") + 1)).as("area"))
        .collect().map(_.getLong(1))
      boxes.sum.toDouble / boxes.length
    }
    val zArea = meanBoxArea(Layout.layoutByZorder(df, "x", "y", 16))
    val hArea = meanBoxArea(Layout.layoutByHilbert(df, "x", "y", 16))
    // 4096 cells / 16 files = 256 cells per file; a perfect box is 256.
    // Hilbert's unbroken curve keeps every file a contiguous run —
    // boxes stay near-minimal; Z-order's seam jumps can only widen them.
    assert(hArea <= zArea + 1e-9, s"hilbert $hArea vs zorder $zArea")
    assert(hArea <= 512.0, s"hilbert mean box area $hArea")
  }

  test("file-stats manifest pruning skips non-intersecting files and never loses rows") {
    val grid = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("fstats").toString + "/data"
    Layout.writeWithFileStats(Layout.layoutByZorder(df, "x", "y", 16), "x", "y", dir)
    // plain readers of the data dir never see the _-prefixed manifest
    assert(spark.read.parquet(dir).count() == 4096)
    // a corner box prunes most files; the pruned scan + row predicate
    // returns exactly the full-scan rows (no needed file skipped)
    val (pruned, nRead, nTotal) = Layout.prunedScan(spark, dir, "x", "y", 0, 7, 0, 7)
    assert(nTotal == 16 && nRead < 16, s"read $nRead of $nTotal")
    val p = $"x".between(0, 7) && $"y".between(0, 7)
    assert(pruned.get.filter(p).count() == df.filter(p).count())
    // a box fully outside the data reads NOTHING
    val (none, n0, _) = Layout.prunedScan(spark, dir, "x", "y", 100, 120, 0, 63)
    assert(none.isEmpty && n0 == 0)
  }

  test("optimize with fileStats maintains the pruning manifest across the atomic swap") {
    import graft.streaming.Maintenance
    val grid = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val dir = java.nio.file.Files.createTempDirectory("zstats").toString + "/t"
    grid.toDF("x", "y").write.parquet(dir)
    assert(Maintenance.optimizeZorder(spark, dir, "x", "y", 16, fileStats = true) == 16)
    val (pruned, nRead, nTotal) = Layout.prunedScan(spark, dir, "x", "y", 0, 7, 0, 7)
    assert(nTotal == 16 && nRead < 16, s"read $nRead of $nTotal after swap")
    // the manifest stores basenames, so it survived the staged-dir
    // rename — the pruned read resolves against the FINAL location
    val p = $"x".between(0, 7) && $"y".between(0, 7)
    assert(pruned.get.filter(p).count() == 64)
    // a re-layout at a different file count REFRESHES the manifest
    assert(Maintenance.optimizeHilbert(spark, dir, "x", "y", 8, fileStats = true) == 8)
    val (p2, _, total2) = Layout.prunedScan(spark, dir, "x", "y", 0, 7, 0, 7)
    assert(total2 == 8, s"stale manifest after re-layout: $total2 files")
    assert(p2.get.filter(p).count() == 64)
  }

  test("optimizeZorder maintenance pass: in-place rewrite, same rows, crash backup recovered") {
    import graft.streaming.Maintenance
    val root = java.nio.file.Files.createTempDirectory("zopt").toString
    val dir = s"$root/batch_id=0"
    val grid = for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong)
    grid.toDF("x", "y").repartition(8).write.parquet(dir)

    val nFiles = Maintenance.optimizeZorder(spark, dir, "x", "y", targetFiles = 4)
    assert(nFiles == 4)
    val laid = spark.read.parquet(dir)
    assert(laid.count() == 1024)
    // per-FILE bounding boxes tight on both dims after the rewrite
    val spreads = laid.withColumn("_f", input_file_name())
      .groupBy("_f")
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
      .collect()
    assert(spreads.length == 4)
    assert(spreads.map(_.getLong(1)).max < 32, "x must not span the full range per file")
    assert(spreads.map(_.getLong(2)).max < 32, "y must not span the full range per file")
    // missing dir → -1, no side effects
    assert(Maintenance.optimizeZorder(spark, s"$root/batch_id=9", "x", "y") == -1)
    // crash recovery: a stranded backup with the live dir gone is restored
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(s"$root/.old-batch_id=0"))
    val n2 = Maintenance.optimizeZorder(spark, dir, "x", "y", targetFiles = 2)
    assert(n2 == 2 && spark.read.parquet(dir).count() == 1024,
      "stranded backup must be restored, then re-optimized")
    // the Hilbert variant shares the swap machinery and keeps rows
    val n3 = Maintenance.optimizeHilbert(spark, dir, "x", "y", targetFiles = 4)
    assert(n3 == 4 && spark.read.parquet(dir).count() == 1024)
    val hSpreads = spark.read.parquet(dir).withColumn("_f", input_file_name())
      .groupBy("_f")
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
      .collect()
    assert(hSpreads.map(_.getLong(1)).max < 32 && hSpreads.map(_.getLong(2)).max < 32,
      "hilbert files must box both dims")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }
}
