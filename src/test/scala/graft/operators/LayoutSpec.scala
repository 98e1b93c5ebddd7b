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
}
