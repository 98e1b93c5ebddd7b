package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (VERDICT r3 item 8): materialize an m× amplification of a
  * FULL fixture directory — every table, not just the documents/
  * embeddings pair [[ScaleProbe]] amplifies — so the whole Bench suite
  * can run at sf1 (10× the driver's bench point) and super-linear
  * shuffle cliffs show up before a real cluster finds them.
  *
  * `runMain graft.operators.BenchFixture [baseDir [outDir [m]]]`
  * (defaults: /root/testdata/sf0.1 → /root/repo/out/sf1, m=10).
  *
  * Scaling model (TPC-H-like): nation/region stay fixed; every other
  * table is replicated m× with its keys shifted by slice × cardinality
  * — keys are 0-based dense in the fixture, so shifts are
  * collision-free and every foreign-key relationship (orders→customer,
  * lineitem→orders/part/supplier, events→user) keeps its exact join
  * fan-out: group counts grow 10×, per-group sizes stay constant,
  * which is how a bigger TPC-H SF behaves. documents/embeddings use
  * [[ScaleProbe.genFixture]]'s profile-matched text generator instead
  * of row copies, preserving the planted exact-dup/near-dup rates the
  * dedup queries are sensitive to. Generation is map-only
  * (`spark.range`/unions, no shuffle) — the same shape a 100 TB
  * fixture build would use.
  *
  * events.ts is read with the nanos-as-long legacy flag (the fixture
  * column is TIMESTAMP(NANOS)) and written back as a plain INT64 of
  * the same nanos values, which [[graft.core.Tables.loadEvents]]
  * converts identically on read.
  */
object BenchFixture {

  /** Replicate `df` m× shifting each (column → cardinality) by
    * slice × cardinality; slice 0 is the base verbatim. */
  private def replicate(df: DataFrame, m: Int, shifts: (String, Long)*): DataFrame =
    (1 until m).foldLeft(df) { (acc, k) =>
      acc.unionByName(shifts.foldLeft(df) { case (d, (c, span)) =>
        d.withColumn(c, col(c) + lit(k * span))
      })
    }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/root/repo/out/sf1"
    val m = if (args.length > 2) args(2).toInt else 10
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // gate on the commit marker, not the directory: a run killed
    // mid-write leaves a partial dir that a bare exists() would
    // silently accept and every later bench would measure garbage
    def done(t: String) =
      fs.exists(new org.apache.hadoop.fs.Path(s"$out/$t.parquet/_SUCCESS"))

    // documents + embeddings: profile-matched synthetic text/vectors
    ScaleProbe.genFixture(spark, base, out, m)

    // fixed-size dims copy through unchanged
    for (t <- Seq("nation", "region") if !done(t))
      spark.read.parquet(s"$base/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")

    val C = 15000L; val S = 1000L; val P = 20000L; val O = 150000L
    val E = 100000L; val U = 1500L
    def gen(t: String, shifts: (String, Long)*): Unit = if (!done(t)) {
      // events.ts is TIMESTAMP(NANOS): read as long, write as long —
      // Tables.loadEvents converts both layouts the same way
      if (t == "events")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$base/$t.parquet")
      // spans are sf0.1 cardinalities; amplifying a base whose keys
      // exceed them would collide slices — fail instead of corrupting
      val mxCols = shifts.map { case (c, _) => max(col(c)).as(c) }
      val mx = df.agg(mxCols.head, mxCols.tail: _*).head
      shifts.zipWithIndex.foreach { case ((c, span), i) =>
        val v = mx.getAs[Number](i).longValue
        require(v < span,
          s"$t.$c max $v >= shift span $span — base $base is " +
            "not the sf0.1-shaped fixture this tool's spans assume")
      }
      replicate(df, m, shifts: _*)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    gen("customer", "c_custkey" -> C)
    gen("supplier", "s_suppkey" -> S)
    gen("part", "p_partkey" -> P)
    gen("orders", "o_orderkey" -> O, "o_custkey" -> C)
    gen("lineitem", "l_orderkey" -> O, "l_partkey" -> P, "l_suppkey" -> S)
    gen("events", "event_id" -> E, "user_id" -> U)
    println(s"""{"fixture":"$out","m":$m,"base":"$base"}""")
    spark.stop()
  }
}
