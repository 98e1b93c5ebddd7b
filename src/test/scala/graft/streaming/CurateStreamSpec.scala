package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental curation over a growing parquet directory: within-batch
  * keep-first, cross-batch dedup via the persisted key store, and the
  * repetition/split stages — across two AvailableNow passes with one
  * checkpoint, the way daily crawl drops run. */
class CurateStreamSpec extends SparkSpec {

  private def doc(id: Long, text: String) =
    (id, text, "en", "s", text.length.toLong)

  private def longText(seed: Long): String =
    s"doc $seed " + Seq.tabulate(40)(j => s"w${seed}_$j").mkString(" ")

  test("two drops: within-batch and cross-batch duplicates collapse, new docs flow") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("curatestream").toString
    val inDir = s"$root/in"; val outDir = s"$root/out"; val ck = s"$root/ck"
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")

    // drop 1: docs 1-3 distinct; doc 4 duplicates doc 1's text (whitespace
    // edit — normText collapses it); doc 5 is too short for the filter
    Seq(doc(1, longText(1)), doc(2, longText(2)), doc(3, longText(3)),
        doc(4, "  " + longText(1).toUpperCase + " "), doc(5, "too short"))
      .toDF(cols: _*).write.parquet(s"$inDir/drop1.parquet")
    // each drop is a parquet directory under inDir → glob one level down
    CurateStream.runOnce(spark, s"$inDir/*", outDir, ck)

    val after1 = spark.read.parquet(s"$outDir/data")
    assert(after1.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(spark.read.parquet(s"$outDir/_keys").count() == 3)

    // drop 2: doc 6 re-posts doc 2's text (cross-batch dup), doc 7 is new
    Seq(doc(6, longText(2)), doc(7, longText(7)))
      .toDF(cols: _*).write.parquet(s"$inDir/drop2.parquet")
    CurateStream.runOnce(spark, s"$inDir/*", outDir, ck)

    val after2 = spark.read.parquet(s"$outDir/data")
    assert(after2.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 7L))
    // split labels present and deterministic (md5 of doc_id)
    assert(after2.filter($"split".isin("train", "val", "test")).count() == 4)
    assert(spark.read.parquet(s"$outDir/_keys").count() == 4)

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }
}
