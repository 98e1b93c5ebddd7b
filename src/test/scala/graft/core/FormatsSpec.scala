package graft.core

import java.nio.file.Files

import graft.SparkSpec

/** Source/sink format coverage (SURVEY.md §2B scans/sinks row): the same
  * relation round-trips through parquet, CSV, JSON and text with the
  * declared (never inferred) schemas. */
class FormatsSpec extends SparkSpec {

  test("nation round-trips through csv and json with the declared schema") {
    val root = Files.createTempDirectory("graft-fmt").toString
    val nation = Tables.load(spark, sf("sf0.001"), "nation")
    val expected = nation.orderBy("n_nationkey").collect().toSeq

    nation.write.mode("overwrite").option("header", "true").csv(s"$root/csv")
    val fromCsv = spark.read.schema(Tables.nation).option("header", "true")
      .csv(s"$root/csv").orderBy("n_nationkey").collect().toSeq
    assert(fromCsv == expected)

    nation.write.mode("overwrite").json(s"$root/json")
    val fromJson = spark.read.schema(Tables.nation).json(s"$root/json")
      .select(nation.columns.map(org.apache.spark.sql.functions.col): _*)
      .orderBy("n_nationkey").collect().toSeq
    assert(fromJson == expected)
  }

  test("text format carries raw lines") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-txt").toString
    val names = Tables.load(spark, sf("sf0.001"), "region")
      .select($"r_name").as[String].collect().sorted
    Tables.load(spark, sf("sf0.001"), "region").select($"r_name")
      .write.mode("overwrite").text(s"$root/txt")
    val back = spark.read.text(s"$root/txt").as[String].collect().sorted
    assert(back.toSeq == names.toSeq)
  }
}
