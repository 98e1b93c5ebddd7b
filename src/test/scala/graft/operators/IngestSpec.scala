package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.SparkSpec
import graft.streaming.IngestStream

/** LogEntry serialization semantics (reference main.go:43-53, 101-116):
  * omitempty field dropping, hex/%q projections, severity, RFC3339. */
class IngestSpec extends SparkSpec {

  private def entryJson(payload: Array[Byte]): String = {
    import spark.implicits._
    Seq((Timestamp.valueOf("2024-01-01 10:00:00"), payload, "1.2.3.4"))
      .toDF("ts", "payload", "client_ip")
      .select(Ingest.toJson(Ingest.logEntry($"ts", $"payload", $"client_ip")).as("j"))
      .as[String].head()
  }

  test("LogEntry golden: full record") {
    assert(entryJson("hi\n".getBytes) ==
      """{"timestamp":"2024-01-01T10:00:00Z","level":"INFO","message":"received 3 bytes","client_ip":"1.2.3.4","byte_count":3,"binary_data_hex":"68690a","binary_data_string":"\"hi\\n\""}""")
  }

  test("LogEntry omitempty: zero-byte payload drops count/hex/string (Go omitempty int quirk)") {
    val j = entryJson(Array.emptyByteArray)
    assert(j ==
      """{"timestamp":"2024-01-01T10:00:00Z","level":"WARN","message":"received 0 bytes","client_ip":"1.2.3.4"}""")
  }

  test("hex is lowercase like Go %x") {
    import spark.implicits._
    val h = Seq(Array[Byte](0x0a, 0x7f, -1)).toDF("p")
      .select(Ingest.hexLower($"p")).as[String].head()
    assert(h == "0a7fff")
  }

  test("streaming transform filters empties and matches batch pipeline") {
    import spark.implicits._
    val df = Seq(
      ("a".getBytes, Timestamp.valueOf("2024-01-01 00:00:01"), "c1"),
      (Array.emptyByteArray, Timestamp.valueOf("2024-01-01 00:00:02"), "c2"))
      .toDF("payload", "ts", "client_ip")
    val out = IngestStream.transformJson(df).select($"value").as[String].collect()
    assert(out.length == 1 && out.head.contains("\"client_ip\":\"c1\""))
    val flat = IngestStream.transform(df).select($"client_ip").as[String].collect()
    assert(flat.toSeq == Seq("c1"))
  }

  test("LogEntry JSON round-trips through from_json (omitempty = absent, not null-literal)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("timestamp", StringType), StructField("level", StringType),
      StructField("message", StringType), StructField("client_ip", StringType),
      StructField("byte_count", IntegerType), StructField("binary_data_hex", StringType),
      StructField("binary_data_string", StringType)))
    val js = Seq(entryJson("hi\n".getBytes), entryJson(Array.emptyByteArray)).toDF("j")
      .select(from_json($"j", schema).as("e")).select($"e.*")
      .collect()
    assert(js(0).getAs[String]("binary_data_hex") == "68690a")
    assert(js(0).getAs[Int]("byte_count") == 3)
    // omitted fields parse back as nulls
    assert(js(1).isNullAt(js(1).fieldIndex("byte_count")))
    assert(js(1).getAs[String]("level") == "WARN")
  }

  test("q12 queries run on sf0.001 and agree with documents count") {
    val docs = graft.core.Tables.load(spark, sf("sf0.001"), "documents").count()
    val q = graft.SparkEntry.queries
    assert(q("q12_ingest_hex")(spark, sf("sf0.001")).count() == docs)
    assert(q("q12_ingest_logentry")(spark, sf("sf0.001")).count() == docs)
  }
}
