package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Golden cases mirror Go strconv.Quote(string(b)) output byte-for-byte
  * (reference main.go:113 renders payloads with fmt %q). */
class GoQuoteSpec extends AnyFunSuite {
  private def q(bytes: Int*): String = GoQuote.quote(bytes.map(_.toByte).toArray)
  private def qs(s: String): String = GoQuote.quote(s.getBytes("UTF-8"))

  test("plain ascii") { assert(qs("hello") == "\"hello\"") }
  test("empty") { assert(qs("") == "\"\"") }
  test("quote and backslash escaped") {
    assert(qs("a\"b") == "\"a\\\"b\"")
    assert(qs("a\\b") == "\"a\\\\b\"")
  }
  test("control shorthands") {
    assert(qs("\n\t\r") == "\"\\n\\t\\r\"")
    assert(q(0x07, 0x08, 0x0b, 0x0c) == "\"\\a\\b\\v\\f\"")
  }
  test("other control bytes as \\xNN") {
    assert(q(0x00, 0x01, 0x1f, 0x7f) == "\"\\x00\\x01\\x1f\\x7f\"")
  }
  test("invalid utf-8 bytes as \\xNN") {
    assert(q(0xff, 0xfe) == "\"\\xff\\xfe\"")
    assert(q(0x80) == "\"\\x80\"") // stray continuation
    assert(q(0xc0, 0x80) == "\"\\xc0\\x80\"") // overlong NUL
    assert(q(0xed, 0xa0, 0x80) == "\"\\xed\\xa0\\x80\"") // surrogate
    assert(q(0xf4, 0x90, 0x80, 0x80) == "\"\\xf4\\x90\\x80\\x80\"") // >U+10FFFF
    assert(q('a', 0xc3) == "\"a\\xc3\"") // truncated tail
  }
  test("printable unicode passes through") {
    assert(qs("caf\u00e9") == "\"caf\u00e9\"")
    assert(qs("\u4e2d\u6587") == "\"\u4e2d\u6587\"")
    val smile = new String(Character.toChars(0x1f600))
    assert(qs(smile) == "\"" + smile + "\"")
  }
  test("non-printable unicode escapes") {
    assert(qs("\u00a0") == "\"\\u00a0\"") // no-break space: Zs, not printable
    assert(qs("\u200b") == "\"\\u200b\"") // zero-width space
    val tag = new String(Character.toChars(0xe0001)) // Cf beyond BMP
    assert(qs(tag) == "\"\\U000e0001\"")
  }

  test("property: printable-ascii round trip is identity modulo quotes") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val s = Seq.fill(rnd.nextInt(40))((0x20 + rnd.nextInt(0x5f)).toChar)
        .mkString.filterNot(c => c == '"' || c == '\\')
      assert(GoQuote.quote(s.getBytes("UTF-8")) == "\"" + s + "\"")
    }
  }
  test("native expression agrees with the kernel, handles null, works from SQL") {
    val spark = graft.core.GraftSession.builder("local[4]", 4).getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(11)
    val payloads: Seq[Array[Byte]] =
      Seq("plain".getBytes, Array[Byte](0, 0x7f, -1, -2), Array.emptyByteArray) ++
        Seq.fill(20)(Array.fill(rnd.nextInt(32))(rnd.nextInt(256).toByte))
    val viaExpr = payloads.toDF("p")
      .select(GoQuoteExpr.native(col("p"))).as[String].collect()
    assert(viaExpr.toSeq == payloads.map(GoQuote.quote))
    val nullRow = Seq(Option.empty[Array[Byte]]).toDF("p")
      .select(GoQuoteExpr.native(col("p"))).collect()
    assert(nullRow.head.isNullAt(0))
    // SQL surface via GraftExtensions
    val viaSql = spark.sql("SELECT go_quote(CAST('hi\n' AS BINARY)) AS q")
      .collect().head.getString(0)
    assert(viaSql == "\"hi\\n\"")
  }

  test("property: output is always quoted and never raw-control") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val bs = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      val out = GoQuote.quote(bs)
      assert(out.head == '"' && out.last == '"')
      assert(!out.exists(c => c < 0x20)) // all control bytes escaped
    }
  }
}
