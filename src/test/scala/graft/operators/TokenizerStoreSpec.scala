package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class TokenizerStoreSpec extends SparkSpec {

  private def docs = Tables.load(spark, sf("sf0.001"), "documents")

  test("persisted BPE encode equals the composed re-learning row bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("tok-bpe").toString
    TokenizerStore.trainBpe(docs, dir, 8, 256)
    val persisted = TokenizerStore.encodeBpe(docs, dir)
      .orderBy(col("doc_id")).collect().toSeq
    val composed = TextAnalysis.bpeEncodeStats(docs, 8, 256)
      .orderBy(col("doc_id")).collect().toSeq
    assert(persisted.nonEmpty && persisted == composed)
  }

  test("persisted bigram-LM score equals the composed train-and-score row bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("tok-lm").toString
    TokenizerStore.trainBigramLm(docs, dir)
    val persisted = TokenizerStore.scoreBigramLm(docs, dir)
      .orderBy(col("doc_id")).collect().toSeq
    val composed = TextAnalysis.bigramLmScore(docs)
      .orderBy(col("doc_id")).collect().toSeq
    assert(persisted.nonEmpty && persisted == composed)
  }

  test("train-once/encode-many: a frozen tokenizer prices corpora it never trained on") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tok-frozen").toString
    TokenizerStore.trainBpe(docs, dir, 8, 256)
    val merges = TokenizerStore.loadMerges(spark, dir)
    assert(merges.nonEmpty && merges.size <= 8)
    // a held-out corpus: unseen words must pass through with only the
    // LEARNED merges applied (never retrained mid-encode) — chars minus
    // the applicable merge count, exactly what a frozen tokenizer does
    val held = Seq((1L, "zqx unseenword zqx"), (2L, "aaaa"))
      .toDF("doc_id", "text")
    val out = TokenizerStore.encodeBpe(held, dir)
      .orderBy(col("doc_id")).collect()
    assert(out.length == 2)
    val byId = out.map(r => r.getLong(0) -> r.getLong(2)).toMap // n_bpe_tokens
    // with no applicable merges, token count == char count; any learned
    // merge can only shrink it — never grow it
    assert(byId(1L) <= "zqxunseenwordzqx".length)
    assert(byId(2L) <= 4)
    // and the frozen table is byte-stable across reloads (ordered read)
    assert(TokenizerStore.loadMerges(spark, dir) == merges)
  }

  test("token-id sequences decode back to their words; counts agree with the stats row") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tok-ids").toString
    TokenizerStore.trainBpe(docs, dir, 8, 256)
    val vocab = TokenizerStore.bpeVocab(spark, dir)
    // ids are unique (first-wins collision policy keeps the map a
    // bijection onto its id range), so decoding is well-defined
    assert(vocab.values.toSeq.distinct.size == vocab.size)
    // the id assignment is part of the contract (xt_bpe_vocab): base
    // chars a..z0..9 hold ids 0..35 in that fixed order
    assert(vocab("a") == 0 && vocab("z") == 25 && vocab("0") == 26 && vocab("9") == 35)
    val inv = vocab.map(_.swap)
    val rows = TokenizerStore.encodeBpeIds(docs, dir)
      .select($"doc_id", $"word", $"n_sym", $"ids")
      .as[(Long, String, Int, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, word, nSym, ids) =>
      val seq = ids.split(",").map(_.toInt)
      assert(seq.length == nSym)
      // LOSSLESS: the id sequence concatenates back to the exact word —
      // the property that makes it model input rather than a statistic
      assert(seq.map(inv).mkString == word, s"$word decoded wrong: $ids")
    }
    // and the pricing row is the aggregate of the id rows: per doc,
    // sum(n_sym) must equal encodeBpe's n_bpe_tokens
    val fromIds = rows.groupBy(_._1).view.mapValues(_.map(_._3.toLong).sum).toMap
    val stats = TokenizerStore.encodeBpe(docs, dir)
      .select($"doc_id", $"n_bpe_tokens").as[(Long, Long)].collect().toMap
    assert(fromIds == stats)
  }

  test("decodeBpeIds detokenizes whole documents: gated words in token-" +
      "position order, lossless computed (not asserted) per doc") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tok-detok").toString
    TokenizerStore.trainBpe(docs, dir, 8, 256)
    // mixed gated/ungated words: only [a-z0-9]+ survivors reassemble,
    // in order, across the gate gaps
    val mixed = Seq(
      (1L, "alpha BETA! beta gamma-42 delta 9lives"),
      (2L, "///   zeta   "),
      (3L, "!!! ??? ---")) // fully gated out -> absent from the output
      .toDF("doc_id", "text")
    val got = TokenizerStore.decodeBpeIds(mixed, dir)
      .select($"doc_id", $"n_words", $"text_detok", $"lossless")
      .as[(Long, Int, String, Boolean)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L))
    val m = got.map(r => r._1 -> r).toMap
    assert(m(1L)._3 == "alpha beta delta 9lives" && m(1L)._2 == 4)
    assert(m(1L)._4, "round trip not lossless on the mixed doc")
    assert(m(2L)._3 == "zeta" && m(2L)._4)
    // and on the real fixture every doc round-trips lossless
    val bad = TokenizerStore.decodeBpeIds(docs, dir)
      .filter(!$"lossless").count()
    assert(bad == 0, s"$bad fixture docs failed the decode round trip")
  }

  test("scoring refuses a missing or torn artifact instead of silently skipping the model") {
    val dir = java.nio.file.Files.createTempDirectory("tok-torn").toString
    val e = intercept[IllegalArgumentException] {
      TokenizerStore.scoreBigramLm(docs, dir)
    }
    assert(e.getMessage.contains("_SUCCESS") || e.getMessage.contains("missing"),
      e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      TokenizerStore.encodeBpe(docs, dir)
    }
    assert(e2.getMessage.contains("missing") || e2.getMessage.contains("_SUCCESS"),
      e2.getMessage)
  }

  test("ensureTokenizerFor trains once and reuses the warehouse artifact") {
    var trains = 0
    // fresh tag per run: the warehouse marker survives ACROSS JVMs by
    // design, so a fixed tag would find the previous run's artifact
    val tag = s"spec-bpe-${java.util.UUID.randomUUID().toString.take(8)}"
    def ensure() = TokenizerStore.ensureTokenizerFor(spark,
      s"${sf("sf0.001")}/documents.parquet", tag,
      d => { trains += 1; TokenizerStore.trainBpe(docs, d, 8, 256) })
    val d1 = ensure()
    assert(trains == 1)
    assert(ensure() == d1 && trains == 1, "matching marker must be reused")
    // the tokenizer family's warehouse namespace is its own (an index
    // artifact with the same tag could never collide)
    assert(d1.contains("graft-tok-"))
  }
}
