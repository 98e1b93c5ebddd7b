package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("wordShingleStrings kernel equals the shingles Column expression") {
    import spark.implicits._
    // fixture docs (all langs) + adversarial edges: short, empty,
    // whitespace-heavy, exactly-5-token, unicode
    val fixture = graft.core.Tables.load(spark, sf("sf0.001"), "documents")
      .select($"text").as[String].collect().toSeq
    val edges = Seq("", "   ", "one", "a b c d e", "a  b\tc\nd  e f",
      "JOSÉ über naïve 北京 😀 one two more words here")
    val df = (fixture ++ edges).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val viaExpr = df.select($"doc_id", Dedup.shingles($"text").as("sh"))
      .as[(Long, Seq[String])].collect().map { case (id, sh) => id -> sh.sorted.toList }.toMap
    val viaKernel = df.select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> Dedup.wordShingleStrings(t).sorted.toList }.toMap
    assert(viaExpr.keySet == viaKernel.keySet)
    for ((id, sh) <- viaExpr) assert(sh == viaKernel(id), s"doc $id")
  }

  test("minhash-LSH finds a planted near-duplicate and skips unrelated docs") {
    // 1 edited token of 100 → 5 of 96 shingles change → J = 91/101 ≈ 0.90
    val base = (1 to 100).map(i => s"word-$i").mkString(" ")
    val nearDup = base.replace("word-50 ", "changed ")
    val other = (100 to 200).map(i => s"other$i").mkString(" ")
    val out = Dedup.neardupMinhash(docs(1L -> base, 2L -> nearDup, 3L -> other))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L)))
  }

  test("identical docs have jaccard 1.0") {
    val t = "alpha beta gamma delta epsilon zeta eta"
    val out = Dedup.neardupMinhash(docs(1L -> t, 2L -> t)).collect()
    assert(out.length == 1 && out.head.getDouble(2) == 1.0)
  }

  test("char 8-gram minhash finds a planted near-dup with the 16x8 banding") {
    val base = (1 to 120).map(i => s"token-$i").mkString(" ")
    val nearDup = base.replace("token-60 ", "") // tiny char-level edit
    val other = (1 to 120).map(i => s"zzz-$i").mkString(" ")
    val pairs = Dedup.neardupMinhash(
      docs(1L -> base, 2L -> nearDup, 3L -> other),
      0.85, Dedup.charNgramHashes(_, 8), rowsPerBand = 8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("simhash: identical token multisets collide, edits stay within small hamming") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val shuffled = (1 to 60).map(i => s"tok$i").reverse.mkString(" ")
    val edited = base.replace("tok30", "xx")
    val m = Dedup.simhash(docs(1L -> base, 2L -> shuffled, 3L -> edited))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L)) // order-insensitive
    val ham = java.lang.Long.bitCount(m(1L) ^ m(3L))
    assert(ham > 0 && ham <= 12, s"hamming=$ham")
  }

  test("simhashNeardup banding finds hamming<=3 pairs via equi-join") {
    val base = (1 to 200).map(i => s"w$i").mkString(" ")
    val edited = base.replace("w100 ", "") // tiny multiset change
    val far = (1 to 200).map(i => s"z$i").mkString(" ")
    val pairs = Dedup.simhashNeardup(docs(1L -> base, 2L -> edited, 3L -> far))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("embedding neardup finds planted high-cosine pair only") {
    import spark.implicits._
    val rnd = new scala.util.Random(1)
    def vec() = Array.fill(16)(rnd.nextGaussian().toFloat)
    val a = vec()
    val aJit = a.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
    val emb = Seq((1L, a), (2L, aJit), (3L, vec()), (4L, vec()))
      .toDF("vec_id", "embedding")
    val out = Dedup.embeddingNeardup(emb, 0.95)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L)))
  }

  test("char n-grams index codepoints, not UTF-16 units (oracle parity)") {
    // 7 astral-plane codepoints = 14 UTF-16 units: the short-doc guard
    // must fire on the CODEPOINT count, like DuckDB's length()
    val sevenEmoji = "🎉" * 7 // 🎉 ×7
    assert(Dedup.charNgramHashes(sevenEmoji, 8).length == 1)
    // 9 codepoints → 2 overlapping 8-grams; UTF-16 indexing would give 11
    val nineEmoji = "🎉" * 9
    assert(Dedup.charNgramHashes(nineEmoji, 8).length == 2)
    // ASCII path unchanged: m - n + 1 shingles
    assert(Dedup.charNgramHashes("abcdefghij", 8).length == 3)
  }

  test("portable simhash: md5-bit fingerprint is order-insensitive; edits stay near") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val shuffled = (1 to 60).map(i => s"tok$i").reverse.mkString(" ")
    val edited = base.replace("tok30", "xx")
    val m = Dedup.simhashPortable(docs(1L -> base, 2L -> shuffled, 3L -> edited))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L).matches("[0-9a-f]{16}"), m(1L))
    assert(m(1L) == m(2L)) // majority vote over the multiset: order-free
    def ham(a: String, b: String): Int = a.zip(b).map { case (x, y) =>
      Integer.bitCount(Character.digit(x, 16) ^ Character.digit(y, 16))
    }.sum
    val d = ham(m(1L), m(3L))
    assert(d > 0 && d <= 12, s"hamming=$d")
  }

  test("LSH plan contains no cartesian product") {
    val plan = Dedup.neardupMinhash(
      docs(1L -> "a b c d e f", 2L -> "a b c d e g")).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(500))
  }

  test("dedupClusters: transitivity via label propagation, singletons keep their id") {
    import spark.implicits._
    // chain 1-2, 2-3 (1 and 3 NOT directly paired) must collapse to one
    // cluster labeled min=1; 4-5 a separate pair; 6 a singleton. The
    // 3-chain needs >1 propagation round, exercising the fixpoint loop.
    val d = Seq(1L, 2L, 3L, 4L, 5L, 6L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.9), (4L, 5L, 0.85))
      .toDF("doc_a", "doc_b", "jaccard")
    val out = Dedup.dedupClusters(d, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("semanticPairsIvf finds a planted near-identical pair and no spurious ones") {
    import spark.implicits._
    // 60 well-separated one-hot-ish vectors + one planted near-dup of
    // vec 0: cluster pruning must co-locate the planted pair (cos≈1 ⇒
    // same nearest centroids) and the exact within-cluster cosine must
    // reject everything else (orthogonal ⇒ cos 0).
    val dim = 8
    val base = (0 until 60).map { i =>
      val v = Array.fill(dim)(0.001f * (i % 3)); v(i % dim) = 1.0f
      (i.toLong, v)
    }
    val planted = {
      val v = base.head._2.clone(); v(1) = v(1) + 0.01f
      (999L, v)
    }
    val emb = (base :+ planted).toDF("vec_id", "embedding")
    val got = Dedup.semanticPairsIvf(emb, 0.95, nlist = 4, nassign = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 999L)), s"planted pair missing: $got")
    // every surviving pair must be a genuine cos>=0.95 pair: same one-hot axis
    assert(got.forall { case (a, b) => (a % dim) == (if (b == 999L) 0L else b % dim) }, got)
  }

  test("semanticPairsIvf: zero vectors never pair (no cosine exists for them)") {
    import spark.implicits._
    // two zero vectors co-located with two genuine near-dups: the
    // norm-factored predicate dot >= t*na*nb degenerates to 0 >= 0 for a
    // zero norm, so without the norm guard the zero vectors would pair
    // with every co-clustered vector AND each other
    val dim = 4
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.01f)),
      (1L, Array(1.0f, 0.0f, 0.0f, 0.02f)),
      (2L, Array.fill(dim)(0.0f)),
      (3L, Array.fill(dim)(0.0f))).toDF("vec_id", "embedding")
    val got = Dedup.semanticPairsIvf(emb, 0.9, nlist = 1, nassign = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L)), s"zero vectors paired: $got")
  }

  test("dedupClusters: a 128-node path collapses in O(log n) rounds (pointer jumping)") {
    import spark.implicits._
    // worst-case diameter: a single path 0-1-2-...-127. Plain min-label
    // propagation needs ~127 rounds; with pointer jumping the label
    // travels 2^k hops after k rounds, so the loop must finish well
    // under the plain-propagation bound. Rounds are observable as
    // localCheckpoint calls — count Spark jobs instead: cheap proxy is
    // wall-bounded correctness (all 128 labeled 0) which a
    // non-converging or wrongly-jumping loop fails.
    val n = 128
    val d = (0L until n.toLong).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = (0L until (n - 1).toLong).map(i => (i, i + 1, 0.9))
      .toDF("doc_a", "doc_b", "jaccard")
    val out = Dedup.dedupClusters(d, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == n && out.values.forall(_ == 0L))
  }

  test("dedupClusters: empty pair set labels every doc as its own cluster") {
    import spark.implicits._
    val d = Seq(7L, 8L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq.empty[(Long, Long, Double)].toDF("doc_a", "doc_b", "jaccard")
    val out = Dedup.dedupClusters(d, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(7L -> 7L, 8L -> 8L))
  }

  test("substring dedup: exact path finds k-gram shares; winnow keeps the long-match guarantee") {
    import spark.implicits._
    val passage = "the quick brown fox jumps over the lazy dog near the river bank"
    val docs = Seq(
      (1L, s"alpha unique opening words $passage and a distinct tail one"),
      (2L, s"totally different beginning here $passage closing differently"),
      (3L, "no shared content at all in this one just filler words abc"),
      (4L, "short")).toDF("doc_id", "text")
    val exact = Dedup.substringDupPairs(docs, 24).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(exact.toSeq == Seq((1L, 2L)), exact.mkString(", "))
    // the shared passage is 64 chars >= w+k-1 = 39 → the winnowed join
    // MUST also pair them (the Schleimer guarantee, not luck)
    val winGrams = Seq(1L, 2L).map { id =>
      val t = docs.filter($"doc_id" === id).head.getString(1)
      Dedup.winnowedGramSet(t, 24, 16)
    }
    assert(winGrams(0).intersect(winGrams(1)).nonEmpty, "guarantee violated")
    // density: winnowed selection is a small fraction of all grams
    val t1 = docs.filter($"doc_id" === 1L).head.getString(1)
    val density = Dedup.winnowedGramSet(t1, 24, 16).size.toDouble /
      Dedup.charGramSet(t1, 24).size
    assert(density < 0.5, s"density $density")
    // short docs yield nothing, empty input is safe
    assert(Dedup.charGramSet("short", 24).isEmpty)
    assert(Dedup.winnowedGramSet("short", 24, 16).isEmpty)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.substringDupPairs(empty, 24).count() == 0)
  }

  test("gramHashSet ≡ charGramSet.map(stringHash) bit-for-bit (property)") {
    // the allocation-free posting kernel must emit EXACTLY the hash set
    // of the string composition it replaced (r20 optimization) —
    // including multi-char whitespace normalization, case folding,
    // repeated grams, and astral codepoints (surrogate pairs hash as
    // their two UTF-16 units, like String.charAt)
    val rnd = new scala.util.Random(7)
    val astral = new String(Character.toChars(0x1F600))
    def randText(n: Int) = (0 until n).map { _ =>
      rnd.nextInt(8) match {
        case 0 => " "
        case 1 => "\t"
        case 2 => "Q"
        case 3 => astral
        case _ => ('a' + rnd.nextInt(26)).toChar.toString
      }
    }.mkString
    val cases = Seq("", "short", "a b  c\td " * 10) ++
      (1 to 20).map(_ => randText(20 + rnd.nextInt(120)))
    for (t <- cases; k <- Seq(5, 24)) {
      val expected = Dedup.charGramSet(t, k).map(graft.functions.Hashing.stringHash)
      val got = Dedup.gramHashSet(t, k)
      assert(got.length == got.distinct.length, s"dup hashes for k=$k '$t'")
      assert(got.toSet == expected, s"hash set drift for k=$k '$t'")
    }
  }

  test("winnowing guarantee holds on randomized shared passages (property)") {
    val rnd = new scala.util.Random(42)
    def randText(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    for (_ <- 1 to 20) {
      val shared = randText(39) // exactly the guarantee length w+k-1
      val a = randText(rnd.nextInt(60)) + shared + randText(rnd.nextInt(60))
      val b = randText(rnd.nextInt(60)) + shared + randText(rnd.nextInt(60))
      val ga = Dedup.winnowedGramSet(a, 24, 16)
      val gb = Dedup.winnowedGramSet(b, 24, 16)
      assert(ga.intersect(gb).nonEmpty,
        s"guarantee violated for shared=$shared")
    }
  }

  test("fuzzyMatch: blocked edit-distance pairs, no cross-block leaks, keyed plan") {
    import spark.implicits._
    val items = Seq(
      (1L, "B1", 5, "small ring"),
      (2L, "B1", 5, "small rings"),  // dist 1, same block → match
      (3L, "B1", 5, "hot gear"),     // dist > 5 from the rings
      (4L, "B2", 5, "small ring")    // identical name, DIFFERENT block → no pair
    ).toDF("p_partkey", "p_brand", "p_size", "p_name")
    val df = Dedup.fuzzyMatch(items, Seq("p_brand", "p_size"), "p_partkey", "p_name", 5)
    val out = df.collect().map(r =>
      (r.getAs[Long]("key_a"), r.getAs[Long]("key_b"), r.getAs[Int]("dist")))
    assert(out.toSeq == Seq((1L, 2L, 1)), out.mkString(", "))
    // the blocking join is keyed — never a cartesian product
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan.take(2000))
    // empty input: empty output, no exception
    val empty = Seq.empty[(Long, String, Int, String)]
      .toDF("p_partkey", "p_brand", "p_size", "p_name")
    assert(Dedup.fuzzyMatch(empty, Seq("p_brand", "p_size"), "p_partkey", "p_name", 5).count() == 0)
  }

  test("substringDupPairsRuns: exact mode equals the join formulation, maxRun caps runs to star edges") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog again"
    val other = "completely different shared passage of enough length here"
    val docs = Seq(
      (1L, s"alpha $shared one"), (2L, s"beta $shared two"),
      (3L, s"gamma $shared three"), (4L, s"delta $shared four"),
      (5L, s"epsilon $shared five"),
      (6L, s"first $other x"), (7L, s"second $other y"),
      (8L, "no overlap with anything whatsoever in this document text")
    ).toDF("doc_id", "text")
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").as[(Long, Long)].collect().sorted.toSeq
    val viaJoin = sorted(Dedup.substringDupPairs(docs, 24))
    val viaRuns = sorted(Dedup.substringDupPairsRuns(docs, 24))
    assert(viaRuns == viaJoin, "uncapped runs must be pair-identical to the join")
    // the 5-doc clique is present uncapped
    assert(viaJoin.count { case (a, b) => a <= 5 && b <= 5 } == 10)
    // maxRun = 3: every oversized run emits star edges from its min doc.
    // The cap is PER RUN — smaller (boundary-gram) runs still emit their
    // full pairs — so the contract is: a SUBSET of the exact pairs,
    // strictly smaller on the big clique, with connectivity and the
    // component minimum preserved (what dedupClusters/keep-best consume).
    val capped = sorted(Dedup.substringDupPairsRuns(docs, 24, maxRun = 3))
    assert(capped.toSet.subsetOf(viaJoin.toSet), "capping must not invent pairs")
    val cappedClique = capped.filter { case (a, b) => a <= 5 && b <= 5 }
    assert(cappedClique.size < 10, "the 5-doc run must not emit all C(5,2) pairs")
    assert(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).forall(cappedClique.contains),
      "the star from the run minimum must keep the component connected with min 1")
    assert(capped.contains((6L, 7L)))
    assert(!capped.exists { case (a, b) => a == 8L || b == 8L })
  }

  test("fuzzyMatch name-prefix salt: finer blocks, explicit recall trade at the prefix boundary") {
    import spark.implicits._
    val items = Seq(
      (1L, "B1", 5, "widget alpha"),
      (2L, "B1", 5, "widget alphq"), // dist 1 vs #1, same first char
      (3L, "B1", 5, "xidget alpha"), // dist 1 vs #1 — but the edit is IN the prefix
      (4L, "B1", 5, "zzz unrelated entirely")
    ).toDF("p_partkey", "p_brand", "p_size", "p_name")
    def pairs(salt: Int) =
      Dedup.fuzzyMatch(items, Seq("p_brand", "p_size"), "p_partkey", "p_name", 5,
          namePrefixSalt = salt)
        .select("key_a", "key_b").as[(Long, Long)].collect().sorted.toSeq
    // coarse key: all three near-names pair up
    assert(pairs(0) == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    // salt 1: (1,2) survive (shared 'w' prefix); pairs with #3 are the
    // documented recall trade — the edit sits inside the blocking prefix
    assert(pairs(1) == Seq((1L, 2L)))
    // schema/columns identical with and without the salt (no _blk leak)
    assert(Dedup.fuzzyMatch(items, Seq("p_brand", "p_size"), "p_partkey", "p_name", 5,
        namePrefixSalt = 2).columns.toSeq ==
      Seq("p_brand", "p_size", "key_a", "key_b", "name_a", "name_b", "dist"))
  }
}
