package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

import graft.core.{Num, Tables}

/** Text-analysis operators for a training-data pipeline (SURVEY.md §2B X3
  * + extension surface): token statistics, quality scoring, language ID,
  * fingerprinting, term frequency. All are map-only projections or single
  * keyed aggregations — nothing here shuffles more than once at 100 TB.
  */
object TextAnalysis {
  import Dedup.{normText, tokens}

  // ------------------------------------------------------- token stats
  /** BPE-ish pre-tokenizer: letter runs, single digits, single
    * non-alnum marks (the common BPE vocab shape). Simple character
    * classes only so Java regex and RE2 agree byte-for-byte. */
  private val BpeIsh = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  private def xtTokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(
        $"doc_id",
        length($"text").as("n_chars"),
        octet_length($"text").as("n_bytes"),
        size(split(trim($"text"), "\\s+")).as("ws_tokens"),
        size(regexp_extract_all($"text", lit(BpeIsh), lit(0))).as("bpe_tokens"))
      .orderBy($"doc_id")
  }

  private val xtTokensSql =
    """SELECT doc_id,
      |  CAST(length(text) AS INTEGER) AS n_chars,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INTEGER) AS bpe_tokens
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- quality
  private val Stopwords = Seq("the", "a", "and", "of", "to", "in", "is")

  /** The quality columns as named expressions over a `text` column —
    * shared by [[qualityScored]] and [[Curation]]'s one-scan signal
    * table, so the two can never diverge. (def, not val: Column trees
    * are cheap to rebuild and a val would pin object-init order.) */
  private[operators] def qualityCols: Seq[(String, Column)] = {
    val w = tokens(col("text"))
    val nWords = size(w).cast(DoubleType)
    val stopHits = size(filter(w, t => t.isInCollection(Stopwords))).cast(DoubleType)
    val nChars = length(col("text")).cast(DoubleType)
    val punct = (nChars - length(regexp_replace(col("text"), "[^A-Za-z0-9\\s]", ""))) / nChars
    val digits = (nChars - length(regexp_replace(col("text"), "[0-9]", ""))) / nChars
    val stopRatio = stopHits / nWords
    val score = least(nWords / 100, lit(1.0)) * 0.3 + (lit(1.0) - punct) * 0.4 + stopRatio * 0.3
    // ratios/score are emitted UNROUNDED: every input is an exact integer
    // and the division/multiply order matches the oracle SQL exactly, so
    // the doubles are bit-identical across engines; rounding inside each
    // engine would diverge on half-way decimals (score 0.71925 rounds to
    // .7193 in Spark and .7192 in DuckDB) while the compare layer rounds
    // both sides with one implementation.
    Seq("n_words" -> nWords.cast(IntegerType),
      "punct_ratio" -> punct,
      "digit_ratio" -> digits,
      "stopword_ratio" -> stopRatio,
      "quality_score" -> score)
  }

  /** Length/punctuation/stopword quality heuristics + a linear composite
    * score. Pure +,*,/ arithmetic so Spark and the oracle agree
    * bit-exactly (no exp/log). Public: the curation keep-best policy
    * ([[Curation]] `xc_keep_best`) ranks duplicates by this score. */
  def qualityScored(docs: DataFrame): DataFrame =
    docs.select(col("doc_id") +: qualityCols.map { case (n, c) => c.as(n) }: _*)

  private def xtQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    qualityScored(Tables.load(spark, dir, "documents")).orderBy($"doc_id")
  }

  private[operators] val xtQualitySql = {
    s"""SELECT doc_id, n_words, punct_ratio, digit_ratio, stopword_ratio,
       |  least(n_words / 100.0, 1.0) * 0.3 + (1.0 - p) * 0.4 + sr * 0.3 AS quality_score
       |FROM (
       |  SELECT doc_id,
       |    CAST(len(w) AS INTEGER) AS n_words,
       |    p AS punct_ratio, p,
       |    (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) / CAST(length(text) AS DOUBLE) AS digit_ratio,
       |    sr AS stopword_ratio, sr
       |  FROM ($qualityInnerSql) t1) t2
       |ORDER BY doc_id""".stripMargin
  }

  /** SQL fragment shared with the keep-best oracle: (doc_id, text, w,
    * p, sr) — the tokenization + punct/stopword ratios. (defs, not
    * vals: xtQualitySql's initializer runs before later vals would be
    * assigned — object-init order.) */
  private[operators] def qualityInnerSql: String = {
    val stopList = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""SELECT doc_id, text,
       |      string_split(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') w,
       |      (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g'))) / CAST(length(text) AS DOUBLE) AS p,
       |      len(list_filter(string_split(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' '),
       |        t -> t IN ($stopList))) / CAST(len(string_split(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS DOUBLE) AS sr
       |    FROM documents""".stripMargin
  }

  /** (doc_id, quality_score) as a standalone SQL subquery — the
    * keep-best dedup oracle joins this against the cluster CTE. */
  private[operators] def qualityScoreSql: String =
    s"""SELECT doc_id,
       |  least(len(w) / 100.0, 1.0) * 0.3 + (1.0 - p) * 0.4 + sr * 0.3 AS quality_score
       |FROM ($qualityInnerSql) tq""".stripMargin

  // ------------------------------------------------------ language ID
  /** Tiny per-language stopword lexicons + CJK character ratio — the
    * classic n-gram/stopword heuristic. Deterministic; verified by unit
    * tests on labeled snippets (not SQL-expressible compactly). */
  private val Lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "it", "with"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "dans"),
    "es" -> Seq("el", "los", "que", "es", "una", "para", "con", "por"))

  def languageId(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // one tokenize pass: explode → broadcast lexicon join → per-doc hit
    // counts (all codegen'd; naive per-language lambda filters would
    // re-evaluate the tokenizer once per lexicon per row)
    val lex = Lexicons.flatMap { case (l, ws) => ws.map(w => (w, l)) }
      .toDF("token", "lex_lang")
    val hitCols = Lexicons.map { case (l, _) =>
      sum(when(col("lex_lang") === l, 1).otherwise(0)).cast(DoubleType).as(s"hits_$l")
    }
    val nChars = greatest(length(col("text")), lit(1)).cast(DoubleType)
    val cjk = (nChars - length(regexp_replace(col("text"), "[\\x{4e00}-\\x{9fff}]", ""))) / nChars
    // cjk is computed pre-explode and carried through the groupBy as a
    // (functionally dependent) key — ONE scan of docs, no self-join of
    // two derivations of the same input. The separate withColumn matters:
    // a generator select evaluates its non-generator expressions ABOVE
    // the Generate (once per token); as a lower Project the CJK regex
    // runs once per doc.
    val counts = docs
      .withColumn("cjk", cjk)
      .select(col("doc_id"), col("cjk"), explode(tokens(col("text"))).as("token"))
      .join(broadcast(lex), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(first(col("cjk")).as("cjk"),
        (count(lit(1)).cast(DoubleType).as("n_words") +: hitCols): _*)
    val scores = Lexicons.map { case (l, _) => l -> (col(s"hits_$l") / col("n_words")) }
    val best = scores.map(_._2).reduce(greatest(_, _))
    // zh wins on CJK presence; else argmax with first-listed tie-break;
    // no stopword hits at all → "und" (undetermined)
    val pred = when(col("cjk") > 0.05, "zh").otherwise(
      scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
        when(s === best && best > 0, lang).otherwise(acc)
      })
    counts.select(col("doc_id"), pred.as("lang_pred"))
  }

  private def xtLangid(spark: SparkSession, dir: String): DataFrame =
    languageId(Tables.load(spark, dir, "documents")).orderBy(col("doc_id"))

  private val xtLangidSql = {
    def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")
    val hitExprs = Lexicons.map { case (l, ws) =>
      s"SUM(CASE WHEN t IN (${inList(ws)}) THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE) AS s_$l"
    }.mkString(",\n    ")
    val bestExpr = Lexicons.map(l => s"s_${l._1}").mkString("GREATEST(", ", ", ")")
    val argmax = Lexicons.map { case (l, _) =>
      s"WHEN s_$l = $bestExpr THEN '$l'"
    }.mkString("\n      ")
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    unnest(string_split(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS t
       |  FROM documents),
       |hits AS (
       |  SELECT doc_id,
       |    $hitExprs
       |  FROM tok GROUP BY doc_id),
       |cjkt AS (
       |  SELECT doc_id,
       |    (length(text) - length(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g')))
       |      / CAST(GREATEST(length(text), 1) AS DOUBLE) AS cjk
       |  FROM documents)
       |SELECT h.doc_id,
       |  CASE WHEN c.cjk > 0.05 THEN 'zh'
       |    WHEN $bestExpr <= 0 THEN 'und'
       |    $argmax
       |    ELSE 'und' END AS lang_pred
       |FROM hits h JOIN cjkt c ON h.doc_id = c.doc_id
       |ORDER BY h.doc_id""".stripMargin
  }

  // --------------------------------------------------- fingerprinting
  /** Content fingerprints: md5 of the normalized text (exact-dup key)
    * and of the leading 8-token prefix (head fingerprint for clustering
    * truncation variants). */
  private def xtFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = tokens($"text")
    Tables.load(spark, dir, "documents")
      .select($"doc_id",
        md5(normText($"text").cast(BinaryType)).as("fp_full"),
        md5(concat_ws(" ", slice(w, 1, 8)).cast(BinaryType)).as("fp_head8"))
      .orderBy($"doc_id")
  }

  private val xtFingerprintSql =
    """SELECT doc_id,
      |  md5(trim(lower(regexp_replace(text, '\s+', ' ', 'g')))) AS fp_full,
      |  md5(array_to_string(string_split(trim(lower(regexp_replace(text, '\s+', ' ', 'g'))), ' ')[1:8], ' ')) AS fp_head8
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------- term freq
  private def x3TokenFreq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val win = Window.partitionBy($"lang").orderBy($"n".desc, $"token")
    Tables.load(spark, dir, "documents")
      .select($"lang", explode(tokens($"text")).as("token"))
      .groupBy($"lang", $"token")
      .agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(win))
      .filter($"rnk" <= 10)
      .select($"lang", $"rnk", $"token", $"n")
      .orderBy($"lang", $"rnk")
  }

  private val x3TokenFreqSql =
    """SELECT lang, rnk, token, n FROM (
      |  SELECT lang, token, COUNT(*) AS n,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, token) AS rnk
      |  FROM (SELECT lang,
      |          unnest(string_split(trim(lower(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS token
      |        FROM documents) t
      |  GROUP BY lang, token) x
      |WHERE rnk <= 10
      |ORDER BY lang, rnk""".stripMargin

  // ----------------------------------------------------- n-gram corpus stats
  /** All word-bigram INSTANCES of the normalized text (duplicates kept —
    * these feed counts, unlike the distinct'd dedup shingles). Primitive
    * loop for the same reason as [[Curation.wordShingleStrings]]: the
    * `transform`+`element_at` column formulation evaluates interpreted
    * HOF lambdas per gram (BENCHNOTES.md #2). */
  private[operators] def bigramInstances(text: String): Array[String] = {
    val toks = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    if (toks.length < 2) Array.empty
    else Array.tabulate(toks.length - 1)(i => toks(i) + " " + toks(i + 1))
  }

  private val bigramUdf = udf(bigramInstances _)

  /** Corpus-level top-k bigrams with collection frequency and document
    * frequency — the vocabulary/phrase-stats pass of corpus analysis.
    * One explode → one keyed aggregation (count + distinct-doc count) →
    * `orderBy.limit` top-k, which Spark plans as the distributed
    * `TakeOrderedAndProject` (per-partition heaps, no global sort) — at
    * 100 TB the aggregation output is vocabulary-sized, never a single
    * partition. */
  def ngramTopK(docs: DataFrame, k: Int = 20): DataFrame =
    docs
      .select(col("doc_id"), explode(bigramUdf(col("text"))).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n").desc, col("gram"))
      .limit(k)

  private def xtNgramTopk(spark: SparkSession, dir: String): DataFrame =
    ngramTopK(Tables.load(spark, dir, "documents"))

  private val xtNgramTopkSql =
    """SELECT g AS gram, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
      |FROM (
      |  SELECT doc_id, unnest([w[i+1] || ' ' || w[i+2] for i in range(len(w)-1)]) AS g
      |  FROM (SELECT doc_id,
      |          string_split(trim(lower(regexp_replace(text, '\s+', ' ', 'g'))), ' ') w
      |        FROM documents))
      |GROUP BY g
      |ORDER BY n DESC, g
      |LIMIT 20""".stripMargin

  // ------------------------------------------------ sketch heavy hitters
  /** φ-heavy hitters (bigrams whose count ≥ total/φ) via a Count-Min
    * Sketch candidate gate with exact verification — the two-pass shape
    * that makes heavy hitters tractable at 100 TB. Pass 1 streams every
    * gram into a CMS (`DataFrameStatFunctions.countMinSketch`: built as
    * per-partition sketches, merged cell-wise on the driver — size is
    * depth×width counters, independent of the data). Pass 2 re-explodes
    * the grams, gates each map-side on the broadcast sketch (CMS only
    * OVERestimates, so every true heavy hitter survives — no false
    * negatives, the mirror of the Bloom gate's guarantee in
    * [[Curation.bloomDecontaminate]]), exactly counts the surviving
    * candidates, and applies the threshold on the exact counts. Output
    * is therefore EXACT; the sketch only pruned the shuffle. The gate's
    * integer comparisons (`est·φ ≥ total`, then `n·φ ≥ total`) avoid any
    * float threshold. On this fixture's near-uniform synthetic text the
    * gate keeps most grams (documented in BENCHNOTES.md); the spec
    * demonstrates the real >99 % prune on a skewed fixture. `eps` must
    * be well under 1/φ or the +eps·total overestimate admits everything.
    */
  def heavyHitters(docs: DataFrame, phi: Long = 2000L,
      eps: Double = 1e-4): DataFrame = {
    val spark = docs.sparkSession
    val grams = docs.select(col("doc_id"), explode(bigramUdf(col("text"))).as("gram"))
    val cms = grams.stat.countMinSketch("gram", eps, 0.999, 42) // pass 1
    val total = cms.totalCount() // exact: CMS counts every insertion
    val bCms = spark.sparkContext.broadcast(cms)
    val candidate = udf((g: String) => bCms.value.estimateCount(g) * phi >= total)
    grams
      .filter(candidate(col("gram"))) // map-side gate, no false negatives
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n")) // exact verify on survivors
      .filter(col("n") * phi >= total)
      .withColumn("ppm", expr(s"(n * 1000000) DIV ${total}L"))
  }

  private def xtHeavyHitters(spark: SparkSession, dir: String): DataFrame =
    heavyHitters(Tables.load(spark, dir, "documents"))
      .orderBy(col("gram"))

  private val xtHeavyHittersSql =
    """WITH b AS (
      |  SELECT unnest([w[i+1] || ' ' || w[i+2] for i in range(len(w)-1)]) AS gram
      |  FROM (SELECT string_split(trim(lower(regexp_replace(text, '\s+', ' ', 'g'))), ' ') w
      |        FROM documents)),
      |t AS (SELECT COUNT(*) AS total FROM b)
      |SELECT gram, COUNT(*) AS n,
      |  (COUNT(*) * 1000000) // (SELECT total FROM t) AS ppm
      |FROM b GROUP BY gram
      |HAVING COUNT(*) * 2000 >= (SELECT total FROM t)
      |ORDER BY gram""".stripMargin

  // ------------------------------------------------------------ tf-idf
  /** Per-doc top-5 distinguishing terms by tf/df ratio. The score is
    * scaled INTEGER division — exact in both engines — rather than the
    * classic tf·log(N/df): libm log() is not guaranteed bit-identical
    * across engines and ranking must not flap on the last ulp. Two
    * keyed aggregations + a broadcast-size df join; at 100 TB the df
    * table is vocabulary-sized (millions, not rows). */
  private def xtTfidf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tok = Tables.load(spark, dir, "documents")
      .select($"doc_id", explode(tokens($"text")).as("token"))
    val tf = tok.groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val df = tok.distinct().groupBy($"token").agg(count(lit(1)).as("df"))
    val win = Window.partitionBy($"doc_id").orderBy($"score".desc, $"token")
    tf.join(df, "token")
      .withColumn("score", expr("(tf * 1000000) DIV df"))
      .withColumn("rnk", row_number().over(win))
      .filter($"rnk" <= 5)
      .select($"doc_id", $"rnk", $"token", $"tf", $"df", $"score")
      .orderBy($"doc_id", $"rnk")
  }

  private val xtTfidfSql =
    """WITH tok AS (
      |  SELECT doc_id,
      |    unnest(string_split(trim(lower(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS token
      |  FROM documents),
      |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
      |df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token)
      |SELECT doc_id, rnk, token, tf, df, score FROM (
      |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
      |    (tf.tf * 1000000) // df.df AS score,
      |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
      |      ORDER BY (tf.tf * 1000000) // df.df DESC, tf.token) AS rnk
      |  FROM tf JOIN df USING (token)) x
      |WHERE rnk <= 5
      |ORDER BY doc_id, rnk""".stripMargin

  // --------------------------------------------------------- chunking
  /** Overlapping token-window chunking — the doc → training-sequence /
    * RAG-passage splitter: windows of `window` tokens every `stride`
    * tokens (the final partial window is kept). One generator per doc
    * (`posexplode` over a `sequence` of window starts), so the pass is
    * map-only and explodes to ~n/stride rows per doc — no shuffle, no
    * per-token work outside the slice/concat of each emitted chunk. */
  def chunk(docs: DataFrame, window: Int = 32, stride: Int = 16): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), size(col("w")).as("n"),
        posexplode(expr(
          s"transform(sequence(0, size(w) - 1, $stride), i -> concat_ws(' ', slice(w, i + 1, $window)))"))
          .as(Seq("chunk_id", "chunk_text")))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * stride).as("off_tokens"),
        least(lit(window), col("n") - col("chunk_id") * stride).as("n_tokens"),
        col("chunk_text"))

  private def xtChunk(spark: SparkSession, dir: String): DataFrame =
    chunk(Tables.load(spark, dir, "documents"))
      .orderBy(col("doc_id"), col("chunk_id"))

  private val xtChunkSql =
    """SELECT doc_id,
      |  CAST(off // 16 AS INTEGER) AS chunk_id,
      |  CAST(off AS INTEGER) AS off_tokens,
      |  CAST(LEAST(32, n - off) AS INTEGER) AS n_tokens,
      |  array_to_string(w[off + 1 : off + 32], ' ') AS chunk_text
      |FROM (
      |  SELECT doc_id, w, len(w) AS n, unnest(range(0, len(w), 16)) AS off
      |  FROM (SELECT doc_id,
      |          string_split(trim(lower(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
      |        FROM documents))
      |ORDER BY doc_id, chunk_id""".stripMargin

  // ---------------------------------------------- RETRO chunk neighbors
  /** Chunk ids pack as `doc_id << 20 | chunk_id` — one long key through
    * the retrieval machinery, unpacked at the output. 2²⁰ chunks/doc =
    * a 16M-token document at stride 16 before collision; a corpus past
    * that moves to a struct key, not a wider shift. */
  private val ChunkKeyBits = 20
  private val ChunkKeyBase = 1L << ChunkKeyBits

  /** RETRO retrieval preprocessing (Borgeaud et al., ICML 2022 §2.3):
    * chunk every document ([[chunk]]), embed each chunk with the
    * hashed vectorizer (the verified text-tier embedding), and fetch
    * each probe chunk's top-k nearest NEIGHBOR chunks from OTHER
    * documents — the neighbor-causality rule: a chunk must never
    * retrieve from its own document, or training sees its own leaked
    * continuation. The exclusion is a pure column predicate on the
    * packed key (`shiftrightunsigned` — the doc part), so it rides
    * INSIDE the broadcast top-k join: no extra scan, no shuffle beyond
    * [[Similarity.cosineTopKExcludingGroup]]'s bounded group-limit
    * exchange. At 100 TB: chunking is map-only (~n/stride rows per
    * doc), vectorization is the memoized per-partition pass, and the
    * brute ranking is the verified baseline the IVF-PQ text tier
    * (xt_hashvec_index) already provides the scale path for. */
  def chunkNeighbors(docs: DataFrame, probeDocs: Int, k: Int): DataFrame = {
    // map-only overflow guard (ADVICE r17, tightened r18 review): a doc
    // with >= 2^20 chunks, a negative doc_id, OR a doc_id large enough
    // that doc_id·2^20 wraps Long (>= 2^63 / 2^20) would silently
    // collide into another doc's key space, corrupting both the
    // same-doc exclusion and the unpacked output — fail loudly like the
    // repo's other build-time requires
    val maxDocId = Long.MaxValue / ChunkKeyBase
    val keyed = chunk(docs).select(
      when(col("chunk_id") >= lit(ChunkKeyBase) || col("doc_id") < 0 ||
          col("doc_id") >= lit(maxDocId),
        raise_error(concat(
          lit("chunkNeighbors: packed key overflow (doc_id="),
          col("doc_id").cast(StringType), lit(", chunk_id="),
          col("chunk_id").cast(StringType),
          lit(s") — need 0 <= doc_id < 2^63/2^$ChunkKeyBits and " +
            s"< 2^$ChunkKeyBits chunks/doc; a bigger corpus moves to a " +
            "struct key"))))
        .otherwise(col("doc_id") * ChunkKeyBase + col("chunk_id"))
        .as("doc_id"),
      col("chunk_text").as("text"))
    val emb = hashVectors(keyed).filter(col("l2") > 0)
      .select(col("doc_id").as("vec_id"),
        expr("transform(vec, x -> CAST(x AS DOUBLE))").as("embedding"))
    val probes = emb.filter(col("vec_id") < lit(probeDocs.toLong * ChunkKeyBase))
    Similarity.cosineTopKExcludingGroup(emb, probes, k,
        id => shiftrightunsigned(id, ChunkKeyBits))
      .select(
        shiftrightunsigned(col("probe_id"), ChunkKeyBits).as("doc_id"),
        col("probe_id").bitwiseAND(lit(ChunkKeyBase - 1)).cast(IntegerType).as("chunk_id"),
        col("rnk"),
        shiftrightunsigned(col("neighbor_id"), ChunkKeyBits).as("n_doc_id"),
        col("neighbor_id").bitwiseAND(lit(ChunkKeyBase - 1)).cast(IntegerType).as("n_chunk_id"),
        col("sim"))
  }

  private def xtChunkNeighbors(spark: SparkSession, dir: String): DataFrame =
    chunkNeighbors(Tables.load(spark, dir, "documents"), 2, 3)
      .orderBy(col("doc_id"), col("chunk_id"), col("rnk"))

  /** Oracle: the chunk corpus fed through the SHARED hashvec CTE
    * (packed keys in SQL arithmetic), ranked with the same-doc
    * exclusion on the key's doc part. */
  private def xtChunkNeighborsSql: String = {
    val chunkCorpus =
      """(SELECT doc_id * 1048576 + (off // 16) AS doc_id,
        |          array_to_string(w[off + 1 : off + 32], ' ') AS text
        |   FROM (SELECT doc_id, w, unnest(range(0, len(w), 16)) AS off
        |         FROM (SELECT doc_id,
        |                 string_split(trim(lower(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
        |               FROM documents)))""".stripMargin
    val sim = """list_dot_product(p.embedding, c.embedding) /
      |      (sqrt(list_dot_product(p.embedding, p.embedding)) *
      |       sqrt(list_dot_product(c.embedding, c.embedding)))""".stripMargin
    s"""WITH ${hashvecCteOver(chunkCorpus)}
       |ranked AS (
       |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
       |    $sim AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
       |      $sim DESC,
       |      c.vec_id) AS rnk
       |  FROM embeddings p JOIN embeddings c
       |    ON p.vec_id < 2097152
       |   AND c.vec_id // 1048576 <> p.vec_id // 1048576)
       |SELECT probe_id // 1048576 AS doc_id,
       |  CAST(probe_id % 1048576 AS INTEGER) AS chunk_id,
       |  rnk,
       |  neighbor_id // 1048576 AS n_doc_id,
       |  CAST(neighbor_id % 1048576 AS INTEGER) AS n_chunk_id,
       |  sim
       |FROM ranked WHERE rnk <= 3
       |ORDER BY doc_id, chunk_id, rnk""".stripMargin
  }

  // -------------------------------------------------------- redaction
  /** Ordered regex scrub rules applied to one column — the PII-redaction
    * pass a training corpus runs before release (emails, ids, phone
    * numbers → placeholder tokens). Each rule is a codegen'd global
    * `regexp_replace`, composed in order; the whole pass is map-only and
    * fuses into whatever scan precedes it, so at 100 TB it costs one
    * read. Patterns use Java regex syntax (keep to the RE2-compatible
    * subset if oracle parity with DuckDB matters); replacements are
    * taken LITERALLY — `Matcher.quoteReplacement` guards the `$`/`\`
    * group-reference metacharacters Java would otherwise interpret. */
  def redact(df: DataFrame, column: String,
      rules: Seq[(String, String)], as: String): DataFrame =
    df.withColumn(as, rules.foldLeft(col(column)) {
      case (c, (pat, rep)) =>
        regexp_replace(c, pat, java.util.regex.Matcher.quoteReplacement(rep))
    })

  /** Declared redaction demo over `customer`: emails (none in the
    * fixture — the rule still composes) then digit runs → placeholders.
    * `n_masked` counts digit runs the <ID> rule ACTUALLY replaced, i.e.
    * runs surviving the email pass — counting the raw column would
    * misreport whenever an earlier rule consumes digits. */
  private def xtRedact(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val emailRule = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+" -> "<EMAIL>"
    redact(cust, "c_name", Seq(emailRule), "_deemailed")
      .withColumn("redacted", regexp_replace(col("_deemailed"), "[0-9]+", "<ID>"))
      .select(col("c_custkey"), col("c_name"), col("redacted"),
        size(expr("regexp_extract_all(_deemailed, '[0-9]+', 0)")).as("n_masked"))
      .orderBy(col("c_custkey"))
  }

  private val xtRedactSql =
    """WITH d AS (
      |  SELECT c_custkey, c_name,
      |    regexp_replace(c_name, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g') AS de
      |  FROM customer)
      |SELECT c_custkey, c_name,
      |  regexp_replace(de, '[0-9]+', '<ID>', 'g') AS redacted,
      |  CAST(len(regexp_extract_all(de, '[0-9]+')) AS INTEGER) AS n_masked
      |FROM d
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------- approx distinct
  /** X4 — HLL++ sketch vs exact distinct; the declared output asserts the
    * ≤5 % error bound holds (the sketch value itself is
    * engine-specific so only the bound is cross-checked). */
  private def x4Approx(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .agg(
        countDistinct($"user_id").as("exact_cnt"),
        approx_count_distinct($"user_id", 0.02).as("approx"))
      .select($"exact_cnt",
        (abs($"approx" - $"exact_cnt") / $"exact_cnt" <= 0.05).as("within_bound"))
  }

  private val x4ApproxSql =
    """SELECT COUNT(DISTINCT user_id) AS exact_cnt, TRUE AS within_bound
      |FROM events""".stripMargin

  // ------------------------------------------------- HLL sketch union
  /** X4c — MERGEABLE distinct counting via Spark 4's native
    * DataSketches HLL (`hll_sketch_agg` / `hll_union_agg` /
    * `hll_sketch_estimate`, Apache DataSketches under the hood):
    * per-language token sketches are built independently and then
    * UNIONED WITHOUT RESCANNING the corpus. Mergeability is the whole
    * reason sketches matter at 100 TB — per-shard/per-day sketches
    * union in milliseconds where an exact global distinct re-shuffles
    * everything — and it is exactly what `approx_count_distinct`'s
    * opaque HLL++ buffer does not expose as a value. Family contract
    * (never trust the sketch): the union estimate is checked against
    * the exact global distinct (≤ 5 % at lgK = 12) and against the
    * subadditivity bound — union ≤ sum of per-language exacts WITH the
    * sketch's 5 % error headroom, because an HLL ESTIMATE may
    * overestimate: with the exact bound a fixture drifting toward a
    * single language (sum ≈ exact union) would let a legitimate small
    * overestimate flip the flag against the oracle's hard-coded TRUE
    * (ADVICE r10). Both engine-computed; the oracle states the exact
    * values and TRUE. */
  private def x4HllUnion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tok = Tables.load(spark, dir, "documents")
      .select($"lang", explode(tokens($"text")).as("t"))
    val perLang = tok.groupBy($"lang")
      .agg(expr("hll_sketch_agg(t, 12)").as("sk"),
        countDistinct($"t").as("exact_lang"))
    val unioned = perLang.agg(
      expr("hll_sketch_estimate(hll_union_agg(sk, true))").as("est_union"),
      sum($"exact_lang").as("sum_lang_exact"),
      count(lit(1)).as("n_langs"))
    val exact = tok.agg(countDistinct($"t").as("exact_union"))
    unioned.crossJoin(exact)
      .select($"n_langs", $"exact_union",
        (abs($"est_union" - $"exact_union") / $"exact_union" <= 0.05)
          .as("union_within_bound"),
        ($"est_union" <= $"sum_lang_exact" * 1.05).as("union_le_sum"))
  }

  private val x4HllUnionSql =
    """WITH tok AS (
      |  SELECT lang,
      |    unnest(string_split(trim(lower(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS t
      |  FROM documents)
      |SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      |  CAST(COUNT(DISTINCT t) AS BIGINT) AS exact_union,
      |  TRUE AS union_within_bound,
      |  TRUE AS union_le_sum
      |FROM tok""".stripMargin

  // ------------------------------------------------- KMV set operations
  /** X4d — cross-shard set-overlap estimation via KMV (k-minimum-values)
    * sketches ([[graft.functions.KmvAgg]]): per-language 5-word-shingle
    * sketches support not just distinct counting (HLL's territory) but
    * set OPERATIONS — K(A∪B) = k smallest of two merged sketches, and
    * Jaccard(A,B) ≈ |K(A∪B) ∩ K(A) ∩ K(B)| / |K(A∪B)| (Beyer et al.
    * SIGMOD 2007), and asymmetric containment C(A ⊆ B) =
    * |A∩B|/|A| follows from the same retained sample. That is the contamination/overlap question a corpus
    * pipeline asks ACROSS shards ("how much does shard A's content
    * overlap shard B's?") answered from k·nShards retained hashes,
    * where the exact answer re-shuffles every shingle.
    *
    * Scale posture: shingle + hash is map-only, and the PRODUCTION
    * sketch pass needs NO pre-distinct — [[graft.functions.KmvAgg]]
    * dedups inside the buffer, so the aggregate runs under
    * ObjectHashAggregate with map-side partials and the exchange
    * carries ≤ partitions × nLangs × k longs off the raw shingle
    * stream. THIS declared row also computes the exact verification
    * side, which requires the distinct (lang, shingle) set anyway — so
    * the sketch rides that same distinct (its internal dedup a no-op)
    * and the exact count falls out of the same aggregation; pairwise
    * exact intersections come from per-shingle lang sets (one keyed
    * aggregation, ≤ C(nLangs,2) emitted pairs per shingle — no corpus
    * self-join). The pair stage is nLangs² sketch rows.
    * Hash = first 48 bits of md5 (bit-identical across engines),
    * so the DuckDB oracle replays the sketch EXACTLY — estimates
    * hash-match as values, and the bound flags (distinct within 10 % ≈
    * 3.2σ at k=1024; Jaccard within ±0.02 ≈ 5σ) are computed, not
    * hard-coded. Estimator: m if m < k (a short buffer IS the exact
    * hash set), else (k−1)·2⁴⁸ / h₍ₖ₎. */
  private def x4KmvJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 1024
    // (k-1)·2^48 < 2^58: exactly representable as a double, so the
    // estimate division is bit-identical in any IEEE engine
    val scaleNum = (k - 1).toDouble * 281474976710656.0
    // shingle via the primitive kernel, not the Column expression: the
    // higher-order-function tree is ~15× slower (Dedup.wordShingleStrings)
    val sh = Tables.load(spark, dir, "documents")
      .select($"lang", $"text").as[(String, String)]
      .flatMap { case (lang, t) =>
        Dedup.wordShingleStrings(t).iterator.map(s => (lang, s)) }
      .toDF("lang", "s")
    // ONE corpus pass feeds everything: group the raw shingle stream by
    // shingle into its lang set (collect_set dedups, and the map-side
    // partial caps at nLangs entries per shingle per task — the combine
    // is as good as a pre-distinct without a dedicated shuffle), then
    // MATERIALIZE the per-shingle sets (the xt_word_freq_score partials
    // pattern): three consumers (sketch, exact counts, pairwise
    // intersections) would otherwise each re-run the expensive
    // shingle-generation scan — measured 7.2 → ~2 s at sf0.1. At 100 TB
    // this materialization is the persisted distinct-shingle table a
    // curation pipeline keeps anyway.
    val g = sh.groupBy($"s").agg(collect_set($"lang").as("ls")).localCheckpoint()
    val kmv = udaf(new graft.functions.KmvAgg(k))
    val perLang = g
      .withColumn("h", conv(substring(md5($"s".cast(BinaryType)), 1, 12), 16, 10)
        .cast(LongType))
      .select($"h", explode($"ls").as("lang"))
      .groupBy($"lang").agg(kmv($"h").as("sk"), count(lit(1)).as("exact_d"))
    // exact pairwise intersections WITHOUT a corpus self-join: each
    // shingle's lang set emits its ≤ C(nLangs, 2) ordered pairs
    val inter = g
      .select(explode($"ls").as("lang_a"), $"ls")
      .select($"lang_a", explode($"ls").as("lang_b"))
      .filter($"lang_a" < $"lang_b")
      .groupBy($"lang_a", $"lang_b").agg(count(lit(1)).as("exact_inter"))
    def est(sk: Column): Column =
      when(size(sk) < k, size(sk).cast(DoubleType))
        .otherwise(lit(scaleNum) / element_at(sk, k).cast(DoubleType))
    val skA = perLang.select($"lang".as("lang_a"), $"sk".as("ska"),
      $"exact_d".as("exact_a"))
    val skB = perLang.select($"lang".as("lang_b"), $"sk".as("skb"),
      $"exact_d".as("exact_b"))
    skA.join(skB, $"lang_a" < $"lang_b")
      .join(inter, Seq("lang_a", "lang_b"), "left")
      .na.fill(0L, Seq("exact_inter"))
      .withColumn("ku", slice(array_sort(array_union($"ska", $"skb")), 1, k))
      .select($"lang_a", $"lang_b", $"exact_a", $"exact_b", $"exact_inter",
        est($"ska").as("est_a"), est($"skb").as("est_b"),
        est($"ku").as("est_union"),
        (size(array_intersect(array_intersect($"ku", $"ska"), $"skb"))
          .cast(DoubleType) / size($"ku")).as("est_jaccard"),
        ($"exact_inter".cast(DoubleType) /
          ($"exact_a" + $"exact_b" - $"exact_inter")).as("exact_jaccard"))
      .withColumn("d_within_bound",
        abs($"est_a" - $"exact_a") / $"exact_a" <= 0.1 &&
          abs($"est_b" - $"exact_b") / $"exact_b" <= 0.1)
      .withColumn("j_within_bound",
        abs($"est_jaccard" - $"exact_jaccard") <= 0.02)
      // containment C(A ⊆ B) = |A∩B| / |A| — the asymmetric "is shard A
      // mostly inside shard B" question dedup planning asks; estimated
      // intersection = jaccard_est × union_est, divided by each side's
      // own distinct estimate
      .withColumn("est_containment_a",
        $"est_jaccard" * $"est_union" / $"est_a")
      .withColumn("est_containment_b",
        $"est_jaccard" * $"est_union" / $"est_b")
      .orderBy($"lang_a", $"lang_b")
  }

  /** Replays the sketch exactly: same 48-bit md5 hash, same k smallest
    * distinct values per language (rank window), same estimator
    * arithmetic — the estimates are VALUES both engines must agree on,
    * not bound-gated approximations. */
  private val x4KmvJaccardSql = {
    val k = 1024
    val scaleNum = (k - 1).toLong * 281474976710656L
    val hexval = (0 until 12).map { i =>
      s"(strpos('0123456789abcdef', substr(md5(s), ${i + 1}, 1)) - 1) * ${math.pow(16, 11 - i).toLong}"
    }.mkString(" + ")
    s"""WITH sh0 AS (
       |  SELECT lang, CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
       |    ELSE list_distinct([array_to_string(w[i+1:i+5], ' ') for i in range(len(w)-4)]) END sh
       |  FROM (SELECT lang,
       |          string_split(trim(lower(regexp_replace(text,'\\s+',' ','g'))), ' ') w
       |        FROM documents)),
       |e AS (SELECT lang, unnest(sh) AS s FROM sh0),
       |d AS (SELECT DISTINCT lang, s FROM e),
       |hd AS (SELECT DISTINCT lang, CAST($hexval AS BIGINT) AS h FROM d),
       |rk AS (SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM hd),
       |sk AS (SELECT lang, list(h ORDER BY h) AS sk, CAST(COUNT(*) AS BIGINT) AS m
       |       FROM rk WHERE rn <= $k GROUP BY lang),
       |ex AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS exact_d FROM d GROUP BY lang),
       |inter AS (SELECT a.lang AS lang_a, b.lang AS lang_b, CAST(COUNT(*) AS BIGINT) AS exact_inter
       |          FROM d a JOIN d b ON a.s = b.s AND a.lang < b.lang GROUP BY 1, 2),
       |pairs AS (
       |  SELECT a.lang AS lang_a, b.lang AS lang_b, a.sk AS ska, b.sk AS skb,
       |    a.m AS ma, b.m AS mb, ea.exact_d AS exact_a, eb.exact_d AS exact_b,
       |    COALESCE(i.exact_inter, 0) AS exact_inter
       |  FROM sk a JOIN sk b ON a.lang < b.lang
       |  JOIN ex ea ON ea.lang = a.lang JOIN ex eb ON eb.lang = b.lang
       |  LEFT JOIN inter i ON i.lang_a = a.lang AND i.lang_b = b.lang),
       |u AS (
       |  SELECT *, list_sort(list_distinct(list_concat(ska, skb)))[1:$k] AS ku
       |  FROM pairs),
       |est AS (
       |  SELECT lang_a, lang_b, exact_a, exact_b, exact_inter,
       |    CASE WHEN ma < $k THEN CAST(ma AS DOUBLE)
       |         ELSE $scaleNum.0 / ska[$k] END AS est_a,
       |    CASE WHEN mb < $k THEN CAST(mb AS DOUBLE)
       |         ELSE $scaleNum.0 / skb[$k] END AS est_b,
       |    CASE WHEN len(ku) < $k THEN CAST(len(ku) AS DOUBLE)
       |         ELSE $scaleNum.0 / ku[$k] END AS est_union,
       |    CAST(len(list_intersect(list_intersect(ku, ska), skb)) AS DOUBLE) / len(ku) AS est_jaccard,
       |    CAST(exact_inter AS DOUBLE) / (exact_a + exact_b - exact_inter) AS exact_jaccard
       |  FROM u)
       |SELECT lang_a, lang_b, exact_a, exact_b, exact_inter, est_a, est_b, est_union,
       |  est_jaccard, exact_jaccard,
       |  (abs(est_a - exact_a) / exact_a <= 0.1 AND abs(est_b - exact_b) / exact_b <= 0.1)
       |    AS d_within_bound,
       |  (abs(est_jaccard - exact_jaccard) <= 0.02) AS j_within_bound,
       |  est_jaccard * est_union / est_a AS est_containment_a,
       |  est_jaccard * est_union / est_b AS est_containment_b
       |FROM est ORDER BY lang_a, lang_b""".stripMargin
  }

  // ------------------------------------------------- hashing vectorizer
  /** Model-free text vectorization via the hashing trick (Weinberger et
    * al., ICML 2009 — scikit's HashingVectorizer): token → dimension
    * md5(token) mod 64 with a ± sign bit from the next nibble, signed
    * counts summed per doc. No vocabulary table, no model download, no
    * training pass — the embedding a 100 TB pipeline can compute in the
    * SAME map-only pass that tokenizes, which makes it the standard
    * first-cut vector for clustering/dedup/retrieval before a learned
    * encoder enters the picture (sign-hashing keeps collisions
    * zero-mean). Deterministic and engine-portable: the DuckDB oracle
    * replays the exact md5 arithmetic, so the vectors hash-match as
    * VALUES. Per-doc kernel with a per-partition token memo — one scan,
    * no shuffle, output 64 longs + the L2 norm per doc. */
  private[graft] def hashVec64(tokens: Array[String]): Array[Long] = {
    val v = new Array[Long](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < tokens.length) {
      val d = md.digest(tokens(i).getBytes("UTF-8"))
      val idx = (d(0) & 0xFF) % 64
      v(idx) += (if (((d(1) >> 4) & 0xF) >= 8) -1L else 1L)
      i += 1
    }
    v
  }

  private[graft] def normTokens(text: String): Array[String] =
    text.replaceAll("\\s+", " ").toLowerCase(java.util.Locale.ROOT).trim.split(" ")

  /** (doc_id, vec[64], l2) for every document. Runs as mapPartitions
    * with a per-partition token → (dim, sign) memo: md5 is the
    * per-token cost and real corpora repeat tokens heavily (Zipf), so
    * the memo turns ~tokens-per-partition digests into
    * ~distinct-tokens-per-partition (measured 4.4 → ~2 s for the
    * index row at sf0.1). Same arithmetic as [[hashVec64]] — the memo
    * only caches, never changes a value. */
  def hashVectors(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val memo = new java.util.HashMap[String, Int]() // (idx << 1) | neg
        it.map { case (id, t) =>
          val toks = normTokens(t)
          val v = new Array[Long](64)
          var i = 0
          while (i < toks.length) {
            val tok = toks(i)
            var e = memo.getOrDefault(tok, -1)
            if (e < 0) {
              val d = md.digest(tok.getBytes("UTF-8"))
              val idx = (d(0) & 0xFF) % 64
              val neg = if (((d(1) >> 4) & 0xF) >= 8) 1 else 0
              e = (idx << 1) | neg
              memo.put(tok, e)
            }
            v(e >> 1) += (if ((e & 1) == 1) -1L else 1L)
            i += 1
          }
          (id, v, math.sqrt(v.map(x => x.toDouble * x).sum))
        }
      }
      .toDF("doc_id", "vec", "l2")
  }

  // vec serialized as CSV: the driver's comparator sorts rows by every
  // column, which array cells break — a canonical string carries the
  // same 64 values hash-exactly
  private def xtHashVectorize(spark: SparkSession, dir: String): DataFrame =
    hashVectors(Tables.load(spark, dir, "documents"))
      .select(col("doc_id"),
        concat_ws(",", col("vec").cast("array<string>")).as("vec_csv"),
        col("l2"))
      .orderBy(col("doc_id"))

  private val xtHashVectorizeSql = {
    val v = 64
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(trim(lower(regexp_replace(text,'\\s+',' ','g'))), ' ')) AS t
       |  FROM documents),
       |h AS (
       |  SELECT doc_id,
       |    ((strpos('0123456789abcdef', substr(md5(t),1,1))-1)*16 +
       |     (strpos('0123456789abcdef', substr(md5(t),2,1))-1)) % $v AS idx,
       |    CASE WHEN strpos('0123456789abcdef', substr(md5(t),3,1))-1 >= 8 THEN -1 ELSE 1 END AS sgn
       |  FROM tok),
       |s AS (SELECT doc_id, idx, CAST(SUM(sgn) AS BIGINT) AS v FROM h GROUP BY doc_id, idx),
       |grid AS (SELECT DISTINCT doc_id FROM documents),
       |dense AS (
       |  SELECT g.doc_id, r.range AS idx, COALESCE(s.v, 0) AS v
       |  FROM grid g CROSS JOIN range($v) r
       |  LEFT JOIN s ON s.doc_id = g.doc_id AND s.idx = r.range)
       |SELECT doc_id, array_to_string(list(v ORDER BY idx), ',') AS vec_csv,
       |  sqrt(CAST(SUM(v*v) AS DOUBLE)) AS l2
       |FROM dense GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Text-only cosine retrieval over the hashed vectors — the
    * chunk→vectorize→search pipeline with no model anywhere: probes are
    * the first 5 docs, top-3 neighbors by cosine (self excluded, ties
    * to the lowest neighbor id). Composes [[hashVectors]] into
    * [[Similarity.cosineTopK]] (broadcast probes, corpus never
    * shuffles); the DuckDB oracle replays vectorization AND ranking, so
    * every (probe, neighbor, rank, sim) tuple is value-checked. Signed
    * counts are small integers, exact in float — both engines compute
    * identical doubles. */
  private def xtHashvecKnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hv = hashVectors(Tables.load(spark, dir, "documents"))
      .filter($"l2" > 0) // a cancelled-out vector has no direction
      .select($"doc_id".as("vec_id"),
        expr("transform(vec, x -> CAST(x AS FLOAT))").as("embedding"))
    Similarity.cosineTopK(hv, hv.filter($"vec_id" < 5), 3)
      .orderBy($"probe_id", $"rnk")
  }

  private val xtHashvecKnnSql = {
    val v = 64
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(trim(lower(regexp_replace(text,'\\s+',' ','g'))), ' ')) AS t
       |  FROM documents),
       |h AS (
       |  SELECT doc_id,
       |    ((strpos('0123456789abcdef', substr(md5(t),1,1))-1)*16 +
       |     (strpos('0123456789abcdef', substr(md5(t),2,1))-1)) % $v AS idx,
       |    CASE WHEN strpos('0123456789abcdef', substr(md5(t),3,1))-1 >= 8 THEN -1 ELSE 1 END AS sgn
       |  FROM tok),
       |s AS (SELECT doc_id, idx, CAST(SUM(sgn) AS BIGINT) AS v FROM h GROUP BY doc_id, idx),
       |grid AS (SELECT DISTINCT doc_id FROM documents),
       |dense AS (
       |  SELECT g.doc_id, r.range AS idx, COALESCE(s.v, 0) AS v
       |  FROM grid g CROSS JOIN range($v) r
       |  LEFT JOIN s ON s.doc_id = g.doc_id AND s.idx = r.range),
       |hv AS (
       |  SELECT doc_id, list(CAST(v AS DOUBLE) ORDER BY idx) AS vec,
       |    sqrt(CAST(SUM(v*v) AS DOUBLE)) AS l2
       |  FROM dense GROUP BY doc_id
       |  HAVING SUM(v*v) > 0),
       |scored AS (
       |  SELECT p.doc_id AS probe_id, c.doc_id AS neighbor_id,
       |    list_dot_product(p.vec, c.vec) / (p.l2 * c.l2) AS sim
       |  FROM hv p JOIN hv c ON p.doc_id < 5 AND c.doc_id <> p.doc_id)
       |SELECT probe_id, CAST(rnk AS INTEGER) AS rnk, neighbor_id, sim FROM (
       |  SELECT probe_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rnk
       |  FROM scored) r
       |WHERE rnk <= 3
       |ORDER BY probe_id, rnk""".stripMargin
  }

  /** Text-only ANN end to end: documents → hashing-trick vectors →
    * IVF-PQ retrieval — the chunk/vectorize/index/search pipeline with
    * no learned model anywhere, the zero-dependency first tier of a
    * retrieval stack. The 64-dim hashed vectors feed
    * [[Similarity.ivfPqSearch]] unchanged (dim 64 = the m=4 × sub=16
    * PQ geometry the X2 rows use), zero-norm vectors (sign-cancelled
    * token sets) are excluded on both engines, and the oracle REPLAYS
    * the whole composition — vectorization CTEs shadow the
    * `embeddings` view in front of the exact IVFADC replay — so every
    * (probe, neighbor, rank, adist) tuple is value-checked through
    * the full text→vector→index→search path.
    *
    * This row is the COMPOSED dataflow — it re-trains codebooks and
    * re-encodes the corpus on every call, which is the right shape for
    * an oracle row and the wrong one for serving (at 100 TB a per-query
    * corpus encode is a scale-killer even though it's map-only).
    * [[xtHashvecPersisted]] is the production posture: the same
    * pipeline through [[IndexStore]]'s build-once/query-many split,
    * hash-matching this row's oracle.
    *
    * Float-exactness bound (cross-engine parity): the hashed counts are
    * cast to FLOAT here (the [[Similarity]] kernels take `Seq[Float]`
    * and immediately widen to double) while the oracle computes in
    * DOUBLE — parity therefore relies on every per-dim signed count
    * staying below 2^24, where float represents integers exactly. A
    * dim would need >16M same-sign colliding tokens in ONE document to
    * break that; document lengths are bounded far below it at any
    * realistic scale, but the bound is the contract, not an accident
    * (ADVICE r11). Applies equally to [[xtHashvecKnn]] and
    * [[xtHashvecPersisted]]. */
  private def xtHashvecIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hv = hashVecEmb(spark, dir)
    Similarity.ivfPqSearch(hv, hv.filter($"vec_id" < 10), 16, 4, 4, 16, 1, 5)
      .orderBy($"probe_id", $"rnk")
  }

  /** Hashed text vectors as floats keyed by `vec_id` — the corpus and
    * probe shape the ANN rows share (see [[xtHashvecIndex]] for the
    * 2^24 float-exactness bound the cast carries). */
  private[graft] def hashVecEmb(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    hashVectors(Tables.load(spark, dir, "documents"))
      .filter($"l2" > 0)
      .select($"doc_id".as("vec_id"),
        expr("transform(vec, x -> CAST(x AS FLOAT))").as("embedding"))
  }

  /** Build-once/query-many for the text tier — the x2_ivfpq_persisted
    * discipline applied to the hashed vectors: the one-time 100 TB work
    * (vectorize → train → encode) lands in a fingerprint-keyed
    * [[IndexStore]] dir on first use ([[IndexStore.ensureIndexFor]]),
    * and every later call serves the 10 probes from the stored codes
    * with NO training and NO corpus encode — bounded
    * centroid/codebook/meta reloads plus the m-ints-per-row codes scan.
    * Probes still hash on the fly (queries are query-sized). Same
    * oracle as [[xtHashvecIndex]]: the round-trip through disk must be
    * invisible. */
  private def xtHashvecPersisted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ixDir = IndexStore.ensureIndexFor(spark, s"$dir/documents.parquet",
      "hashvec-d64-n16m4k16", d => IndexStore.buildIvfPq(hashVecEmb(spark, dir), d, 16, 4, 16, 1))
    IndexStore.searchIvfPq(spark, ixDir,
        hashVecEmb(spark, dir).filter($"vec_id" < 10), 4, 5)
      .orderBy($"probe_id", $"rnk")
  }

  /** The hashed-text-vector corpus as a DuckDB CTE (trailing comma
    * included) — shared by every text-tier ANN oracle, including the
    * curation-tombstone row ([[graft.streaming.CurateStream]]).
    * MATERIALIZED: the residual-IVFADC chain references `embeddings`
    * many times and DuckDB inlines plain CTEs per reference — the
    * md5-per-token vectorization re-ran dozens of times (hour-plus,
    * 60 GB spill) before the hint; with it the row oracles in <1 s. */
  private[graft] val hashvecCte: String = hashvecCteOver("documents")

  /** [[hashvecCte]] with the source corpus swappable — the
    * curate-and-index pipeline hashes only the ACCEPTED docs, so its
    * oracle vectorizes `(SELECT ... FROM documents WHERE accepted)`
    * instead of the whole table ([[graft.streaming.CurateStream]]). */
  private[graft] def hashvecCteOver(corpus: String): String = {
    val v = 64
    val hvCte =
      s"""embeddings AS MATERIALIZED (
         |  WITH tok AS (
         |    SELECT doc_id, unnest(string_split(trim(lower(regexp_replace(text,'\\s+',' ','g'))), ' ')) AS t
         |    FROM $corpus),
         |  h AS (
         |    SELECT doc_id,
         |      ((strpos('0123456789abcdef', substr(md5(t),1,1))-1)*16 +
         |       (strpos('0123456789abcdef', substr(md5(t),2,1))-1)) % $v AS idx,
         |      CASE WHEN strpos('0123456789abcdef', substr(md5(t),3,1))-1 >= 8 THEN -1 ELSE 1 END AS sgn
         |    FROM tok),
         |  sums AS (SELECT doc_id, idx, CAST(SUM(sgn) AS BIGINT) AS v FROM h GROUP BY doc_id, idx),
         |  grid AS (SELECT DISTINCT doc_id FROM $corpus),
         |  dense AS (
         |    SELECT g.doc_id, r.range AS idx, COALESCE(s.v, 0) AS v
         |    FROM grid g CROSS JOIN range($v) r
         |    LEFT JOIN sums s ON s.doc_id = g.doc_id AND s.idx = r.range)
         |  SELECT doc_id AS vec_id, list(CAST(v AS DOUBLE) ORDER BY idx) AS embedding
         |  FROM dense GROUP BY doc_id
         |  HAVING SUM(v*v) > 0),
         |""".stripMargin
    hvCte
  }

  private val xtHashvecIndexSql =
    graft.operators.Similarity.ivfPqSearchSqlWith(prefix = hashvecCte)

  // ---------------------------------------------------- approx quantile
  /** X4b — sketch quantiles with their real guarantee checked: Spark's
    * `approx_percentile` (Greenwald-Khanna style) bounds RANK error, not
    * value error, so the declared check is rank-based and BRACKETED —
    * count(value < aφ)/n ≤ φ+margin AND count(value ≤ aφ)/n ≥ φ−margin
    * (accuracy 10000 ⇒ ε = 1e-4, margin 0.02 is 200× the bound). The
    * bracket — not a single ≤-fraction window — is what ties hold under:
    * a heavily duplicated median makes count(≤ median)/n legitimately
    * exceed φ+margin even for the EXACT quantile, while the strict-<
    * side stays below it. Completes the verified-sketch family: HLL
    * distinct (x4), CMS heavy hitters (xt_heavy_hitters), GK quantiles
    * here — each exact-or-bound-checked, never trust-the-sketch. Two
    * aggregations + a one-row broadcast scalar attach; the data never
    * shuffles. */
  private def x4Quantile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.load(spark, dir, "events")
    val sketch = ev.agg(
      expr("approx_percentile(value, 0.5, 10000)").as("a50"),
      expr("approx_percentile(value, 0.9, 10000)").as("a90"))
    ev.crossJoin(broadcast(sketch)) // 1-row scalar attach
      .agg(
        count(lit(1)).as("n"),
        avg(when($"value" < $"a50", 1.0).otherwise(0.0)).as("lt50"),
        avg(when($"value" <= $"a50", 1.0).otherwise(0.0)).as("le50"),
        avg(when($"value" < $"a90", 1.0).otherwise(0.0)).as("lt90"),
        avg(when($"value" <= $"a90", 1.0).otherwise(0.0)).as("le90"))
      .select($"n",
        ($"lt50" <= 0.5 + 0.02 && $"le50" >= 0.5 - 0.02).as("q50_within_bound"),
        ($"lt90" <= 0.9 + 0.02 && $"le90" >= 0.9 - 0.02).as("q90_within_bound"))
  }

  private val x4QuantileSql =
    """SELECT COUNT(*) AS n, TRUE AS q50_within_bound, TRUE AS q90_within_bound
      |FROM events""".stripMargin

  // -------------------------------------------------------------- BM25
  /** BM25 top-k retrieval (Robertson–Spärck Jones, k1 = 1.2, b = 0.75)
    * for a fixed query over `documents` — the relevance-scoring shape a
    * curation pipeline uses to mine task-relevant training data.
    *
    * Scale posture: per-term tf and document length are MAP-ONLY column
    * expressions over the token array (no explode, no per-term shuffle);
    * the corpus statistics the formula needs (N, avgdl, per-term df) are
    * ONE aggregation pass producing a single row, broadcast back via a
    * 1-row cross join (the q22/q37 scalar-attach pattern); the final
    * top-k plans as TakeOrderedAndProject. Total cost: two corpus scans
    * and a k-row result — no shuffle grows with the corpus.
    *
    * Bit-exactness: idf uses the RATIONAL form (N - df + 0.5)/(df + 0.5)
    * — the classic RSJ idf without the log (log's last-ulp varies by
    * libm, which is the one operation this repo's cross-engine contract
    * bans; the rational form is +,*,/ only). avgdl routes through the
    * decimal-exact [[Num.dsum]]. Every division is written in the same
    * order in both engines, so scores hash bit-for-bit.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val w = tokens(col("text"))
    def tf(t: String): Column = size(filter(w, x => x === lit(t)))
    val perDoc = docs.select(
      col("doc_id") +: size(w).as("dl") +:
        terms.map(t => tf(t).as(s"tf_$t")): _*)
    val stats = perDoc.agg(
      count(lit(1)).as("n"),
      (Num.dsum(col("dl")) / count(lit(1))).as("avgdl") +:
        terms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t")): _*)
    val scored = perDoc.crossJoin(broadcast(stats))
    val score = terms.map { t =>
      val idf = (col("n") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5))
      idf * ((col(s"tf_$t") * lit(2.2)) /
        (col(s"tf_$t") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl")))))
    }.reduce(_ + _)
    scored
      .select(col("doc_id") +: col("dl") +:
        terms.map(t => col(s"tf_$t")) :+ score.as("bm25"): _*)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  // -------------------------------------------- corpus-frequency score
  /** Corpus word-frequency fluency proxy: a document's mean corpus
    * relative frequency over its tokens — the model-free stand-in for
    * the perplexity filters (CCNet-style) pre-training pipelines run
    * where a language model is available. Common-word documents score
    * high, rare-garbage documents score low.
    *
    * Scale posture — this operator's statistic is CORPUS-DERIVED, a
    * different shape from the map-only scorers: per-(doc, term) counts
    * first (one combiner-friendly shuffle on a key that dedups repeats
    * map-side), the vocabulary table derived from those partials, the
    * weight-back join shuffled on the term key (a broadcast would
    * assume a bounded vocabulary — false at 100 TB), and the grand
    * total attached as a 1-row broadcast. Everything is integer-exact
    * until one final fixed-order double division, so Spark and DuckDB
    * hash-match bit-for-bit.
    *
    * The per-(doc, term) frame is consumed by THREE branches (join
    * left, vocabulary, grand total). Lazily declared, Spark
    * re-evaluates the chain per branch — three corpus scans.
    * `materialize = true` localCheckpoints the partials so the corpus
    * is read ONCE, which is the production posture (a real pipeline
    * writes the partials as a table); measured at sf0.1 the lazy form
    * wins (1.0-1.5 s vs 2.2 s — re-scanning 5000 docs is cheaper than
    * eager materialization), which is why the declared query keeps
    * `materialize = false` and the crossover is documented rather than
    * hard-coded.
    */
  def wordFreqScore(docs: DataFrame, materialize: Boolean = false): DataFrame = {
    val partials = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("n"))
    val perDocTerm = if (materialize) partials.localCheckpoint() else partials
    val vocab = perDocTerm.groupBy(col("t")).agg(sum(col("n")).as("tf"))
    val total = vocab.agg(sum(col("tf")).as("total"))
    perDocTerm.join(vocab, Seq("t"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).cast(IntegerType).as("n_tokens"),
        sum(col("n") * col("tf")).as("sum_tf"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_tokens"), col("sum_tf"),
        (col("sum_tf").cast(DoubleType) / col("n_tokens") / col("total"))
          .as("freq_score"))
  }

  private def xtWordFreq(spark: SparkSession, dir: String): DataFrame =
    wordFreqScore(Tables.load(spark, dir, "documents")).orderBy(col("doc_id"))

  private val xtWordFreqSql =
    """WITH tok AS (
      |  SELECT doc_id,
      |    unnest(string_split(trim(lower(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS t
      |  FROM documents),
      |pdt AS (
      |  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS n
      |  FROM tok GROUP BY doc_id, t),
      |ct AS (SELECT t, CAST(sum(n) AS BIGINT) AS tf FROM pdt GROUP BY t),
      |tot AS (SELECT CAST(sum(tf) AS BIGINT) AS total FROM ct),
      |per AS (
      |  SELECT doc_id,
      |    CAST(sum(n) AS INTEGER) AS n_tokens,
      |    CAST(sum(n * tf) AS BIGINT) AS sum_tf
      |  FROM pdt JOIN ct USING (t) GROUP BY doc_id)
      |SELECT doc_id, n_tokens, sum_tf,
      |  CAST(sum_tf AS DOUBLE) / n_tokens / total AS freq_score
      |FROM per CROSS JOIN tot
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------- bigram LM
  /** CCNet-style perplexity filtering (Wenzek et al. 2020 train a
    * held-out KenLM and drop high-perplexity docs; LLaMA's data recipe
    * keeps the stage): a bigram LM with Laplace smoothing is the
    * fixture-honest version — trained on the TRAIN split only (the
    * [[Curation.hashSplit]] buckets, so val/test docs exercise the
    * unseen-mass smoothing path) and scoring EVERY doc by mean
    * negative log P(w₂|w₁) (cross-entropy; perplexity = e^H, monotone
    * so the score itself is the filter key).
    *
    * 100 TB shape: the model is two VOCABULARY-bounded count tables
    * (bigram counts keyed (w₁,w₂), context counts keyed w₁) built by
    * ordinary keyed aggregation and consumed by equi-joins Catalyst
    * sizes — broadcast while they fit (the fixture plan, see
    * PLANPINS), shuffle-hash beyond the threshold; never a driver-side
    * model (only the 1-row vocab size is a forced broadcast scalar).
    * Scoring is one pass over the corpus bigrams. The per-doc bigram extraction is a doc-partitioned
    * `lead` window — one shuffle on doc_id, the natural plan when
    * documents are small relative to partitions. `materialize`
    * localCheckpoints the tokenized bigrams, which four consumers
    * (two count tables, the vocab scalar, the scoring join) otherwise
    * recompute from the raw text. */
  def bigramLmScore(docs: DataFrame, alpha: Double = 1.0,
      trainHi: String = "cd", materialize: Boolean = false): DataFrame = {
    val bi0 = bigramsOf(docs)
    val bi = if (materialize) bi0.localCheckpoint() else bi0
    val train = bi.filter(trainSplitPred(trainHi))
    val ctx = train.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val big = train.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val vocab = train.agg(countDistinct(col("w2")).as("v"))
    bigramScoreWith(bi, big, ctx, vocab, alpha)
  }

  /** Per-doc bigram extraction: one shuffle on doc_id (`lead` window
    * over the posexploded tokens) — shared by the composed trainer
    * above and [[TokenizerStore]]'s persisted train/score paths so the
    * two can never drift semantically. */
  private[operators] def bigramsOf(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "w1")))
      .withColumn("w2", lead(col("w1"), 1).over(w))
      .filter(col("w2").isNotNull)
  }

  /** The [[graft.operators.Curation.hashSplit]] train bucket as a
    * predicate over bigram rows. */
  private[operators] def trainSplitPred(trainHi: String): Column =
    substring(md5(col("doc_id").cast(StringType).cast(BinaryType)), 1, 2) < trainHi

  /** Score a bigram stream against a (possibly frozen) model: Laplace-
    * smoothed mean negative log P(w₂|w₁). The count tables come in as
    * DataFrames so Catalyst sizes the joins (broadcast while they fit,
    * shuffle-hash beyond); only the 1-row vocab scalar is a forced
    * broadcast. */
  private[operators] def bigramScoreWith(bi: DataFrame, big: DataFrame,
      ctx: DataFrame, vocab: DataFrame, alpha: Double): DataFrame =
    bi.join(big, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("logp", log(
        (coalesce(col("c2"), lit(0L)) + alpha) /
          (coalesce(col("c1"), lit(0L)) + col("v") * alpha)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(IntegerType).as("n_bigrams"),
        (avg(col("logp")) * -1d).as("cross_entropy"))

  private def xtBigramLm(spark: SparkSession, dir: String): DataFrame =
    bigramLmScore(Tables.load(spark, dir, "documents")).orderBy(col("doc_id"))

  /** The CCNet deployment shape: the LM is trained ONCE into a
    * persisted [[TokenizerStore]] artifact (fingerprint-keyed warehouse
    * dir — the build runs on first use, later passes reuse it), and
    * scoring joins the corpus bigrams against the frozen count tables.
    * Hash-matches the SAME oracle as the composed `xt_bigram_lm`: the
    * model round-trip must be invisible. */
  private def xtBigramLmPersisted(spark: SparkSession, dir: String): DataFrame = {
    val tokDir = TokenizerStore.ensureTokenizerFor(spark,
      s"$dir/documents.parquet", "biglm-a1-cd",
      d => TokenizerStore.trainBigramLm(Tables.load(spark, dir, "documents"), d))
    TokenizerStore.scoreBigramLm(Tables.load(spark, dir, "documents"), tokDir)
      .orderBy(col("doc_id"))
  }

  /** Bigrams as "w₁ w₂" strings (tokens cannot contain spaces after
    * [[Dedup.normText]], so the pairing is injective and DuckDB's list
    * comprehension extracts them without WITH ORDINALITY). Shared with
    * [[Curation]]'s perplexity-bucket oracle and [[graft.streaming.CurateStream]]'s
    * LM-gate oracle, which wrap it as a subquery. */
  private[graft] val bigramLmScoreSql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    string_split(trim(lower(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id,
      |    unnest([w[i+1] || ' ' || w[i+2] for i in range(len(w) - 1)]) AS bg
      |  FROM toks),
      |sp AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM bi),
      |train AS (
      |  SELECT bg, w1 FROM sp
      |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'),
      |c1 AS (SELECT w1, COUNT(*) AS c1 FROM train GROUP BY w1),
      |c2 AS (SELECT bg, COUNT(*) AS c2 FROM train GROUP BY bg),
      |v AS (SELECT COUNT(DISTINCT string_split(bg, ' ')[2]) AS v FROM train)
      |SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_bigrams,
      |  -AVG(ln((COALESCE(c2.c2, 0) + 1.0) /
      |           (COALESCE(c1.c1, 0) + 1.0 * (SELECT v FROM v)))) AS cross_entropy
      |FROM sp LEFT JOIN c2 USING (bg) LEFT JOIN c1 USING (w1)
      |GROUP BY doc_id""".stripMargin

  private val xtBigramLmSql = bigramLmScoreSql + "\nORDER BY doc_id"

  // ---------------------------------------------------- BPE learning
  /** Byte-pair-encoding MERGE LEARNING (Sennrich et al. 2016) — the
    * tokenizer-training stage of a data pipeline, not just tokenizing
    * with one: repeatedly merge the most frequent adjacent symbol pair
    * (weighted by word frequency, ties to the lexicographically first
    * pair), left-to-right non-overlapping per word, and emit the
    * ordered merge table a tokenizer is built from.
    *
    * 100 TB shape — the same split real BPE trainers make: the
    * corpus-sized work is ONE tokenize + word-count shuffle; training
    * then runs on the top-`vocabCap` word-frequency table (capped
    * deterministically by (freq DESC, word ASC)), the
    * bounded-training-collect discipline every quantizer here uses
    * (HF's trainer likewise fits on the word-count table, never the
    * corpus). Words are gated to `[a-z0-9]+` post-normalization so
    * Java and RE2 char semantics agree (multi-codepoint graphemes
    * split differently between UTF-16 and UTF-8 regex engines).
    *
    * The oracle unrolls every round as generated CTEs (the x2_kmeans
    * idiom): pair counts from the symbol strings, argmax, and the
    * merge applied as a DOUBLE string replace — two left-to-right
    * passes are exactly equivalent to symbol-wise non-overlapping
    * merging because pass 1 leaves no two pending occurrences
    * adjacent (shared-separator chains like `a b a b` need the second
    * pass; `a a a` correctly yields `aa a` in either formulation). */
  def bpeMerges(docs: DataFrame, rounds: Int = 8, vocabCap: Int = 256): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = docs.select(explode(tokens(col("text"))).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word")).limit(vocabCap)
      .as[(String, Long)].collect()
    var syms = vocab.map { case (w, f) => (w.map(_.toString).toArray, f) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((s, f) <- syms; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f
      if (counts.isEmpty) exhausted = true
      else {
        val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x, y) }
        out += ((r, s"$a $b", a + b, c))
        syms = syms.map { case (s, f) =>
          val buf = Array.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { buf += a + b; i += 2 }
            else { buf += s(i); i += 1 }
          }
          (buf.result(), f)
        }
        r += 1
      }
    }
    out.result().toDF("rank", "pair", "merged", "cnt")
      .select(col("rank").cast(IntegerType), col("pair"), col("merged"), col("cnt"))
  }

  private def xtBpeMerges(spark: SparkSession, dir: String): DataFrame =
    bpeMerges(Tables.load(spark, dir, "documents")).orderBy(col("rank"))

  /** The shared learning CTEs: `capped` top-V vocab, `w0` char
    * symbolization, and per-round (pair counts `p_r`, argmax `m_r`,
    * merged vocab `w_{r+1}`). Both BPE oracles prepend this. */
  private def bpeRoundsCtes(rounds: Int, cap: Int): String = {
    val roundCtes = (0 until rounds).map { r =>
      s"""p$r AS (
         |  SELECT pr, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq, unnest([s[i+1] || ' ' || s[i+2] for i in range(len(s) - 1)]) AS pr
         |    FROM (SELECT string_split(trim(sym), ' ') AS s, freq FROM w$r))
         |  GROUP BY pr),
         |m$r AS (SELECT $r AS rank, pr, cnt FROM p$r ORDER BY cnt DESC, pr LIMIT 1),
         |w${r + 1} AS (
         |  SELECT replace(replace(sym,
         |      ' ' || m.pr || ' ', ' ' || replace(m.pr, ' ', '') || ' '),
         |      ' ' || m.pr || ' ', ' ' || replace(m.pr, ' ', '') || ' ') AS sym, freq
         |  FROM w$r CROSS JOIN m$r m)""".stripMargin
    }.mkString(",\n")
    s"""capped AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(string_split(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS word
       |    FROM documents)
       |  WHERE regexp_full_match(word, '[a-z0-9]+')
       |  GROUP BY word ORDER BY freq DESC, word LIMIT $cap),
       |w0 AS (
       |  SELECT ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS sym, freq FROM capped),
       |$roundCtes""".stripMargin
  }

  private val xtBpeMergesSql = {
    val (rounds, cap) = (8, 256)
    val unions = (0 until rounds)
      .map(r => s"SELECT rank, pr, cnt FROM m$r").mkString("\nUNION ALL ")
    s"""WITH ${bpeRoundsCtes(rounds, cap)}
       |SELECT CAST(rank AS INTEGER) AS rank, pr AS pair,
       |  replace(pr, ' ', '') AS merged, cnt
       |FROM ($unions)
       |ORDER BY rank""".stripMargin
  }

  /** Tokenize the CORPUS with the learned merges — the encode side:
    * per-doc BPE token counts and tokens-per-word, the budget metric a
    * pipeline prices datasets with. The merge table is action-collected
    * (≤ rounds rows) and applied as a chain of 2×rounds LITERAL
    * `replace` column ops — whole-stage-codegen'd, no UDF; the double
    * replace carries the same left-to-right equivalence the learning
    * rounds use. Map-only over the corpus after one word explode;
    * words outside the `[a-z0-9]+` gate are excluded from both sides'
    * counts (documented: real BPE pre-tokenizers split those off). */
  def bpeEncodeStats(docs: DataFrame, rounds: Int = 8, vocabCap: Int = 256): DataFrame =
    bpeEncodeWith(docs,
      bpeMerges(docs, rounds, vocabCap).orderBy(col("rank"))
        .select(col("pair"), col("merged")).collect()
        .map(r => (r.getString(0), r.getString(1))))

  /** Encode against a FROZEN ordered merge table — the train-once /
    * encode-many half ([[TokenizerStore]] persists the table; the
    * composed row above re-learns it per call, which is its declared
    * one-shot contract, not the deployment shape). Map-only over the
    * corpus after one word explode: the ≤rounds merges arrive as a
    * driver-side array and are applied as 2×rounds LITERAL `replace`
    * ops — whole-stage codegen, no UDF, no second corpus pass. */
  private[operators] def bpeEncodeWith(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs.select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
    var sym: Column = concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 "))
    for ((pair, merged) <- merges) {
      val pat = lit(" " + pair + " ")
      val rep = lit(" " + merged + " ")
      sym = replace(replace(sym, pat, rep), pat, rep)
    }
    words.withColumn("n_sym", size(split(trim(sym), " ")).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(IntegerType).as("n_words"),
        sum(col("n_sym")).as("n_bpe_tokens"))
      .withColumn("bpe_per_word",
        col("n_bpe_tokens").cast(DoubleType) / col("n_words"))
  }

  /** Per-word token-ID sequences under a frozen merge table + vocab —
    * the model-input shape ([[TokenizerStore.encodeBpeIds]] supplies
    * both from the persisted artifact). `pos` is the word's index in
    * the FULL token stream (gate gaps preserved), so document order is
    * recoverable; ids are CSV-serialized (the `xt_hash_vectorize`
    * array-compare convention). */
  private[operators] def bpeEncodeIdsWith(docs: DataFrame,
      merges: Seq[(String, String)], vocab: Map[String, Int]): DataFrame = {
    val words = docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "word")))
      .filter(col("word").rlike("^[a-z0-9]+$"))
    var sym: Column = concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 "))
    for ((pair, merged) <- merges) {
      val pat = lit(" " + pair + " ")
      val rep = lit(" " + merged + " ")
      sym = replace(replace(sym, pat, rep), pat, rep)
    }
    val syms = split(trim(sym), " ")
    words
      .withColumn("pos", col("pos").cast(IntegerType))
      .withColumn("n_sym", size(syms).cast(IntegerType))
      .withColumn("ids", concat_ws(",",
        transform(syms, s => element_at(typedLit(vocab), s).cast(StringType))))
      .select(col("doc_id"), col("pos"), col("word"), col("n_sym"), col("ids"))
  }

  private def xtBpeEncode(spark: SparkSession, dir: String): DataFrame =
    bpeEncodeStats(Tables.load(spark, dir, "documents")).orderBy(col("doc_id"))

  /** Train-once/encode-many: the merge table comes from the persisted
    * [[TokenizerStore]] artifact (learned on first use into the
    * fingerprint-keyed warehouse, the `xt_hashvec_persisted`
    * precedent), so the encode pays NO training shuffle — one ≤rounds-
    * row artifact read plus the map-only codegen encode. Hash-matches
    * the SAME oracle as the composed `xt_bpe_encode`. */
  private def xtBpeEncodePersisted(spark: SparkSession, dir: String): DataFrame = {
    val tokDir = TokenizerStore.ensureTokenizerFor(spark,
      s"$dir/documents.parquet", "bpe-r8v256",
      d => TokenizerStore.trainBpe(Tables.load(spark, dir, "documents"), d, 8, 256))
    TokenizerStore.encodeBpe(Tables.load(spark, dir, "documents"), tokDir)
      .orderBy(col("doc_id"))
  }

  private val xtBpeEncodeSql = {
    val (rounds, cap) = (8, 256)
    // LEFT JOIN ON TRUE, not CROSS JOIN: a corpus that exhausts
    // mergeable pairs before `rounds` leaves later m$r CTEs EMPTY, and
    // a cross join would annihilate every doc row while the Scala side
    // (which applies only the merges actually learned) keeps them —
    // the NULL-pair case passes sym through unchanged instead
    val encodeCtes = (0 until rounds).map { r =>
      s"""e${r + 1} AS (
         |  SELECT doc_id, CASE WHEN m.pr IS NULL THEN sym ELSE
         |    replace(replace(sym,
         |      ' ' || m.pr || ' ', ' ' || replace(m.pr, ' ', '') || ' '),
         |      ' ' || m.pr || ' ', ' ' || replace(m.pr, ' ', '') || ' ') END AS sym
         |  FROM e$r LEFT JOIN m$r m ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${bpeRoundsCtes(rounds, cap)},
       |cw AS (
       |  SELECT doc_id, word FROM (
       |    SELECT doc_id,
       |      unnest(string_split(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS word
       |    FROM documents)
       |  WHERE regexp_full_match(word, '[a-z0-9]+')),
       |e0 AS (
       |  SELECT doc_id, ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS sym FROM cw),
       |$encodeCtes
       |SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_words,
       |  CAST(SUM(len(string_split(trim(sym), ' '))) AS BIGINT) AS n_bpe_tokens,
       |  CAST(SUM(len(string_split(trim(sym), ' '))) AS DOUBLE) / COUNT(*) AS bpe_per_word
       |FROM e$rounds
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin
  }

  /** Tokenizer FERTILITY by language — the pricing table a tokenizer
    * audit publishes (tokens-per-word per language decides which
    * languages a shared vocabulary taxes; the metric behind "our
    * tokenizer is expensive in X" reports). Served from the same
    * frozen `bpe-r8v256` warehouse artifact as the persisted encode
    * rows (one training, another consumer), aggregated over the encode
    * output: integer token/word sums per language, one division at the
    * end, so both engines agree bit-for-bit. Docs with no BPE-gated
    * words (e.g. no `[a-z0-9]+` token at all) have no encode rows and
    * are excluded from their language's aggregate — mirrored exactly
    * by the oracle, which aggregates the same per-doc encode replay. */
  private def xtFertilityByLang(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val tokDir = TokenizerStore.ensureTokenizerFor(spark,
      s"$dir/documents.parquet", "bpe-r8v256",
      d => TokenizerStore.trainBpe(docs, d, 8, 256))
    TokenizerStore.encodeBpe(docs, tokDir)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).cast(IntegerType).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_bpe_tokens")).as("n_tokens"),
        (sum(col("n_bpe_tokens")).cast(DoubleType) / sum(col("n_words")))
          .as("tokens_per_word"))
      .orderBy(col("lang"))
  }

  private val xtFertilityByLangSql =
    s"""SELECT d.lang, CAST(COUNT(*) AS INTEGER) AS n_docs,
       |  CAST(SUM(enc.n_words) AS BIGINT) AS n_words,
       |  CAST(SUM(enc.n_bpe_tokens) AS BIGINT) AS n_tokens,
       |  CAST(SUM(enc.n_bpe_tokens) AS DOUBLE) / SUM(enc.n_words) AS tokens_per_word
       |FROM ($xtBpeEncodeSql) enc JOIN documents d USING (doc_id)
       |GROUP BY d.lang
       |ORDER BY d.lang""".stripMargin

  /** The complete tokenizer chain to MODEL INPUT: frozen artifact →
    * per-word token-id sequences — shares the `bpe-r8v256` warehouse
    * artifact with `xt_bpe_encode_persisted` (one training, two
    * consumers). The oracle re-learns the merges as CTEs, carries
    * (pos, word) through the encode chain, derives the SAME id
    * assignment (chars 0–35, merge r → 36+r, first-wins on surface
    * collision via MIN(id)), and looks ids up through a one-row map. */
  private def xtBpeIds(spark: SparkSession, dir: String): DataFrame = {
    val tokDir = TokenizerStore.ensureTokenizerFor(spark,
      s"$dir/documents.parquet", "bpe-r8v256",
      d => TokenizerStore.trainBpe(Tables.load(spark, dir, "documents"), d, 8, 256))
    TokenizerStore.encodeBpeIds(Tables.load(spark, dir, "documents"), tokDir)
      .orderBy(col("doc_id"), col("pos"))
  }

  /** Everything through the per-word encoded symbols (`f<rounds>`: one
    * row per gated word carrying doc_id/pos/word/sym) plus the derived
    * id vocabulary (`vocab`/`vm`): the shared oracle base for
    * `xt_bpe_ids` and [[Curation]]'s `xc_pack_ids`. `encodeFrom`
    * swaps the ENCODE-side corpus (e.g. a curation-survivors subquery
    * for `xs_curate_pack`) while the training CTEs keep reading the
    * full `documents` — the frozen-tokenizer contract: the artifact is
    * trained once offline, then applied to whatever corpus flows by. */
  private[graft] def bpeIdsCtes(rounds: Int = 8, cap: Int = 256,
      encodeFrom: String = "documents"): String = {
    val encodeCtes = (0 until rounds).map { r =>
      s"""f${r + 1} AS (
         |  SELECT doc_id, pos, word, CASE WHEN m.pr IS NULL THEN sym ELSE
         |    replace(replace(sym,
         |      ' ' || m.pr || ' ', ' ' || replace(m.pr, ' ', '') || ' '),
         |      ' ' || m.pr || ' ', ' ' || replace(m.pr, ' ', '') || ' ') END AS sym
         |  FROM f$r LEFT JOIN m$r m ON TRUE)""".stripMargin
    }.mkString(",\n")
    val charVals = (('a' to 'z') ++ ('0' to '9')).zipWithIndex
      .map { case (c, i) => s"('$c',$i)" }.mkString(",")
    val mergeUnion = (0 until rounds).map(r => s"SELECT rank, pr FROM m$r")
      .mkString(" UNION ALL ")
    s"""${bpeRoundsCtes(rounds, cap)},
       |pw AS (
       |  SELECT doc_id, CAST(u['p'] AS INTEGER) AS pos, u['w'] AS word
       |  FROM (SELECT doc_id,
       |          unnest([{'p': i, 'w': w[i+1]} for i in range(len(w))]) AS u
       |        FROM (SELECT doc_id,
       |                string_split(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS w
       |              FROM $encodeFrom))
       |  WHERE regexp_full_match(u['w'], '[a-z0-9]+')),
       |f0 AS (
       |  SELECT doc_id, pos, word, ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS sym FROM pw),
       |$encodeCtes,
       |chars AS (SELECT * FROM (VALUES $charVals) c(sym, id)),
       |mvocab AS (SELECT replace(pr, ' ', '') AS sym, 36 + rank AS id FROM ($mergeUnion)),
       |vocab AS (
       |  SELECT sym, MIN(id) AS id
       |  FROM (SELECT * FROM chars UNION ALL SELECT * FROM mvocab) GROUP BY sym),
       |vm AS (SELECT map(list(sym ORDER BY id), list(id ORDER BY id)) AS m FROM vocab)""".stripMargin
  }

  private val xtBpeIdsSql = {
    val rounds = 8
    s"""WITH ${bpeIdsCtes(rounds, 256)}
       |SELECT doc_id, pos, word,
       |  CAST(len(string_split(trim(sym), ' ')) AS INTEGER) AS n_sym,
       |  array_to_string(list_transform(string_split(trim(sym), ' '),
       |    s -> map_extract(vm.m, s)[1]), ',') AS ids
       |FROM f$rounds CROSS JOIN vm
       |ORDER BY doc_id, pos""".stripMargin
  }

  /** The DECODE leg as a declared row ([[TokenizerStore.decodeBpeIds]]):
    * ids through the inverse vocabulary back to text, per-doc. The
    * oracle states ground truth directly — the gated normalization of
    * the source text with `lossless = TRUE` — while the Spark side
    * earns it by actually round-tripping encode→ids→decode, so any
    * drift anywhere in the chain diverges the hash. Empty-gate docs
    * (no [a-z0-9]+ word) have no encoded rows and are absent on both
    * sides. */
  private def xtBpeDecode(spark: SparkSession, dir: String): DataFrame = {
    val tokDir = TokenizerStore.ensureTokenizerFor(spark,
      s"$dir/documents.parquet", "bpe-r8v256",
      d => TokenizerStore.trainBpe(Tables.load(spark, dir, "documents"), d, 8, 256))
    TokenizerStore.decodeBpeIds(Tables.load(spark, dir, "documents"), tokDir)
      .orderBy(col("doc_id"))
  }

  private val xtBpeDecodeSql =
    """WITH g AS (
      |  SELECT doc_id,
      |    list_filter(string_split(trim(lower(regexp_replace(text, '\s+', ' ', 'g'))), ' '),
      |      w -> regexp_full_match(w, '[a-z0-9]+')) AS gw
      |  FROM documents)
      |SELECT doc_id, CAST(len(gw) AS INTEGER) AS n_words,
      |  array_to_string(gw, ' ') AS text_detok, TRUE AS lossless
      |FROM g WHERE len(gw) > 0
      |ORDER BY doc_id""".stripMargin

  /** The artifact's VOCABULARY as a declared row — the id-assignment
    * contract value-checked directly (chars 0–35 in fixed order, merge
    * rank r → 36+r, first-wins on surface collision), not just through
    * the encode round-trip. Export shape: what a serving system ships
    * to its tokenizer clients. Driver-side: the map is ≤ 36+rounds
    * entries, the bounded-artifact class. */
  private def xtBpeVocab(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tokDir = TokenizerStore.ensureTokenizerFor(spark,
      s"$dir/documents.parquet", "bpe-r8v256",
      d => TokenizerStore.trainBpe(Tables.load(spark, dir, "documents"), d, 8, 256))
    TokenizerStore.bpeVocab(spark, tokDir).toSeq.toDF("sym", "id")
      .select(col("sym"), col("id").cast(IntegerType))
      .orderBy(col("id"))
  }

  private val xtBpeVocabSql =
    s"""WITH ${bpeIdsCtes(8, 256)}
       |SELECT sym, CAST(id AS INTEGER) AS id FROM vocab
       |ORDER BY id""".stripMargin

  private val Bm25Terms = Seq("join", "window", "stream")

  private def xtBm25(spark: SparkSession, dir: String): DataFrame =
    bm25TopK(Tables.load(spark, dir, "documents"), Bm25Terms, 10)

  private val xtBm25Sql = {
    val tfCols = Bm25Terms.map(t =>
      s"CAST(len(list_filter(w, x -> x = '$t')) AS INTEGER) AS tf_$t").mkString(",\n    ")
    val dfCols = Bm25Terms.map(t =>
      s"CAST(SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t").mkString(",\n    ")
    val scoreTerms = Bm25Terms.map(t =>
      s"""((n - df_$t + 0.5e0) / (df_$t + 0.5e0))
         |    * ((tf_$t * 2.2e0) / (tf_$t + 1.2e0 * (0.25e0 + 0.75e0 * (dl / avgdl))))"""
        .stripMargin).mkString("\n  + ")
    val tfNames = Bm25Terms.map(t => s"tf_$t").mkString(", ")
    // 2.2e0-style literals force DOUBLE in DuckDB (bare 2.2 is DECIMAL)
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(len(w) AS INTEGER) AS dl,
       |    $tfCols
       |  FROM (SELECT doc_id,
       |          string_split(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS w
       |        FROM documents)),
       |s AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    ${Num.sqlSum("dl")} / COUNT(*) AS avgdl,
       |    $dfCols
       |  FROM d)
       |SELECT doc_id, dl, $tfNames,
       |  $scoreTerms AS bm25
       |FROM d CROSS JOIN s
       |ORDER BY bm25 DESC, doc_id
       |LIMIT 10""".stripMargin
  }

  // ------------------------------------------------- hybrid retrieval
  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009)
    * of the lexical BM25 arm and the dense cosine arm — the hybrid
    * serve production retrieval actually runs (lexical recall for rare
    * strings, dense recall for paraphrase) fused WITHOUT score
    * calibration: rrf = Σ 1/(rrfK + rank), ranks only, so the two
    * arms' incomparable score scales never meet.
    *
    * Scale posture: each arm is its own already-bounded top-k
    * ([[bm25TopK]]'s two corpus scans + TakeOrderedAndProject;
    * [[Similarity.cosineTopK]]'s broadcast map-only pass), and fusion
    * touches ≤ 2·armK rows — the full-outer join and the final rank
    * window run on a driver-screen-sized frame no matter the corpus
    * size; the unpartitioned window is bounded by construction.
    * Hash-exact: rrf is two fixed-order rational terms (1/(k+rank) —
    * no libm), ranks are integer, ties break on doc_id. */
  def hybridRrf(docs: DataFrame, emb: DataFrame, terms: Seq[String],
      probeId: Long, armK: Int, k: Int, rrfK: Int = 60): DataFrame = {
    val lex = bm25TopK(docs, terms, armK)
      .withColumn("lex_rnk", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id"))))
      .select(col("doc_id"), col("lex_rnk"))
    val dense = Similarity.cosineTopK(
        emb, emb.filter(col("vec_id") === probeId), armK)
      .select(col("neighbor_id").as("doc_id"), col("rnk").as("dense_rnk"))
    lex.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("lex_rnk")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("dense_rnk")), lit(0.0)))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("rnk") <= k)
      .select(col("rnk"), col("doc_id"), col("lex_rnk"), col("dense_rnk"),
        col("rrf"))
  }

  /** Declared: BM25 over [[Bm25Terms]] fused with the cosine
    * neighborhood of vec_id 0's embedding (documents and embeddings
    * share the id space), 20 candidates per arm, top 10 fused. A doc
    * retrieved by only one arm carries NULL for the other arm's rank
    * and contributes one term — the standard RRF treatment. */
  private def x2HybridRrf(spark: SparkSession, dir: String): DataFrame =
    hybridRrf(Tables.load(spark, dir, "documents"),
      Tables.load(spark, dir, "embeddings"), Bm25Terms, 0L, 20, 10)
      .orderBy(col("rnk"))

  /** Oracle: both arms replayed stage-by-stage — the BM25 CTE is the
    * xt_bm25 expression re-ranked, the dense CTE the x2_cosine_topk
    * expression for probe 0 — fused with the same fixed-order rational
    * arithmetic (1.0e0 literals force DOUBLE; bare decimals are
    * DECIMAL in DuckDB). */
  private def x2HybridRrfSql: String = {
    val tfCols = Bm25Terms.map(t =>
      s"CAST(len(list_filter(w, x -> x = '$t')) AS INTEGER) AS tf_$t").mkString(",\n    ")
    val dfCols = Bm25Terms.map(t =>
      s"CAST(SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t").mkString(",\n    ")
    val scoreTerms = Bm25Terms.map(t =>
      s"""((n - df_$t + 0.5e0) / (df_$t + 0.5e0))
         |    * ((tf_$t * 2.2e0) / (tf_$t + 1.2e0 * (0.25e0 + 0.75e0 * (dl / avgdl))))"""
        .stripMargin).mkString("\n  + ")
    val sim = """list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) /
      |      (sqrt(list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(p.embedding AS DOUBLE[]))) *
      |       sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))))""".stripMargin
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(len(w) AS INTEGER) AS dl,
       |    $tfCols
       |  FROM (SELECT doc_id,
       |          string_split(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS w
       |        FROM documents)),
       |s AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    ${Num.sqlSum("dl")} / COUNT(*) AS avgdl,
       |    $dfCols
       |  FROM d),
       |lex AS (
       |  SELECT doc_id,
       |    ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rnk
       |  FROM (SELECT doc_id, $scoreTerms AS bm25
       |        FROM d CROSS JOIN s
       |        ORDER BY bm25 DESC, doc_id LIMIT 20) t),
       |den AS (
       |  SELECT neighbor_id AS doc_id, rnk AS dense_rnk FROM (
       |    SELECT c.vec_id AS neighbor_id,
       |      ROW_NUMBER() OVER (ORDER BY
       |        $sim DESC,
       |        c.vec_id) AS rnk
       |    FROM embeddings p JOIN embeddings c
       |      ON p.vec_id = 0 AND c.vec_id <> 0) t
       |  WHERE rnk <= 20),
       |f AS (
       |  SELECT COALESCE(lex.doc_id, den.doc_id) AS doc_id, lex_rnk, dense_rnk,
       |    COALESCE(1.0e0 / (60 + lex_rnk), 0.0e0)
       |      + COALESCE(1.0e0 / (60 + dense_rnk), 0.0e0) AS rrf
       |  FROM lex FULL OUTER JOIN den ON lex.doc_id = den.doc_id)
       |SELECT rnk, doc_id, lex_rnk, dense_rnk, rrf FROM (
       |  SELECT doc_id, lex_rnk, dense_rnk, rrf,
       |    ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rnk
       |  FROM f) t
       |WHERE rnk <= 10
       |ORDER BY rnk""".stripMargin
  }

  val all: Seq[Declared] = Seq(
    Declared("xt_bm25", xtBm25, Some(xtBm25Sql)),
    Declared("x2_hybrid_rrf", x2HybridRrf, Some(x2HybridRrfSql)),
    Declared("xt_word_freq_score", xtWordFreq, Some(xtWordFreqSql)),
    Declared("xt_bigram_lm", xtBigramLm, Some(xtBigramLmSql)),
    Declared("xt_bigram_lm_persisted", xtBigramLmPersisted, Some(xtBigramLmSql)),
    Declared("xt_bpe_merges", xtBpeMerges, Some(xtBpeMergesSql)),
    Declared("xt_bpe_encode", xtBpeEncode, Some(xtBpeEncodeSql)),
    Declared("xt_bpe_encode_persisted", xtBpeEncodePersisted, Some(xtBpeEncodeSql)),
    Declared("xt_fertility_by_lang", xtFertilityByLang, Some(xtFertilityByLangSql)),
    Declared("xt_bpe_ids", xtBpeIds, Some(xtBpeIdsSql)),
    Declared("xt_bpe_decode", xtBpeDecode, Some(xtBpeDecodeSql)),
    Declared("xt_bpe_vocab", xtBpeVocab, Some(xtBpeVocabSql)),
    Declared("x3_token_freq", x3TokenFreq, Some(x3TokenFreqSql)),
    Declared("x4_approx_distinct", x4Approx, Some(x4ApproxSql)),
    Declared("x4_hll_union", x4HllUnion, Some(x4HllUnionSql)),
    Declared("x4_kmv_jaccard", x4KmvJaccard, Some(x4KmvJaccardSql)),
    Declared("xt_hash_vectorize", xtHashVectorize, Some(xtHashVectorizeSql)),
    Declared("xt_hashvec_knn", xtHashvecKnn, Some(xtHashvecKnnSql)),
    Declared("xt_hashvec_index", xtHashvecIndex, Some(xtHashvecIndexSql)),
    Declared("xt_hashvec_persisted", xtHashvecPersisted, Some(xtHashvecIndexSql)),
    Declared("x4_approx_quantile", x4Quantile, Some(x4QuantileSql)),
    Declared("xt_token_stats", xtTokens, Some(xtTokensSql)),
    Declared("xt_quality", xtQuality, Some(xtQualitySql)),
    Declared("xt_langid", xtLangid, Some(xtLangidSql)),
    Declared("xt_fingerprint", xtFingerprint, Some(xtFingerprintSql)),
    Declared("xt_redact", xtRedact, Some(xtRedactSql)),
    Declared("xt_chunk", xtChunk, Some(xtChunkSql)),
    Declared("xt_chunk_neighbors", xtChunkNeighbors, Some(xtChunkNeighborsSql)),
    Declared("xt_tfidf", xtTfidf, Some(xtTfidfSql)),
    Declared("xt_ngram_topk", xtNgramTopk, Some(xtNgramTopkSql)),
    Declared("xt_heavy_hitters", xtHeavyHitters, Some(xtHeavyHittersSql)))
}
