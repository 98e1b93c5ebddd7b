package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Deduplication operators for a training-data pipeline (SURVEY.md §2B X1).
  *
  * All paths are shuffle-friendly set operations — no cross joins:
  *  - exact: hash groupBy on a normalized key,
  *  - near-dup: MinHash signatures + LSH banding so only same-bucket
  *    candidates are joined, then exact Jaccard verification on the
  *    (tiny) candidate set. At 100 TB the candidate join is the only
  *    pairwise work and its size is O(true pairs + banding false
  *    positives), not O(n²),
  *  - SimHash: 64-bit fingerprint whose Hamming distance tracks cosine
  *    similarity of the token multiset; banding over 16-bit chunks finds
  *    all pairs within Hamming ≤ 3 by pigeonhole,
  *  - embedding near-dup: exact pairwise at fixture scale (the declared
  *    oracle-verified form); the LSH-pruned scale path is
  *    [[Similarity.annCandidates]].
  */
object Dedup {

  /** Whitespace-collapsed lowercase normalization — the dedup key. */
  def normText(text: Column): Column =
    trim(lower(regexp_replace(text, "\\s+", " ")))

  /** Word tokens of the normalized text. */
  def tokens(text: Column): Column = split(normText(text), " ")

  /** Distinct 5-word shingles; short docs collapse to one whole-text
    * shingle (mirrors the DuckDB oracle expression exactly). */
  def shingles(text: Column): Column = {
    val w = tokens(text)
    when(size(w) < 5, array(concat_ws(" ", w)))
      .otherwise(array_distinct(
        transform(sequence(lit(0), size(w) - 5),
          i => concat_ws(" ", slice(w, i + lit(1), lit(5))))))
  }

  // ------------------------------------------------------------- exact
  private def x1Exact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .groupBy(normText($"text").as("norm"))
      .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      .select($"doc_id", $"n_copies")
      .orderBy($"doc_id")
  }

  private val x1ExactSql =
    """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY trim(lower(regexp_replace(text, '\s+', ' ', 'g')))
      |ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------- minhash + LSH
  /** 128 MinHash functions as xxhash64 re-mixes of the shingle hash
    * (one string hash per shingle, then cheap long-long mixing), banded
    * 32×4: P(candidate | J=0.8) = 1-(1-0.8⁴)³² ≈ 1-5e-8 — no misses at
    * the declared threshold. */
  private val MinhashK = 128
  private val Bands = 32
  private val RowsPerBand = MinhashK / Bands

  /** (doc_id, sig array(128)) signatures. */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val withShingle = docs
      .select(col("doc_id"), explode(shingles(col("text"))).as("shingle"))
      .withColumn("x", xxhash64(col("shingle")))
    val mins = (0 until MinhashK).map(i => min(xxhash64(col("x"), lit(i))).as(s"m$i"))
    withShingle.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until MinhashK).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH candidate pairs: docs sharing at least one band hash. */
  def lshCandidates(sigs: DataFrame): DataFrame = {
    val bandHashes = (0 until Bands).map { b =>
      val cols = (0 until RowsPerBand).map(r => col("sig").getItem(b * RowsPerBand + r))
      xxhash64(cols: _*)
    }
    val banded = sigs
      .select(col("doc_id"), posexplode(array(bandHashes: _*)).as(Seq("band", "bh")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Near-dup pairs at Jaccard ≥ `threshold`, exact-verified on the LSH
    * candidate set. */
  def neardupMinhash(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    val sh = docs.select(col("doc_id"), shingles(col("text")).as("sh"))
    val cands = lshCandidates(minhashSignatures(docs))
    cands
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  private def x1Minhash(spark: SparkSession, dir: String): DataFrame =
    neardupMinhash(Tables.load(spark, dir, "documents"))
      .orderBy(col("doc_a"), col("doc_b"))

  // the oracle verifies the WHOLE pipeline end-to-end against an exact
  // O(n²) Jaccard — any banding miss would show as a missing row.
  private val x1MinhashSql =
    """WITH s AS (
      |  SELECT doc_id, CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
      |    ELSE list_distinct([array_to_string(w[i+1:i+5], ' ') for i in range(len(w)-4)]) END sh
      |  FROM (SELECT doc_id,
      |          string_split(trim(lower(regexp_replace(text,'\s+',' ','g'))), ' ') w
      |        FROM documents))
      |SELECT doc_a, doc_b, jaccard FROM (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    len(list_intersect(a.sh, b.sh))::DOUBLE /
      |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
      |  FROM s a JOIN s b ON a.doc_id < b.doc_id) p
      |WHERE jaccard >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  // ----------------------------------------------------------- simhash
  /** 64-bit SimHash of the token multiset: per-bit majority vote of
    * xxhash64(token). Identical token multisets → identical fingerprints;
    * small edits flip few bits. */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val votes = (0 until 64).map { j =>
      sum(when(shiftrightunsigned(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$j")
    }
    val assembled = (0 until 64).map { j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    tok.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), assembled.as("simhash"))
  }

  /** All pairs within Hamming distance ≤ 3, found via 4×16-bit banding
    * (pigeonhole: ≤3 differing bits leave ≥1 band identical) — a keyed
    * equi-join, never a cross join. */
  def simhashNeardup(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simhash(docs)
    val banded = sh.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(0xffffL)): _*))
        .as(Seq("band", "chunk")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  private def x1Simhash(spark: SparkSession, dir: String): DataFrame =
    simhash(Tables.load(spark, dir, "documents")).orderBy(col("doc_id"))

  // ------------------------------------------- embedding cosine neardup
  /** Exact pairwise cosine pairs ≥ threshold. The fixture's vectors are
    * near-orthogonal (max pair ≈ 0.51) so the declared threshold is 0.4.
    * At 100 TB replace the self-join with [[Similarity.annCandidates]]
    * bucketing first; the verification arithmetic is identical. */
  def embeddingNeardup(emb: DataFrame, threshold: Double): DataFrame = {
    val e = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("dot", aggregate(
        zip_with(col("a.v"), col("b.v"), (x, y) => x * y), lit(0.0), (a, x) => a + x))
      .withColumn("cosine", col("dot") / (col("a.nrm") * col("b.nrm")))
      .filter(col("cosine") >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cosine"))
  }

  private def x1Embedding(spark: SparkSession, dir: String): DataFrame =
    embeddingNeardup(Tables.load(spark, dir, "embeddings"), 0.4)
      .orderBy(col("vec_a"), col("vec_b"))

  private val x1EmbeddingSql =
    """SELECT vec_a, vec_b, cosine FROM (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
      |      (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
      |       sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS cosine
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) p
      |WHERE cosine >= 0.4
      |ORDER BY vec_a, vec_b""".stripMargin

  val all: Seq[Declared] = Seq(
    Declared("x1_exact_dedup", x1Exact, Some(x1ExactSql)),
    Declared("x1_neardup_minhash", x1Minhash, Some(x1MinhashSql)),
    Declared("x1_simhash", x1Simhash, None),
    Declared("x1_embedding_neardup", x1Embedding, Some(x1EmbeddingSql)))
}
