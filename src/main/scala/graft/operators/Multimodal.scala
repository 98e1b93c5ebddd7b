package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Multimodal-column plumbing (SURVEY.md north-star extension).
  *
  * Media is carried as an opaque `binary` column plus typed metadata —
  * never decoded by the engine core. Decode / feature-extraction runs as
  * per-partition batch logic over `Dataset[MediaRecord]` (`mapPartitions`):
  * the iterator shape means one decoder instance per partition (the
  * expensive init is amortized across the batch, exactly how a JNI/FFmpeg
  * decoder would be held), rows stream through without materializing the
  * partition, and the output is a typed Dataset the optimizer can prune.
  *
  * The codec itself is a STUB (no image/audio libraries in this
  * environment): [[StubCodec.decode]] derives deterministic pseudo
  * dimensions/features from the bytes. The Spark-side contract — schema,
  * binary transport, partition batching, typed output — is real and
  * tested; swapping in a real decoder changes only the body of
  * [[StubCodec]].
  */
object Multimodal {

  /** A media row: opaque payload + metadata the pipeline can route on. */
  final case class MediaRecord(media_id: Long, fmt: String, content: Array[Byte])

  /** Extracted features (what a real image/audio decoder would emit). */
  final case class MediaFeatures(
      media_id: Long, fmt: String, n_bytes: Int,
      width: Int, height: Int, mean_byte: Double, n_frames: Int)

  /** STUB decoder — deterministic fake in place of a real codec. */
  object StubCodec {
    /** ??? real implementation: image/audio decode via a native library.
      * The stub derives pseudo-dimensions from leading bytes and a mean
      * over the payload — deterministic, so tests and the driver's
      * rows-check are stable. */
    def decode(r: MediaRecord): MediaFeatures = {
      val n = r.content.length
      val b0 = if (n > 0) r.content(0) & 0xff else 0
      val b1 = if (n > 1) r.content(1) & 0xff else 0
      var s = 0L; var i = 0
      while (i < n) { s += r.content(i) & 0xff; i += 1 }
      MediaFeatures(r.media_id, r.fmt, n,
        width = 16 + (b0 % 64) * 16, height = 16 + (b1 % 64) * 16,
        mean_byte = if (n == 0) 0.0 else s.toDouble / n,
        n_frames = 1 + n % 4)
    }

    /** ??? real implementation: resample/resize. Stub: byte subsampling
      * that keeps every k-th byte — preserves the batch/stream shape. */
    def resize(content: Array[Byte], k: Int): Array[Byte] = {
      val out = new Array[Byte]((content.length + k - 1) / k)
      var i = 0
      while (i < out.length) { out(i) = content(i * k); i += 1 }
      out
    }

    /** ??? real implementation: decode container, sample video frames.
      * Stub: split the payload into `decode(r).n_frames` contiguous
      * slices — the last frame absorbs the remainder — so frame shape
      * and count are deterministic functions of the bytes. */
    def frameSample(r: MediaRecord): Seq[Array[Byte]] = {
      val n = r.content.length
      val frames = 1 + n % 4
      val base = n / frames
      (0 until frames).map { f =>
        val start = f * base
        val end = if (f == frames - 1) n else start + base
        java.util.Arrays.copyOfRange(r.content, start, end)
      }
    }
  }

  /** The fixture's media table: documents' bytes as opaque payloads with
    * a format tag derived from the source column. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id".as("media_id"),
        concat(lit("fake/"), $"source").as("fmt"),
        $"text".cast(BinaryType).as("content"))
      .as[MediaRecord]
  }

  /** Decode features per partition — one codec per partition, streaming
    * iterator in/out. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (native handles etc.)
      it.map(StubCodec.decode)
    }
  }

  // ----------------------------------------------------------- declared
  /** Metadata/bytes portion — oracle-verifiable in SQL. */
  private def xmMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).toDF()
      .select($"media_id", $"fmt",
        octet_length($"content").as("n_bytes"),
        md5($"content").as("content_md5"))
      .orderBy($"media_id")
  }

  private val xmMetaSql =
    """SELECT doc_id AS media_id, 'fake/' || source AS fmt,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |  md5(text) AS content_md5
      |FROM documents
      |ORDER BY media_id""".stripMargin

  /** Feature extraction through the mapPartitions decode path. The stub
    * codec is deterministic byte-math, so the whole query IS
    * SQL-oracle-able: DuckDB reproduces every field from the UTF-8 bytes
    * of `text` (hex-pair decoding keeps it byte-exact with no ASCII
    * assumption). `mean_byte` is left as the raw IEEE division of the
    * same two integers in both engines — no round() on either side, so
    * no rounding-boundary flake. */
  private def xmFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaTable(spark, dir)).toDF()
      .select($"media_id", $"fmt", $"n_bytes", $"width", $"height",
        $"mean_byte", $"n_frames")
      .orderBy($"media_id")
  }

  /** Byte i of the blob, decoded from its lowercase-hex pair (1-based). */
  private val xmFeaturesSql =
    """WITH b AS (
      |  SELECT doc_id, source,
      |    lower(hex(encode(text))) AS h,
      |    octet_length(encode(text)) AS n
      |  FROM documents
      |), d AS (
      |  SELECT doc_id, source, n,
      |    CASE WHEN n > 0 THEN (strpos('0123456789abcdef', substr(h,1,1))-1)*16
      |                       + (strpos('0123456789abcdef', substr(h,2,1))-1)
      |         ELSE 0 END AS b0,
      |    CASE WHEN n > 1 THEN (strpos('0123456789abcdef', substr(h,3,1))-1)*16
      |                       + (strpos('0123456789abcdef', substr(h,4,1))-1)
      |         ELSE 0 END AS b1,
      |    CASE WHEN n = 0 THEN 0
      |         ELSE list_sum([(strpos('0123456789abcdef', substr(h, 2*i-1, 1))-1)*16
      |                      + (strpos('0123456789abcdef', substr(h, 2*i,   1))-1)
      |                        for i in range(1, n+1)]) END AS byte_sum
      |  FROM b
      |)
      |SELECT doc_id AS media_id, 'fake/' || source AS fmt,
      |  CAST(n AS INTEGER) AS n_bytes,
      |  CAST(16 + (b0 % 64) * 16 AS INTEGER) AS width,
      |  CAST(16 + (b1 % 64) * 16 AS INTEGER) AS height,
      |  CASE WHEN n = 0 THEN 0.0 ELSE CAST(byte_sum AS DOUBLE) / n END AS mean_byte,
      |  CAST(1 + n % 4 AS INTEGER) AS n_frames
      |FROM d ORDER BY media_id""".stripMargin

  /** The resize verb through the same mapPartitions batch path: the
    * stub keeps every 4th byte, so DuckDB reproduces the resized
    * payload's length and byte-mean from the original's hex (byte i of
    * the output is input byte 4i — hex chars 8i+1, 8i+2). Like
    * [[xmFeatures]], mean stays the raw IEEE division of identical
    * integers on both sides. */
  private def xmResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { it =>
      // per-partition codec init would go here, as in extractFeatures
      it.map { r =>
        val rs = StubCodec.resize(r.content, 4)
        var s = 0L; var i = 0
        while (i < rs.length) { s += rs(i) & 0xff; i += 1 }
        (r.media_id, rs.length,
          if (rs.isEmpty) 0.0 else s.toDouble / rs.length)
      }
    }.toDF("media_id", "n_bytes", "mean_byte")
      .orderBy($"media_id")
  }

  private val xmResizeSql =
    """WITH b AS (
      |  SELECT doc_id, lower(hex(encode(text))) AS h,
      |    octet_length(encode(text)) AS n
      |  FROM documents
      |), d AS (
      |  SELECT doc_id, (n + 3) // 4 AS m,
      |    CASE WHEN n = 0 THEN 0
      |         ELSE list_sum([(strpos('0123456789abcdef', substr(h, 8*i + 1, 1))-1)*16
      |                      + (strpos('0123456789abcdef', substr(h, 8*i + 2, 1))-1)
      |                        for i in range(0, (n + 3) // 4)]) END AS s
      |  FROM b
      |)
      |SELECT doc_id AS media_id, CAST(m AS INTEGER) AS n_bytes,
      |  CASE WHEN m = 0 THEN 0.0 ELSE CAST(s AS DOUBLE) / m END AS mean_byte
      |FROM d ORDER BY media_id""".stripMargin

  /** The frame-sample verb: one row per stub frame with its length and
    * byte-mean. DuckDB reproduces the contiguous-slice frames from the
    * hex (frame f of `frames = 1 + n % 4` covers bytes [f·⌊n/frames⌋,
    * next start), last frame takes the remainder). */
  private def xmFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).flatMap { r =>
      StubCodec.frameSample(r).zipWithIndex.map { case (fb, idx) =>
        var s = 0L; var i = 0
        while (i < fb.length) { s += fb(i) & 0xff; i += 1 }
        (r.media_id, idx, fb.length,
          if (fb.isEmpty) 0.0 else s.toDouble / fb.length)
      }
    }.toDF("media_id", "frame_idx", "n_bytes", "mean_byte")
      .orderBy($"media_id", $"frame_idx")
  }

  private val xmFramesSql =
    """WITH b AS (
      |  SELECT doc_id, lower(hex(encode(text))) AS h,
      |    octet_length(encode(text)) AS n
      |  FROM documents
      |), f AS (
      |  SELECT doc_id, h, n, 1 + n % 4 AS frames, n // (1 + n % 4) AS base,
      |    unnest(range(0, 1 + n % 4)) AS fi
      |  FROM b
      |), d AS (
      |  SELECT doc_id, fi, base, frames,
      |    fi * base AS s0,
      |    CASE WHEN fi = frames - 1 THEN n ELSE (fi + 1) * base END AS s1
      |  FROM f
      |), m AS (
      |  SELECT doc_id, fi, s1 - s0 AS len,
      |    CASE WHEN s1 = s0 THEN 0
      |         ELSE list_sum([(strpos('0123456789abcdef', substr(b.h, 2*i + 1, 1))-1)*16
      |                      + (strpos('0123456789abcdef', substr(b.h, 2*i + 2, 1))-1)
      |                        for i in range(s0, s1)]) END AS s
      |  FROM d JOIN b USING (doc_id)
      |)
      |SELECT doc_id AS media_id, CAST(fi AS INTEGER) AS frame_idx,
      |  CAST(len AS INTEGER) AS n_bytes,
      |  CASE WHEN len = 0 THEN 0.0 ELSE CAST(s AS DOUBLE) / len END AS mean_byte
      |FROM m ORDER BY media_id, frame_idx""".stripMargin

  /** Cross-modal retrieval (the retrieval-for-captioning shape every
    * multimodal training pipeline runs): decode each media row's
    * features through the mapPartitions codec path, then find each
    * probe's top-3 cosine neighbors among SAME-fmt media on the 5-dim
    * decoded feature vector [n_bytes, width, height, mean_byte,
    * n_frames].
    *
    * Plan shape: the probe set is small and broadcast, the corpus never
    * shuffles — a broadcast hash join keyed on fmt plus a per-probe
    * window top-k, exactly [[Similarity.cosineTopK]]'s posture. A
    * full-corpus all-pairs variant would ride [[Dedup]]'s block-grid
    * join or [[Similarity]]'s IVF lists (per-fmt) instead; the
    * probe-driven form is the common serving/backfill query. Every
    * arithmetic step (byte-derived ints, one IEEE division, ordered
    * dot product) is reproduced bit-exactly by the oracle's hex-pair
    * decode, so the sim doubles hash-match. */
  private def xmNeighbors(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val feats = extractFeatures(mediaTable(spark, dir)).toDF()
      .select($"media_id", $"fmt",
        array($"n_bytes".cast(DoubleType), $"width".cast(DoubleType),
          $"height".cast(DoubleType), $"mean_byte",
          $"n_frames".cast(DoubleType)).as("fv"))
      .withColumn("nrm",
        sqrt(aggregate($"fv", lit(0.0), (a, x) => a + x * x)))
    val probes = feats.filter($"media_id" < 50)
      .select($"media_id".as("probe_id"), $"fmt".as("p_fmt"),
        $"fv".as("pv"), $"nrm".as("pn"))
    val corpus = feats
      .select($"media_id".as("neighbor_id"), $"fmt".as("n_fmt"),
        $"fv".as("nv"), $"nrm".as("nn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"probe_id").orderBy($"sim".desc, $"neighbor_id")
    corpus.join(broadcast(probes),
        $"n_fmt" === $"p_fmt" && $"neighbor_id" =!= $"probe_id")
      .withColumn("sim",
        Similarity.dot($"pv", $"nv") / ($"pn" * $"nn"))
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 3)
      .select($"probe_id", $"p_fmt".as("fmt"), $"rnk", $"neighbor_id", $"sim")
      .orderBy($"probe_id", $"rnk")
  }

  private val xmNeighborsSql =
    """WITH b AS (
      |  SELECT doc_id, source,
      |    lower(hex(encode(text))) AS h,
      |    octet_length(encode(text)) AS n
      |  FROM documents
      |), d AS (
      |  SELECT doc_id, source, n,
      |    CASE WHEN n > 0 THEN (strpos('0123456789abcdef', substr(h,1,1))-1)*16
      |                       + (strpos('0123456789abcdef', substr(h,2,1))-1)
      |         ELSE 0 END AS b0,
      |    CASE WHEN n > 1 THEN (strpos('0123456789abcdef', substr(h,3,1))-1)*16
      |                       + (strpos('0123456789abcdef', substr(h,4,1))-1)
      |         ELSE 0 END AS b1,
      |    CASE WHEN n = 0 THEN 0
      |         ELSE list_sum([(strpos('0123456789abcdef', substr(h, 2*i-1, 1))-1)*16
      |                      + (strpos('0123456789abcdef', substr(h, 2*i,   1))-1)
      |                        for i in range(1, n+1)]) END AS byte_sum
      |  FROM b
      |), f AS (
      |  SELECT doc_id AS media_id, 'fake/' || source AS fmt,
      |    [CAST(n AS DOUBLE), CAST(16 + (b0 % 64) * 16 AS DOUBLE),
      |     CAST(16 + (b1 % 64) * 16 AS DOUBLE),
      |     CASE WHEN n = 0 THEN 0.0 ELSE CAST(byte_sum AS DOUBLE) / n END,
      |     CAST(1 + n % 4 AS DOUBLE)] AS fv
      |  FROM d
      |), j AS (
      |  SELECT p.media_id AS probe_id, p.fmt, c.media_id AS neighbor_id,
      |    list_dot_product(p.fv, c.fv) /
      |      (sqrt(list_dot_product(p.fv, p.fv)) * sqrt(list_dot_product(c.fv, c.fv))) AS sim
      |  FROM f p JOIN f c
      |    ON p.media_id < 50 AND c.fmt = p.fmt AND c.media_id <> p.media_id
      |)
      |SELECT probe_id, fmt, rnk, neighbor_id, sim FROM (
      |  SELECT probe_id, fmt, neighbor_id, sim,
      |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rnk
      |  FROM j) t
      |WHERE rnk <= 3
      |ORDER BY probe_id, rnk""".stripMargin

  /** Media near-dup — the perceptual-hash dedup shape every multimodal
    * training pipeline runs: a QUANTIZED perceptual bucket proposes
    * candidates (here (fmt, decoded width) stands in for the pHash
    * prefix; with a real codec it would be the coarse DCT hash), an
    * exact verify on the full descriptor keeps real near-dups (mean
    * byte within 1.0). Same blocking + verify posture as
    * [[Dedup.fuzzyMatch]]: a keyed equi self-join, quadratic only
    * inside a bucket, bucket size capped by the quantization choice.
    * All arithmetic is byte-derived ints plus one IEEE division, so the
    * oracle's hex-pair decode reproduces the pairs bit-exactly. */
  def mediaNeardup(media: Dataset[MediaRecord], maxMeanDiff: Double = 1.0): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val feats = extractFeatures(media).toDF()
      .select($"media_id", $"fmt", $"width", $"mean_byte")
    val a = feats.select($"fmt", $"width",
      $"media_id".as("media_a"), $"mean_byte".as("mb_a"))
    val b = feats.select($"fmt", $"width",
      $"media_id".as("media_b"), $"mean_byte".as("mb_b"))
    a.join(b, Seq("fmt", "width"))
      .filter($"media_a" < $"media_b" && abs($"mb_a" - $"mb_b") <= maxMeanDiff)
      .select($"fmt", $"width", $"media_a", $"media_b", $"mb_a", $"mb_b")
  }

  private def xmNeardup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaNeardup(mediaTable(spark, dir)).orderBy($"media_a", $"media_b")
  }

  private val xmNeardupSql =
    """WITH b AS (
      |  SELECT doc_id, source,
      |    lower(hex(encode(text))) AS h,
      |    octet_length(encode(text)) AS n
      |  FROM documents
      |), d AS (
      |  SELECT doc_id, source, n,
      |    CASE WHEN n > 0 THEN (strpos('0123456789abcdef', substr(h,1,1))-1)*16
      |                       + (strpos('0123456789abcdef', substr(h,2,1))-1)
      |         ELSE 0 END AS b0,
      |    CASE WHEN n = 0 THEN 0
      |         ELSE list_sum([(strpos('0123456789abcdef', substr(h, 2*i-1, 1))-1)*16
      |                      + (strpos('0123456789abcdef', substr(h, 2*i,   1))-1)
      |                        for i in range(1, n+1)]) END AS byte_sum
      |  FROM b
      |), f AS (
      |  SELECT doc_id AS media_id, 'fake/' || source AS fmt,
      |    CAST(16 + (b0 % 64) * 16 AS INTEGER) AS width,
      |    CASE WHEN n = 0 THEN 0.0 ELSE CAST(byte_sum AS DOUBLE) / n END AS mean_byte
      |  FROM d)
      |SELECT a.fmt, a.width, a.media_id AS media_a, b.media_id AS media_b,
      |  a.mean_byte AS mb_a, b.mean_byte AS mb_b
      |FROM f a JOIN f b
      |  ON a.fmt = b.fmt AND a.width = b.width
      | AND a.media_id < b.media_id
      | AND abs(a.mean_byte - b.mean_byte) <= 1.0
      |ORDER BY media_a, media_b""".stripMargin

  val all: Seq[Declared] = Seq(
    Declared("xm_media_meta", xmMeta, Some(xmMetaSql)),
    Declared("xm_media_neardup", xmNeardup, Some(xmNeardupSql)),
    Declared("xm_media_features", xmFeatures, Some(xmFeaturesSql)),
    Declared("xm_media_resize", xmResize, Some(xmResizeSql)),
    Declared("xm_media_frames", xmFrames, Some(xmFramesSql)),
    Declared("xm_media_neighbors", xmNeighbors, Some(xmNeighborsSql)))
}
