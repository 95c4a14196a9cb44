package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * batch feature extraction, and a decode stage.
  *
  * The container has no image/audio codecs, so the *decode* is a
  * deterministic stub (clearly marked below); everything around it — the
  * (binary, struct metadata) schema, partition-parallel batched processing
  * via typed mapPartitions, the feature-vector hand-off into the existing
  * vector operators — is real and tested. On a cluster the stub body is
  * replaced by the actual codec call; the dataflow does not change.
  *
  * The synthetic binary column is derived from documents.text through
  * hex(sha2) -> unhex, reproducible bit-for-bit in DuckDB, so mm01's
  * byte-level feature extraction is oracle-checked end to end.
  */
object Multimodal {

  /** Synthetic multimodal table: binary payload + typed metadata struct. */
  private def media(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents").select(
      $"doc_id".as("media_id"),
      $"source",
      // payload: 3 sha256 blocks of the text = 96 deterministic bytes
      unhex(concat(sha2($"text", 256), sha2(concat($"text", lit("2")), 256),
        sha2(concat($"text", lit("3")), 256))).as("payload"),
      struct(
        lit("fake/v1").as("format"),
        ($"n_chars" % 640).cast(IntegerType).as("width"),
        ($"n_chars" % 480).cast(IntegerType).as("height")).as("meta"))
  }

  /** mm01: byte-level feature extraction over the binary column (length,
    * content hash, leading magic bytes, sampled "frame" slices) — all
    * engine-portable binary expressions. */
  def mm01BinaryFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // features are derived from the hex view of the bytes because the
    // oracle engine (DuckDB 1.0) has no blob-typed md5/substring
    val hx = lower(hex($"payload"))
    media(s, dir).select(
      $"media_id",
      $"source",
      $"meta.format".as("format"),
      $"meta.width".as("width"),
      $"meta.height".as("height"),
      length($"payload").cast(LongType).as("n_bytes"),
      md5(hx).as("payload_md5"),
      substring(hx, 1, 8).as("magic"),
      // "frame sampling": fixed-stride slices off the payload
      substring(hx, 65, 16).as("frame_1"),
      substring(hx, 129, 16).as("frame_2"))
      .orderBy($"media_id")
  }

  final case class MediaRow(media_id: Long, source: String, payload: Array[Byte])
  final case class DecodedRow(media_id: Long, source: String, feature: Array[Float])

  /** The decode stub: a real codec (JPEG decode, resample, embed) would go
    * here; this deterministic fake folds payload bytes into a fixed-dim
    * float vector so the downstream dataflow is exercised honestly. */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    val dim = 16
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** mm02: the decode stage — typed mapPartitions over binary rows (the
    * batch shape a vectorized decoder needs: one partition = one batch,
    * codecs initialized once per partition), then a per-source aggregate
    * over the decoded feature vectors.
    *
    * Oracle-checked even though the decode runs in JVM code: the stub's
    * float fold is IEEE-deterministic and DuckDB's REAL arithmetic
    * reproduces it bit-for-bit (verified), so the oracle re-derives the
    * 16 feature dims with nested REAL casts, the norm with the same
    * left-fold dot product, and the per-source sum through the exact
    * DECIMAL(18,6) discipline. A real codec would drop mm02 back to a
    * rows-only check (its output is not SQL-reproducible). */
  def mm02DecodeFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows: Dataset[MediaRow] = media(s, dir)
      .select($"media_id", $"source", $"payload").as[MediaRow]
    val decoded: Dataset[DecodedRow] = rows.mapPartitions { it =>
      // per-partition init of the (stubbed) codec happens here
      it.map(r => DecodedRow(r.media_id, r.source, decodeStub(r.payload)))
    }
    val featNorm = sqrt(graft.functions.VectorFunctions.dotF64(
      transform($"feature", x => x.cast(DoubleType)),
      transform($"feature", x => x.cast(DoubleType))))
    decoded.toDF()
      .select($"media_id", $"source", featNorm.as("feature_norm"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_media"),
        sum($"feature_norm".cast(DecimalType(18, 6))).cast(DoubleType)
          .as("total_norm"),
        max($"feature_norm").as("max_norm"))
      .orderBy($"source")
  }

  /** DuckDB re-derivation of [[mm02DecodeFeatures]] including the decode
    * stub: byte i of the payload is hex pair (2i+1, 2); feature dim j folds
    * bytes j, j+16, ..., j+80 as REAL acc = acc + byte/255 (nested casts =
    * JVM float semantics); the norm is sqrt of the left-fold dot product in
    * DOUBLE — all bit-identical to the Spark side. */
  private def mm02Sql: String = {
    val bytesPerPayload = 96 // 3 sha256 blocks
    val dim = 16
    def byteAt(i: Int) = s"CAST(concat('0x', substring(hx, ${2 * i + 1}, 2)) AS INTEGER)"
    def feat(j: Int) =
      (0 until bytesPerPayload / dim).foldLeft("CAST(0 AS REAL)") { (acc, k) =>
        s"CAST($acc + CAST(${byteAt(j + dim * k)} AS REAL)/CAST(255 AS REAL) AS REAL)"
      }
    val dims = (0 until dim).map(j => s"CAST(${feat(j)} AS DOUBLE)")
    val dot = dims.map(d => s"($d)*($d)").mkString(" + ")
    s"""WITH m AS (
       |  SELECT doc_id AS media_id, source,
       |   sha256(text) || sha256(text || '2') || sha256(text || '3') AS hx
       |  FROM documents),
       |n AS (SELECT media_id, source, sqrt($dot) AS feature_norm FROM m)
       |SELECT source, count(*) AS n_media,
       |  CAST(SUM(CAST(feature_norm AS DECIMAL(18,6))) AS DOUBLE) AS total_norm,
       |  max(feature_norm) AS max_norm
       |FROM n GROUP BY source ORDER BY source""".stripMargin
  }

  /** mm03: FRAME SAMPLING — the video-shaped access pattern: treat each
    * payload as 6 fixed-width frames (16 bytes each), sample every other
    * frame (stride 2 — the "1 fps of a 30 fps clip" decision made BEFORE
    * any decode so the codec only ever touches sampled frames), explode to
    * one row per (media, frame), and extract per-frame features. The
    * explode/slice plumbing, the per-frame row shape a frame embedder
    * consumes, and the exact byte arithmetic are all real; a production
    * pipeline swaps the byte-fold features for the codec call, same rows.
    * Frame features stay engine-exact: integer byte sums, one final
    * division pair for brightness. */
  def mm03FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hx = lower(hex($"payload"))
    val frames = media(s, dir)
      .select($"media_id", $"source", hx.as("hx"))
      // sampled frame ids 0, 2, 4 of the 6-frame payload
      .select($"media_id", $"source", $"hx",
        explode(sequence(lit(0L), lit(4L), lit(2L))).as("frame_idx"))
      .select($"media_id", $"source", $"frame_idx",
        $"hx".substr($"frame_idx" * 32 + 1, lit(32)).as("frame_hex"))
    val byteAt = (k: Column) =>
      conv($"frame_hex".substr(k * 2 + 1, lit(2)), 16, 10).cast(LongType)
    frames.select(
      $"media_id", $"source", $"frame_idx",
      md5($"frame_hex").as("frame_md5"),
      aggregate(sequence(lit(0L), lit(15L)), lit(0L),
        (acc, k) => acc + byteAt(k)).as("frame_sum"))
      .withColumn("brightness",
        ($"frame_sum".cast(DoubleType) / 255.0) / 16.0)
      .orderBy($"media_id", $"frame_idx")
  }

  /** mm04: FRAME-LEVEL MEDIA DEDUP — the video near-dup shape: hash each
    * medium's first six fixed-width CONTENT frames (10-token segments of
    * the transcript — content-derived, so a trim/re-encode keeps most of
    * them, where byte-level frames would all change), invert to a
    * frame-hash index, and report media sharing >= 2 frames. The
    * corpus's near-duplicate documents share most segments, so the gate
    * finds real pairs (24 at sf0.01) through the frame-index join —
    * never an all-pairs scan. Thin binding of
    * [[graft.api.Graft.frameNearDupPairs]] (boilerplate-frame df cap
    * included, mirrored by the oracle). */
  def mm04FrameDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = split(trim($"text"), "\\s+")
    val frames = Tables.load(s, dir, "documents")
      .select($"doc_id".as("media_id"), toks.as("t"))
      .select($"media_id", explode(sequence(lit(0), lit(5))).as("i"), $"t")
      .where(size($"t") >= $"i" * 10 + 10)
      .select($"media_id",
        md5(array_join(slice($"t", $"i" * 10 + 1, lit(10)), " "))
          .as("frame_md5"))
    graft.api.Graft.frameNearDupPairs(frames, $"media_id", $"frame_md5",
        minShared = 2, maxFrameDf = 100)
      .withColumnRenamed("id_a", "media_a").withColumnRenamed("id_b", "media_b")
      .orderBy($"media_a", $"media_b")
  }

  /** mm05: PERCEPTUAL-HASH media near-dup — the pHash/PDQ dedup shape:
    * a 60-bit dHash per medium (gradient-sign bits over adjacent
    * "pixel" intensities), banded 4x15 bits, pairs sharing any band
    * verified by exact popcount hamming <= 6. The deterministic decode
    * stand-in reads intensity k as the LENGTH of word k of the
    * transcript — content-smooth like real pixels, unlike a crypto
    * hash, so edits perturb the hash proportionally to what they touch
    * instead of avalanching it. Media with fewer than 61 words cannot
    * fill the hash (the 60 gradient bits read intensity cells 0..60 =
    * words 1..61; a shorter transcript's zero-padded tail would collapse
    * into one hot band bucket — the degenerate-input rule in
    * [[graft.api.Graft.hammingNearDupPairs]]'s doc) and are excluded,
    * exactly as an image pipeline drops undecodable thumbnails. */
  def mm05PerceptualDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = split(trim($"text"), "\\s+")
    // the content window is the FIRST 61 words (a fixed crop, not a
    // resize): an append-style near-dup — the corpus's planted
    // perturbation, and the trailing-junk/ads case in real crawls —
    // keeps the window identical (hamming 0), while an edit INSIDE the
    // window flips only the two gradient bits that touch the edited
    // word (MultimodalSpec pins the grading: one interior word change
    // -> hamming 2). A length-normalized "resize" sampling was measured
    // and rejected: a ±1-word length change shifts ~half the sampled
    // positions and destroys the hash — the crop is what is robust to
    // this corpus's perturbation family.
    def cell(i: Int): Column =
      coalesce(length(element_at(col("__w"), i + 1)), lit(0))
    val hash = (0 until 60).map { k =>
      when(cell(k) < cell(k + 1), lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)
    val hashed = Tables.load(s, dir, "documents")
      .select($"doc_id".as("media_id"), toks.as("__w"))
      .where(size($"__w") >= 61)
      .select($"media_id", hash.as("phash"))
    graft.api.Graft.hammingNearDupPairs(hashed, $"media_id", $"phash",
        bands = 4, bitsPerBand = 15, maxHamming = 6)
      .withColumnRenamed("id_a", "media_a")
      .withColumnRenamed("id_b", "media_b")
      .orderBy($"media_a", $"media_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm01_binary_features" -> mm01BinaryFeatures,
    "mm02_decode_features" -> mm02DecodeFeatures,
    "mm03_frame_sample" -> mm03FrameSample,
    "mm04_frame_dedup" -> mm04FrameDedup,
    "mm05_perceptual_dedup" -> mm05PerceptualDedup)

  val oracles: Map[String, String] = Map(
    "mm01_binary_features" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, source,
        |   sha256(text) || sha256(text || '2') || sha256(text || '3') AS hx,
        |   n_chars % 640 AS width, n_chars % 480 AS height
        |  FROM documents)
        |SELECT media_id, source,
        | 'fake/v1' AS format,
        | CAST(width AS INTEGER) AS width,
        | CAST(height AS INTEGER) AS height,
        | octet_length(from_hex(hx)) AS n_bytes,
        | md5(hx) AS payload_md5,
        | substring(hx, 1, 8) AS magic,
        | substring(hx, 65, 16) AS frame_1,
        | substring(hx, 129, 16) AS frame_2
        |FROM m ORDER BY media_id""".stripMargin,
    "mm02_decode_features" -> mm02Sql,
    "mm05_perceptual_dedup" ->
      """WITH w AS (
        |  SELECT doc_id AS media_id,
        |   regexp_split_to_array(trim(text), '\s+') AS ws
        |  FROM documents),
        |cells AS (
        |  SELECT media_id,
        |   list_transform(range(0, 61), i ->
        |     coalesce(length(ws[CAST(i AS INTEGER) + 1]), 0)) AS c
        |  FROM w WHERE len(ws) >= 61),
        |hashes AS (
        |  SELECT media_id,
        |   CAST(sum(CASE WHEN c[CAST(k AS INTEGER) + 1] < c[CAST(k AS INTEGER) + 2]
        |            THEN (CAST(1 AS BIGINT) << CAST(k AS INTEGER))
        |            ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS h
        |  FROM cells, range(60) t(k) GROUP BY media_id),
        |banded AS (
        |  SELECT media_id, h, CAST(i AS INTEGER) AS b,
        |   (h >> (15 * CAST(i AS INTEGER))) & 32767 AS key
        |  FROM hashes, range(4) t(i)),
        |cand AS (
        |  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
        |   a.h AS ha, b.h AS hb
        |  FROM banded a JOIN banded b
        |    ON a.b = b.b AND a.key = b.key AND a.media_id < b.media_id)
        |SELECT media_a, media_b,
        | CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 6
        |ORDER BY media_a, media_b""".stripMargin,
    "mm04_frame_dedup" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id,
        |   regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |f AS (
        |  SELECT DISTINCT media_id,
        |   md5(array_to_string(list_slice(t, i*10+1, i*10+10), ' ')) AS fh
        |  FROM d, (SELECT unnest([0, 1, 2, 3, 4, 5]) AS i)
        |  WHERE len(t) >= i*10+10),
        |keep AS (
        |  SELECT fh FROM f GROUP BY fh
        |  HAVING count(DISTINCT media_id) BETWEEN 2 AND 100),
        |k AS (SELECT media_id, fh FROM f JOIN keep USING (fh))
        |SELECT a.media_id AS media_a, b.media_id AS media_b,
        | count(*) AS n_shared_frames
        |FROM k a JOIN k b ON a.fh = b.fh AND a.media_id < b.media_id
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY media_a, media_b""".stripMargin,
    "mm03_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, source,
        |   sha256(text) || sha256(text || '2') || sha256(text || '3') AS hx
        |  FROM documents),
        |f AS (
        |  SELECT media_id, source, frame_idx,
        |   substring(hx, CAST(frame_idx * 32 + 1 AS INTEGER), 32) AS frame_hex
        |  FROM m, (SELECT unnest([0, 2, 4]) AS frame_idx)),
        |s AS (
        |  SELECT media_id, source, CAST(frame_idx AS BIGINT) AS frame_idx,
        |   md5(frame_hex) AS frame_md5,
        |   CAST(list_sum(list_transform(range(0, 16), k ->
        |     CAST(concat('0x', substring(frame_hex, CAST(k * 2 + 1 AS INTEGER), 2))
        |       AS BIGINT))) AS BIGINT) AS frame_sum
        |  FROM f)
        |SELECT media_id, source, frame_idx, frame_md5, frame_sum,
        | (CAST(frame_sum AS DOUBLE) / CAST(255.0 AS DOUBLE))
        |   / CAST(16.0 AS DOUBLE) AS brightness
        |FROM s ORDER BY media_id, frame_idx""".stripMargin)
}
