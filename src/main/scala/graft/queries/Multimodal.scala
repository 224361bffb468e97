package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

import QueryHelpers._

/** Multimodal-column plumbing: image/audio/video travel as opaque binary
  * columns with typed metadata. The decode step is STUBBED (no codec
  * libraries in this container) with a deterministic fake derived from the
  * bytes; everything around it — binary schema, typed Dataset encoders,
  * mapPartitions batch shape, partition-parallel execution — is the real
  * pipeline a decode/resize/frame-sample stage would use at 100 TB.
  */
object Multimodal {

  /** Binary column metadata ops: byte length, sha-256 content digest,
    * base64 transport encoding — pure expressions over a binary column. */
  private val m01: Q = (s, dir) => {
    val d = t(s, dir, "documents").filter(col("doc_id") <= 100)
    val bin = col("text").cast("binary")
    d.select(
        col("doc_id"),
        length(bin).as("n_bytes"),
        sha2(bin, 256).as("sha256_hex"),
        base64(substring(col("text"), 1, 12).cast("binary")).as("head_b64"))
      .psort(col("doc_id"))
  }

  private val m01Sql =
    """SELECT doc_id,
      | OCTET_LENGTH(ENCODE(text)) AS n_bytes,
      | SHA256(text) AS sha256_hex,
      | BASE64(ENCODE(SUBSTR(text, 1, 12))) AS head_b64
      |FROM documents WHERE doc_id <= 100 ORDER BY doc_id""".stripMargin

  /** Record carrying an opaque media payload. */
  case class MediaRecord(doc_id: Long, data: Array[Byte])

  /** Decoded metadata a real image decoder would emit. */
  case class DecodedMedia(doc_id: Long, n_bytes: Int, width: Int,
                          height: Int, mean_byte: Double)

  /** STUB decode: a real implementation would parse the image container
    * here (JPEG/PNG headers, libjpeg etc. — not in this container). The
    * fake derives dimensions deterministically from the byte content so the
    * oracle can validate the plumbing end-to-end.
    */
  def decodeStub(r: MediaRecord): DecodedMedia = {
    val n = r.data.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += (r.data(i) & 0xff); i += 1 }
    DecodedMedia(r.doc_id, n,
      width = 16 + (sum % 624).toInt,
      height = 16 + ((sum * 31) % 464).toInt,
      mean_byte = sum.toDouble / n.toDouble)
  }

  /** Typed mapPartitions decode stage: binary in, typed metadata out — the
    * batch-shape equivalent of a pandas-UDF mapInPandas decode stage. Runs
    * partition-parallel with no shuffle. */
  private val m02: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaRecord] = Encoders.product[MediaRecord]
    implicit val encOut: Encoder[DecodedMedia] = Encoders.product[DecodedMedia]
    val ds = t(s, dir, "documents").filter(col("doc_id") <= 100)
      .select(col("doc_id"), col("text").cast("binary").as("data"))
      .as[MediaRecord]
    ds.mapPartitions(_.map(decodeStub)).toDF()
      .psort(col("doc_id"))
  }

  // text is ASCII, so per-char UNICODE() equals the utf-8 byte value.
  private val m02Sql =
    """SELECT doc_id,
      | OCTET_LENGTH(ENCODE(text)) AS n_bytes,
      | CAST(16 + LIST_SUM([UNICODE(c) FOR c IN SPLIT(text, '')]) % 624 AS INTEGER) AS width,
      | CAST(16 + (LIST_SUM([UNICODE(c) FOR c IN SPLIT(text, '')]) * 31) % 464 AS INTEGER) AS height,
      | LIST_SUM([UNICODE(c) FOR c IN SPLIT(text, '')])::DOUBLE / OCTET_LENGTH(ENCODE(text))::DOUBLE AS mean_byte
      |FROM documents WHERE doc_id <= 100 ORDER BY doc_id""".stripMargin

  /** Frame sampling: treat the payload as an opaque media container and
    * sample a fixed-size "frame" every `stride` bytes (the video
    * frame-extraction shape: per-row explode into frame rows, map-only,
    * one output row per sampled frame with its offset + content digest). */
  private val m03: Q = (s, dir) => {
    val stride = 1024
    val frameLen = 256
    val d = t(s, dir, "documents").filter(col("doc_id") <= 50)
    d.select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, int((length(text) - 1) / $stride)), " +
            s"i -> substr(text, i * $stride + 1, $frameLen))")).as(Seq("frame_no", "frame")))
      .select(col("doc_id"), col("frame_no"),
        length(col("frame")).as("frame_bytes"),
        md5(col("frame")).as("frame_digest"))
      .psort(col("doc_id"), col("frame_no"))
  }

  private val m03Sql =
    """WITH f AS (
      |  SELECT doc_id, text,
      |    UNNEST(RANGE(0, ((LENGTH(text) - 1) // 1024) + 1)) AS i
      |  FROM documents WHERE doc_id <= 50)
      |SELECT doc_id, i AS frame_no,
      | LENGTH(SUBSTR(text, i * 1024 + 1, 256)) AS frame_bytes,
      | MD5(SUBSTR(text, i * 1024 + 1, 256)) AS frame_digest
      |FROM f ORDER BY doc_id, frame_no""".stripMargin

  /** Resized image metadata (stub decode upstream). */
  case class ResizedMedia(doc_id: Long, in_w: Int, in_h: Int,
                          out_w: Int, out_h: Int)

  /** STUB resize: a real stage would rescale pixel buffers; the geometry —
    * fit the longer edge to 64px preserving aspect ratio, integer floor,
    * minimum 1px — is the real contract a thumbnailing pipeline enforces. */
  def resizeStub(d: DecodedMedia): ResizedMedia = {
    val target = 64L
    val (ow, oh) =
      if (d.width >= d.height)
        (target, math.max(1L, d.height.toLong * target / d.width))
      else (math.max(1L, d.width.toLong * target / d.height), target)
    ResizedMedia(d.doc_id, d.width, d.height, ow.toInt, oh.toInt)
  }

  /** Two-stage typed pipeline: decode (stub) -> resize (stub), both as
    * mapPartitions stages over the opaque binary column — the multi-stage
    * shape (decode -> transform -> feature) of a real multimodal pipeline,
    * fused by Spark into one shuffle-free pass. */
  private val m04: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaRecord] = Encoders.product[MediaRecord]
    implicit val encMid: Encoder[DecodedMedia] = Encoders.product[DecodedMedia]
    implicit val encOut: Encoder[ResizedMedia] = Encoders.product[ResizedMedia]
    t(s, dir, "documents").filter(col("doc_id") <= 100)
      .select(col("doc_id"), col("text").cast("binary").as("data"))
      .as[MediaRecord]
      .mapPartitions(_.map(decodeStub))
      .mapPartitions(_.map(resizeStub))
      .toDF()
      .psort(col("doc_id"))
  }

  // integer geometry replayed over m02's stub dimensions
  private val m04Sql =
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST(16 + LIST_SUM([UNICODE(c) FOR c IN SPLIT(text, '')]) % 624 AS BIGINT) AS w,
      |    CAST(16 + (LIST_SUM([UNICODE(c) FOR c IN SPLIT(text, '')]) * 31) % 464 AS BIGINT) AS h
      |  FROM documents WHERE doc_id <= 100)
      |SELECT doc_id, CAST(w AS INTEGER) AS in_w, CAST(h AS INTEGER) AS in_h,
      | CAST(CASE WHEN w >= h THEN 64 ELSE GREATEST(1, w * 64 // h) END AS INTEGER) AS out_w,
      | CAST(CASE WHEN w >= h THEN GREATEST(1, h * 64 // w) ELSE 64 END AS INTEGER) AS out_h
      |FROM d ORDER BY doc_id""".stripMargin

  /** Extracted feature vector: 8-bin byte histogram. */
  case class MediaFeatures(doc_id: Long, features: Array[Long])

  /** Feature-extraction stage (the embedding-model stand-in): an 8-bin
    * byte-value histogram per payload, computed in one typed mapPartitions
    * pass over the opaque binary column. The vector shape (fixed-length
    * numeric array per row) is exactly what a real encoder stage emits. */
  def featureStub(r: MediaRecord): MediaFeatures = {
    val h = new Array[Long](8)
    var i = 0
    while (i < r.data.length) {
      h((r.data(i) & 0xff) / 32) += 1L
      i += 1
    }
    MediaFeatures(r.doc_id, h)
  }

  private val m05: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaRecord] = Encoders.product[MediaRecord]
    implicit val encOut: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
    t(s, dir, "documents").filter(col("doc_id") <= 100)
      .select(col("doc_id"), col("text").cast("binary").as("data"))
      .as[MediaRecord]
      .mapPartitions(_.map(featureStub))
      .toDF()
      // the vector leaves the engine as a scalar CSV cell: verification
      // harnesses row-sort/hash cells, and collection cells are unhashable
      .select(col("doc_id"),
        expr("array_join(transform(features, x -> cast(x as string)), ',')")
          .as("features_csv"))
      .psort(col("doc_id"))
  }

  // ASCII text: per-char UNICODE() equals the byte value, bucket = byte/32
  private val m05Sql = {
    val bins = (0 until 8).map { b =>
      s"CAST(LIST_SUM([CASE WHEN UNICODE(c) // 32 = $b THEN 1 ELSE 0 END FOR c IN SPLIT(text, '')]) AS BIGINT)"
    }.mkString(", ")
    s"""SELECT doc_id, ARRAY_TO_STRING([$bins], ',') AS features_csv
       |FROM documents WHERE doc_id <= 100 ORDER BY doc_id""".stripMargin
  }

  /** Payload with its catalog metadata (the media row a lakehouse keeps:
    * opaque bytes + typed attributes). */
  case class SourcedMedia(doc_id: Long, source: String, data: Array[Byte])

  /** Per-payload statistics from the typed decode pass: payload size in
    * bytes plus the code-point sum of the UTF-8-decoded content — decoding
    * first (rather than summing raw byte values) keeps the stage equivalent
    * to the oracle's per-character UNICODE() sum on any input, ASCII or
    * not. */
  case class SourcedBytes(doc_id: Long, source: String, n_bytes: Int,
                          cp_sum: Long)

  def byteStatsStub(r: SourcedMedia): SourcedBytes = {
    val s = new String(r.data, java.nio.charset.StandardCharsets.UTF_8)
    var sum = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      sum += cp
      i += Character.charCount(cp)
    }
    SourcedBytes(r.doc_id, r.source, r.data.length, sum)
  }

  /** Corpus statistics per source: the typed mapPartitions decode stage
    * feeding a relational rollup — the "profile the media corpus by
    * modality/source" report a multimodal pipeline runs before training.
    * All aggregates are exact integers; the mean is a double ratio of two
    * exact integers (identical IEEE division in both engines). */
  private val m06: Q = (s, dir) => {
    implicit val encIn: Encoder[SourcedMedia] = Encoders.product[SourcedMedia]
    implicit val encOut: Encoder[SourcedBytes] = Encoders.product[SourcedBytes]
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("data"))
      .as[SourcedMedia]
      .mapPartitions(_.map(byteStatsStub))
      .toDF()
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("cp_sum")).as("cp_sum"),
        min(col("n_bytes")).as("min_bytes"),
        max(col("n_bytes")).as("max_bytes"))
      .select(col("source"), col("n_docs"), col("total_bytes"),
        col("cp_sum"), col("min_bytes"), col("max_bytes"),
        (col("cp_sum").cast("double") / col("total_bytes").cast("double"))
          .as("mean_cp"))
      .psort(col("source"))
  }

  private val m06Sql =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    OCTET_LENGTH(ENCODE(text)) AS n_bytes,
      |    CAST(LIST_SUM([UNICODE(c) FOR c IN SPLIT(text, '')]) AS BIGINT) AS cp_sum
      |  FROM documents),
      |g AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
      |    CAST(SUM(cp_sum) AS BIGINT) AS cp_sum,
      |    CAST(MIN(n_bytes) AS INTEGER) AS min_bytes,
      |    CAST(MAX(n_bytes) AS INTEGER) AS max_bytes
      |  FROM d GROUP BY source)
      |SELECT source, n_docs, total_bytes, cp_sum, min_bytes, max_bytes,
      |  CAST(cp_sum AS DOUBLE) / CAST(total_bytes AS DOUBLE) AS mean_cp
      |FROM g ORDER BY source""".stripMargin

  val queries: Map[String, Q] = Map(
    "m01_binary_meta" -> m01,
    "m02_decode_stub" -> m02,
    "m03_frame_sample" -> m03,
    "m04_resize_stub" -> m04,
    "m05_feature_stub" -> m05,
    "m06_source_profile" -> m06)

  val oracleSql: Map[String, String] = Map(
    "m01_binary_meta" -> m01Sql,
    "m02_decode_stub" -> m02Sql,
    "m03_frame_sample" -> m03Sql,
    "m04_resize_stub" -> m04Sql,
    "m05_feature_stub" -> m05Sql,
    "m06_source_profile" -> m06Sql)
}
