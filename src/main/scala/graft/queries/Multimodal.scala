package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

import QueryHelpers._

/** Multimodal-column plumbing: image/audio/video travel as opaque binary
  * columns with typed metadata. The decode stage is REAL: a fixture table of
  * genuine BMP and PNG payloads (media.ImageCodecs — pure-JVM container
  * codecs, zlib IDAT, all five PNG filters) is materialized as parquet and
  * scanned back as a binary column, and m02/m04/m05 parse the actual
  * containers. Pixel content is deterministic (`(i*7 + doc_id) % 251` at
  * row-major RGB byte index i), so the DuckDB oracle can replay the expected
  * dimensions / means / histograms in closed form — any mis-parse of a
  * header field, row stride, bottom-up order, BGR swap or PNG filter
  * reconstruction diverges from the oracle. Everything around the decode —
  * binary schema, typed Dataset encoders, mapPartitions batch shape,
  * partition-parallel shuffle-free execution — is the pipeline shape a
  * decode/resize/feature stage runs at 100 TB.
  */
object Multimodal {
  import graft.media.{AudioCodecs, ImageCodecs}

  /** Fixture geometry/content contract, shared verbatim with the oracles:
    * width 8..63, height 8..47, pixel byte i = (i*7 + doc_id) % 251; even
    * doc_id encodes as BMP, odd as PNG. */
  private def fixtureDims(docId: Long): (Int, Int) =
    (8 + (docId % 56).toInt, 8 + ((docId * 7) % 40).toInt)

  private def fixturePixels(docId: Long, n: Int): Array[Byte] = {
    val px = new Array[Byte](n)
    var i = 0
    while (i < n) { px(i) = ((i.toLong * 7 + docId) % 251).toByte; i += 1 }
    px
  }

  private def fixturePayload(docId: Long): Array[Byte] = {
    val (w, h) = fixtureDims(docId)
    val px = fixturePixels(docId, w * h * 3)
    if (docId % 2 == 0) ImageCodecs.encodeBmp(w, h, px)
    else ImageCodecs.encodePng(w, h, px)
  }

  /** One media payload row as stored in the fixture table. */
  case class MediaPayload(doc_id: Long, data: Array[Byte])

  /** Fixture temp dir with registered exit-time cleanup — an untracked
    * per-JVM-run parquet copy accumulates on disk across runs. */
  private def fixtureTempDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    graft.streaming.StreamingOps.trackTempDir(p)
    p.toString
  }

  // Memoized per testdata dir: the fixture is encoded once (map-only, on
  // executors), written as parquet, and every media query scans it back as
  // a binary column — the lakehouse shape for opaque media payloads.
  private val fixtures = scala.collection.concurrent.TrieMap[String, String]()

  private def mediaTable(s: org.apache.spark.sql.SparkSession,
                         dir: String): org.apache.spark.sql.DataFrame = {
    val path = fixtures.getOrElseUpdate(dir, {
      implicit val enc: Encoder[MediaPayload] = Encoders.product[MediaPayload]
      implicit val encL: Encoder[Long] = Encoders.scalaLong
      val out = fixtureTempDir("graft_media_fixture")
      t(s, dir, "documents").filter(col("doc_id") <= 100)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => MediaPayload(id, fixturePayload(id))))
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

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

  /** Decoded metadata the image decoder emits: detected container, parsed
    * header dimensions, decoded pixel-byte count and mean. */
  case class DecodedImage(doc_id: Long, format: String, width: Int,
                          height: Int, n_px: Int, mean_px: Double)

  private def decodeOne(r: MediaPayload): DecodedImage = {
    val fmt = if (r.data.length >= 2 && r.data(0) == 'B' && r.data(1) == 'M')
      "bmp" else "png"
    val img = ImageCodecs.decode(r.data)
    val n = img.rgb.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += (img.rgb(i) & 0xff); i += 1 }
    DecodedImage(r.doc_id, fmt, img.width, img.height, n,
      sum.toDouble / n.toDouble)
  }

  /** Typed mapPartitions decode stage over real containers: binary in,
    * parsed header fields + pixel statistics out — the batch-shape
    * equivalent of a pandas-UDF mapInPandas decode stage. Runs
    * partition-parallel with no shuffle; the oracle replays the pixel
    * contract in closed form, so header/stride/filter mis-parses diverge. */
  private val m02: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[DecodedImage] = Encoders.product[DecodedImage]
    mediaTable(s, dir).as[MediaPayload]
      .mapPartitions(_.map(decodeOne)).toDF()
      .psort(col("doc_id"))
  }

  // expected values replayed from the fixture contract (see fixtureDims /
  // fixturePixels): the engine side parsed them out of real containers
  private val m02Sql =
    """WITH g AS (
      |  SELECT doc_id, 8 + doc_id % 56 AS w, 8 + (doc_id * 7) % 40 AS h
      |  FROM documents WHERE doc_id <= 100)
      |SELECT doc_id,
      | CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS format,
      | CAST(w AS INTEGER) AS width,
      | CAST(h AS INTEGER) AS height,
      | CAST(w * h * 3 AS INTEGER) AS n_px,
      | CAST(LIST_SUM([(i * 7 + doc_id) % 251 FOR i IN RANGE(w * h * 3)]) AS DOUBLE)
      |   / CAST(w * h * 3 AS DOUBLE) AS mean_px
      |FROM g ORDER BY doc_id""".stripMargin

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

  /** Resized image: input/output geometry plus the resampled pixel mean —
    * the mean is over actually-resampled bytes, so it pins the decoder's
    * row order and channel order, not just the header fields. */
  case class ResizedImage(doc_id: Long, in_w: Int, in_h: Int,
                          out_w: Int, out_h: Int, mean_out: Double)

  /** Thumbnail geometry: fit the longer edge to 64px preserving aspect
    * ratio, integer floor, minimum 1px. */
  private def thumbDims(w: Int, h: Int): (Int, Int) = {
    val target = 64L
    if (w >= h) (target.toInt, math.max(1L, h.toLong * target / w).toInt)
    else (math.max(1L, w.toLong * target / h).toInt, target.toInt)
  }

  private def resizeOne(r: MediaPayload): ResizedImage = {
    val img = ImageCodecs.decode(r.data)
    val (ow, oh) = thumbDims(img.width, img.height)
    val out = ImageCodecs.resizeNearest(img, ow, oh)
    var sum = 0L
    var i = 0
    while (i < out.rgb.length) { sum += (out.rgb(i) & 0xff); i += 1 }
    ResizedImage(r.doc_id, img.width, img.height, ow, oh,
      sum.toDouble / out.rgb.length.toDouble)
  }

  /** Two-stage typed pipeline: real container decode -> real
    * nearest-neighbor resample, as mapPartitions stages over the binary
    * column — the multi-stage shape (decode -> transform) of a multimodal
    * pipeline, fused by Spark into one shuffle-free pass. */
  private val m04: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[ResizedImage] = Encoders.product[ResizedImage]
    mediaTable(s, dir).as[MediaPayload]
      .mapPartitions(_.map(resizeOne)).toDF()
      .psort(col("doc_id"))
  }

  // geometry + the nearest-neighbor source-index mapping replayed in closed
  // form: out byte k maps to source pixel (sy, sx, channel) with
  // sy = (k // (ow*3)) * h // oh, sx = ((k % (ow*3)) // 3) * w // ow
  private val m04Sql =
    """WITH g AS (
      |  SELECT doc_id, 8 + doc_id % 56 AS w, 8 + (doc_id * 7) % 40 AS h
      |  FROM documents WHERE doc_id <= 100),
      |d AS (
      |  SELECT doc_id, w, h,
      |    CASE WHEN w >= h THEN 64 ELSE GREATEST(1, w * 64 // h) END AS ow,
      |    CASE WHEN w >= h THEN GREATEST(1, h * 64 // w) ELSE 64 END AS oh
      |  FROM g)
      |SELECT doc_id,
      | CAST(w AS INTEGER) AS in_w, CAST(h AS INTEGER) AS in_h,
      | CAST(ow AS INTEGER) AS out_w, CAST(oh AS INTEGER) AS out_h,
      | CAST(LIST_SUM([
      |     (((((k // (ow * 3)) * h // oh) * w + ((k % (ow * 3)) // 3) * w // ow) * 3
      |       + k % 3) * 7 + doc_id) % 251
      |     FOR k IN RANGE(ow * oh * 3)]) AS DOUBLE)
      |   / CAST(ow * oh * 3 AS DOUBLE) AS mean_out
      |FROM d ORDER BY doc_id""".stripMargin

  /** Extracted feature vector: 8-bin histogram over decoded pixel bytes. */
  case class MediaFeatures(doc_id: Long, features: Array[Long])

  /** Feature-extraction stage (the embedding-model stand-in): an 8-bin
    * pixel-value histogram per decoded image, computed in one typed
    * mapPartitions pass over the binary column. The vector shape
    * (fixed-length numeric array per row) is exactly what a real encoder
    * stage emits. */
  private def featuresOne(r: MediaPayload): MediaFeatures = {
    val img = ImageCodecs.decode(r.data)
    val h = new Array[Long](8)
    var i = 0
    while (i < img.rgb.length) {
      h((img.rgb(i) & 0xff) / 32) += 1L
      i += 1
    }
    MediaFeatures(r.doc_id, h)
  }

  private val m05: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
    mediaTable(s, dir).as[MediaPayload]
      .mapPartitions(_.map(featuresOne))
      .toDF()
      // the vector leaves the engine as a scalar CSV cell: verification
      // harnesses row-sort/hash cells, and collection cells are unhashable
      .select(col("doc_id"),
        expr("array_join(transform(features, x -> cast(x as string)), ',')")
          .as("features_csv"))
      .psort(col("doc_id"))
  }

  // histogram of the fixture pixel contract, bucket = pixel byte // 32
  private val m05Sql = {
    val bins = (0 until 8).map { b =>
      s"CAST(LIST_SUM([CASE WHEN ((i * 7 + doc_id) % 251) // 32 = $b THEN 1 ELSE 0 END FOR i IN RANGE(w * h * 3)]) AS BIGINT)"
    }.mkString(", ")
    s"""WITH g AS (
       |  SELECT doc_id, 8 + doc_id % 56 AS w, 8 + (doc_id * 7) % 40 AS h
       |  FROM documents WHERE doc_id <= 100)
       |SELECT doc_id, ARRAY_TO_STRING([$bins], ',') AS features_csv
       |FROM g ORDER BY doc_id""".stripMargin
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

  /** Perceptual-hash row: the four 16-bit bands of the 64-bit average-hash
    * (band equality is the d04-style LSH candidate key for near-dup images)
    * plus the set-bit count. */
  case class ImagePHash(doc_id: Long, format: String, band0: Long,
                        band1: Long, band2: Long, band3: Long, n_ones: Long)

  private def phashOne(r: MediaPayload): ImagePHash = {
    val fmt = if (r.data.length >= 2 && r.data(0) == 'B' && r.data(1) == 'M')
      "bmp" else "png"
    val img = ImageCodecs.decode(r.data)
    // 8x8 nearest-neighbor downsample on gray3 = r+g+b (exact ints 0..765)
    val g = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < 8) {
      val yy = y * img.height / 8
      var x = 0
      while (x < 8) {
        val xx = x * img.width / 8
        val base = (yy * img.width + xx) * 3
        val v = (img.rgb(base) & 0xff).toLong + (img.rgb(base + 1) & 0xff) +
          (img.rgb(base + 2) & 0xff)
        g(y * 8 + x) = v
        total += v
        x += 1
      }
      y += 1
    }
    // bit i set iff 64*g(i) >= total — the mean threshold without division
    val bands = new Array[Long](4)
    var ones = 0L
    var i = 0
    while (i < 64) {
      if (64L * g(i) >= total) {
        bands(i / 16) |= 1L << (i % 16)
        ones += 1
      }
      i += 1
    }
    ImagePHash(r.doc_id, fmt, bands(0), bands(1), bands(2), bands(3), ones)
  }

  /** m08: perceptual (average) hash over REAL decoded pixels — the image
    * near-dup primitive: an 8x8 nearest-neighbor gray downsample thresholded
    * at its own mean, emitted as four 16-bit bands whose equality join is
    * the pigeonhole candidate step (hamming ≤ 3 across 4 bands guarantees a
    * shared band — exactly d04's scheme, over images instead of text).
    * Integer-exact end to end, so the oracle replays the hash closed-form
    * from the pixel contract; any decode mis-parse (stride, bottom-up rows,
    * PNG filter reconstruction) flips hash bits and diverges. Map-only. */
  private val m08: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[ImagePHash] = Encoders.product[ImagePHash]
    mediaTable(s, dir).as[MediaPayload]
      .mapPartitions(_.map(phashOne)).toDF()
      .psort(col("doc_id"))
  }

  private val m08Sql =
    """WITH g AS (
      |  SELECT doc_id, 8 + doc_id % 56 AS w, 8 + (doc_id * 7) % 40 AS h
      |  FROM documents WHERE doc_id <= 100),
      |cells AS (
      |  SELECT doc_id, y * 8 + x AS i,
      |    CAST(LIST_SUM([((((y * h) // 8 * w + (x * w) // 8) * 3 + c) * 7 + doc_id) % 251
      |      FOR c IN RANGE(3)]) AS BIGINT) AS v
      |  FROM g, RANGE(8) ry(y), RANGE(8) rx(x)),
      |tot AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS total
      |        FROM cells GROUP BY doc_id),
      |bits AS (
      |  SELECT c.doc_id, c.i,
      |    CASE WHEN 64 * c.v >= t.total THEN 1 ELSE 0 END AS bit
      |  FROM cells c JOIN tot t USING (doc_id))
      |SELECT doc_id,
      | CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS format,
      | CAST(SUM(CASE WHEN i // 16 = 0 THEN bit << (i % 16) ELSE 0 END) AS BIGINT) AS band0,
      | CAST(SUM(CASE WHEN i // 16 = 1 THEN bit << (i % 16) ELSE 0 END) AS BIGINT) AS band1,
      | CAST(SUM(CASE WHEN i // 16 = 2 THEN bit << (i % 16) ELSE 0 END) AS BIGINT) AS band2,
      | CAST(SUM(CASE WHEN i // 16 = 3 THEN bit << (i % 16) ELSE 0 END) AS BIGINT) AS band3,
      | CAST(SUM(bit) AS BIGINT) AS n_ones
      |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Audio fixture contract (mirrors the image one): sample rate
    * 8/12/16 kHz by doc_id%3, 1-2 channels by doc_id%2, 500-749 frames,
    * interleaved sample i = (i*13 + doc_id) % 2001 - 1000. */
  private def audioPayload(docId: Long): Array[Byte] = {
    val rate = 8000 + (docId % 3).toInt * 4000
    val ch = 1 + (docId % 2).toInt
    val nFrames = 500 + (docId % 250).toInt
    val samples = new Array[Short](nFrames * ch)
    var i = 0
    while (i < samples.length) {
      samples(i) = ((i.toLong * 13 + docId) % 2001 - 1000).toShort
      i += 1
    }
    AudioCodecs.encodeWav(rate, ch, samples)
  }

  private val audioFixtures = scala.collection.concurrent.TrieMap[String, String]()

  private def audioTable(s: org.apache.spark.sql.SparkSession,
                         dir: String): org.apache.spark.sql.DataFrame = {
    val path = audioFixtures.getOrElseUpdate(dir, {
      implicit val enc: Encoder[MediaPayload] = Encoders.product[MediaPayload]
      implicit val encL: Encoder[Long] = Encoders.scalaLong
      val out = fixtureTempDir("graft_audio_fixture")
      t(s, dir, "documents").filter(col("doc_id") <= 100)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => MediaPayload(id, audioPayload(id))))
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  /** Decoded audio metadata: format fields parsed from the RIFF header,
    * exact-integer sample statistics from the decoded PCM. */
  case class DecodedAudio(doc_id: Long, sample_rate: Int, channels: Int,
                          n_frames: Int, duration_ms: Long, amp_sum: Long,
                          peak: Int)

  private def decodeAudioOne(r: MediaPayload): DecodedAudio = {
    val a = AudioCodecs.decodeWav(r.data)
    var sum = 0L
    var peak = 0
    var i = 0
    while (i < a.samples.length) {
      val v = a.samples(i).toInt
      sum += v
      if (math.abs(v) > peak) peak = math.abs(v)
      i += 1
    }
    val nFrames = a.samples.length / a.channels
    DecodedAudio(r.doc_id, a.sampleRate, a.channels, nFrames,
      nFrames.toLong * 1000L / a.sampleRate, sum, peak)
  }

  /** m07: real WAV container decode (media.AudioCodecs) over the audio
    * fixture — the audio twin of m02. All emitted statistics are exact
    * integers, replayed closed-form by the oracle, so any RIFF chunk-walk,
    * fmt-field, or PCM little-endian mis-parse diverges. */
  private val m07: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[DecodedAudio] = Encoders.product[DecodedAudio]
    audioTable(s, dir).as[MediaPayload]
      .mapPartitions(_.map(decodeAudioOne)).toDF()
      .psort(col("doc_id"))
  }

  private val m07Sql =
    """WITH g AS (
      |  SELECT doc_id,
      |    8000 + (doc_id % 3) * 4000 AS rate,
      |    1 + doc_id % 2 AS ch,
      |    500 + doc_id % 250 AS nf
      |  FROM documents WHERE doc_id <= 100)
      |SELECT doc_id,
      | CAST(rate AS INTEGER) AS sample_rate,
      | CAST(ch AS INTEGER) AS channels,
      | CAST(nf AS INTEGER) AS n_frames,
      | CAST(nf * 1000 // rate AS BIGINT) AS duration_ms,
      | CAST(LIST_SUM([(i * 13 + doc_id) % 2001 - 1000 FOR i IN RANGE(nf * ch)]) AS BIGINT) AS amp_sum,
      | CAST(LIST_MAX([ABS((i * 13 + doc_id) % 2001 - 1000) FOR i IN RANGE(nf * ch)]) AS INTEGER) AS peak
      |FROM g ORDER BY doc_id""".stripMargin

  /** Framewise audio feature row: fixed 100-frame windows over channel 0 of
    * the decoded PCM — the feature-extract stage of an audio pipeline
    * (VAD/energy gating, silence trimming run on exactly these stats). */
  case class AudioFrameStats(doc_id: Long, n_windows: Long,
                             zero_crossings: Long, energy_total: Long,
                             peak_win_energy: Long)

  private def audioFramesOne(r: MediaPayload): AudioFrameStats = {
    val a = AudioCodecs.decodeWav(r.data)
    val ch = a.channels
    val nf = a.samples.length / ch
    var zc = 0L; var tot = 0L; var peak = 0L; var win = 0L
    var prev = 0
    var j = 0
    while (j < nf) {
      val v = a.samples(j * ch).toInt // channel 0 of the interleaved PCM
      if (j > 0 && prev * v < 0) zc += 1
      val e = v.toLong * v
      tot += e
      win += e
      if (j % 100 == 99 || j == nf - 1) { if (win > peak) peak = win; win = 0L }
      prev = v
      j += 1
    }
    AudioFrameStats(r.doc_id, (nf + 99) / 100, zc, tot, peak)
  }

  /** m09: framewise audio features (zero-crossing count, total and peak
    * 100-frame-window energy) computed from the REAL AudioCodecs PCM decode
    * of the WAV fixture — the feature-extraction stage downstream of m07's
    * container parse. Integer-exact end to end; the oracle replays the
    * fixture's closed-form sample series, so any decode, interleave-stride,
    * or windowing mis-step diverges. Map-only: the shape that fans out to
    * billions of clips with zero shuffle. */
  private val m09: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[AudioFrameStats] = Encoders.product[AudioFrameStats]
    audioTable(s, dir).as[MediaPayload]
      .mapPartitions(_.map(audioFramesOne)).toDF()
      .psort(col("doc_id"))
  }

  private val m09Sql =
    """WITH g AS (
      |  SELECT doc_id, 1 + doc_id % 2 AS ch, 500 + doc_id % 250 AS nf
      |  FROM documents WHERE doc_id <= 100),
      |s AS (
      |  SELECT doc_id, j, (j * ch * 13 + doc_id) % 2001 - 1000 AS v
      |  FROM g, UNNEST(RANGE(nf)) t(j)),
      |zc AS (
      |  SELECT doc_id, COUNT(*) FILTER (WHERE pv * v < 0) AS z
      |  FROM (SELECT doc_id, v,
      |          LAG(v) OVER (PARTITION BY doc_id ORDER BY j) AS pv FROM s)
      |  GROUP BY doc_id),
      |wins AS (SELECT doc_id, j // 100 AS w, SUM(v * v) AS we
      |         FROM s GROUP BY 1, 2),
      |agg AS (SELECT doc_id, COUNT(*) AS nw, SUM(we) AS tot, MAX(we) AS pk
      |        FROM wins GROUP BY doc_id)
      |SELECT a.doc_id, CAST(nw AS BIGINT) AS n_windows,
      | CAST(z AS BIGINT) AS zero_crossings,
      | CAST(tot AS BIGINT) AS energy_total,
      | CAST(pk AS BIGINT) AS peak_win_energy
      |FROM agg a JOIN zc z USING (doc_id) ORDER BY doc_id""".stripMargin

  // ---- m10: video container decode + scene-cut segmentation --------------
  /** Video fixture: a GVID container (media/VideoCodecs — "GVID" magic,
    * u16 frame count, length-prefixed REAL BMP frames) of 4..8 frames per
    * doc. The content plants exactly one scene cut: frames before
    * cut = 1 + doc_id % (n_frames - 1) repeat pixel formula seed
    * doc_id*31, frames at/after it seed doc_id*31 + 999 — two static
    * scenes with a provable boundary. */
  private def videoFixture(docId: Long): Array[Byte] = {
    val w = 8 + (docId % 8).toInt
    val h = 8 + ((docId * 3) % 8).toInt
    val nf = 4 + (docId % 5).toInt
    val cut = 1 + (docId % (nf - 1)).toInt
    val frames = (0 until nf).map { f =>
      val seed = docId * 31 + (if (f >= cut) 999L else 0L)
      val n = w * h * 3
      val px = new Array[Byte](n)
      var i = 0
      while (i < n) { px(i) = ((i.toLong * 7 + seed) % 251).toByte; i += 1 }
      (w, h, px)
    }
    graft.media.VideoCodecs.encodeGvid(frames)
  }

  private val videoFixtures = scala.collection.concurrent.TrieMap[String, String]()
  private def videoTable(s: org.apache.spark.sql.SparkSession,
                         dir: String): org.apache.spark.sql.DataFrame = {
    val path = videoFixtures.getOrElseUpdate(dir, {
      implicit val enc: Encoder[MediaPayload] = Encoders.product[MediaPayload]
      implicit val encL: Encoder[Long] = Encoders.scalaLong
      val out = fixtureTempDir("graft_video_fixture")
      t(s, dir, "documents").filter(col("doc_id") <= 40)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => MediaPayload(id, videoFixture(id))))
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  /** One decoded video frame: positional index and a position-weighted
    * pixel checksum (Σ px[i]·(i+1) — discriminates scenes where a plain
    * mean would not, and replays in closed form in the oracle). */
  case class VideoFrame(doc_id: Long, frame_idx: Int, width: Int,
                        height: Int, checksum: Long)

  /** m10: the video half of the multimodal pipeline — container decode,
    * per-frame REAL BMP decode, and scene segmentation. The typed
    * mapPartitions stage explodes each payload into frame rows (map-only,
    * partition-parallel — the mapInPandas batch shape); the scene cut is
    * then pure DataFrame logic: a frame starts a new scene iff its decoded
    * checksum differs from the previous frame's (LAG over a window
    * PARTITIONED by doc — bounded frames per doc, never global). At 100 TB
    * frame explode multiplies rows by frames-per-video, so the stage runs
    * before any wide column is attached and the shuffle key is doc_id. */
  private val m10: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[VideoFrame] = Encoders.product[VideoFrame]
    val frames = videoTable(s, dir).as[MediaPayload]
      .mapPartitions(_.flatMap { r =>
        graft.media.VideoCodecs.decodeGvid(r.data).frames.zipWithIndex.map {
          case (img, f) =>
            var sum = 0L
            var i = 0
            while (i < img.rgb.length) {
              sum += (img.rgb(i) & 0xff).toLong * (i + 1); i += 1
            }
            VideoFrame(r.doc_id, f, img.width, img.height, sum)
        }
      }).toDF()
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frames
      .withColumn("is_cut",
        (coalesce(lag(col("checksum"), 1).over(w), col("checksum"))
          =!= col("checksum")).cast("long"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("checksum"), col("is_cut"))
      .psort(col("doc_id"), col("frame_idx"))
  }

  // closed-form replay of the fixture contract: checksum(f) =
  // Σ_{i<w·h·3} ((i·7 + seed(f)) % 251) · (i+1), cut at 1 + doc % (nf-1)
  private val m10Sql =
    """WITH g AS (
      |  SELECT doc_id,
      |    8 + doc_id % 8 AS w, 8 + (doc_id * 3) % 8 AS h,
      |    4 + doc_id % 5 AS nf
      |  FROM documents WHERE doc_id <= 40),
      |f AS (
      |  SELECT doc_id, w, h, nf, 1 + doc_id % (nf - 1) AS cut,
      |    UNNEST(RANGE(nf)) AS frame_idx
      |  FROM g),
      |s AS (
      |  SELECT doc_id, w, h, frame_idx,
      |    doc_id * 31 + CASE WHEN frame_idx >= cut THEN 999 ELSE 0 END AS seed,
      |    CASE WHEN frame_idx = cut THEN 1 ELSE 0 END AS is_cut
      |  FROM f)
      |SELECT doc_id, frame_idx, w AS width, h AS height,
      | CAST(LIST_SUM([((i * 7 + seed) % 251) * (i + 1)
      |   FOR i IN RANGE(w * h * 3)]) AS BIGINT) AS checksum,
      | CAST(is_cut AS BIGINT) AS is_cut
      |FROM s ORDER BY doc_id, frame_idx""".stripMargin

  /** Resampled channel-0 audio statistics: 2:1 decimation by paired-sample
    * mean ((s[2j]+s[2j+1]) >> 1 — arithmetic shift floors identically on
    * the JVM and in DuckDB, so the integers match bit-for-bit). */
  case class ResampledAudio(doc_id: Long, n_in: Int, n_out: Int,
                            out_rate: Int, rs_sum: Long, rs_peak: Int,
                            rs_first: Int, rs_last: Int)

  private def resampleOne(r: MediaPayload): ResampledAudio = {
    val a = AudioCodecs.decodeWav(r.data)
    val ch = a.channels
    val nIn = a.samples.length / ch
    val nOut = nIn / 2
    var sum = 0L; var peak = 0; var first = 0; var last = 0
    var j = 0
    while (j < nOut) {
      val s0 = a.samples(2 * j * ch).toInt
      val s1 = a.samples((2 * j + 1) * ch).toInt
      val v = (s0 + s1) >> 1
      if (j == 0) first = v
      last = v
      sum += v
      val av = math.abs(v)
      if (av > peak) peak = av
      j += 1
    }
    ResampledAudio(r.doc_id, nIn, nOut, a.sampleRate / 2, sum, peak, first, last)
  }

  /** m11: audio resampling (2:1 decimation with paired-sample averaging) —
    * the sample-rate normalization stage an audio pipeline runs before
    * feature extraction or model ingest (every corpus mixes 8/16/44.1 kHz
    * sources; the model wants ONE rate). Runs on the REAL AudioCodecs PCM
    * decode of the WAV fixture; output statistics are exact integers and
    * the oracle replays the fixture's closed-form sample series through the
    * identical decimation arithmetic, so any stride, rounding, or channel
    * de-interleave mistake diverges.
    *
    * Scale: map-only typed mapPartitions over the payload scan (the
    * mapInPandas batch shape) — no shuffle, fans out to billions of clips;
    * at 100 TB the only change is reading payloads from object storage. */
  private val m11: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[ResampledAudio] = Encoders.product[ResampledAudio]
    audioTable(s, dir).as[MediaPayload]
      .mapPartitions(_.map(resampleOne)).toDF()
      .psort(col("doc_id"))
  }

  private val m11Sql =
    """WITH g AS (
      |  SELECT doc_id,
      |    8000 + (doc_id % 3) * 4000 AS rate,
      |    1 + doc_id % 2 AS ch,
      |    500 + doc_id % 250 AS nf
      |  FROM documents WHERE doc_id <= 100),
      |r AS (
      |  SELECT doc_id, rate, ch, nf, nf // 2 AS nout,
      |    [(((2*j)*ch*13 + doc_id) % 2001 - 1000
      |      + ((2*j+1)*ch*13 + doc_id) % 2001 - 1000) >> 1
      |     FOR j IN RANGE(nf // 2)] AS outs
      |  FROM g)
      |SELECT doc_id, CAST(nf AS INTEGER) AS n_in, CAST(nout AS INTEGER) AS n_out,
      | CAST(rate // 2 AS INTEGER) AS out_rate,
      | CAST(LIST_SUM(outs) AS BIGINT) AS rs_sum,
      | CAST(LIST_MAX([ABS(v) FOR v IN outs]) AS INTEGER) AS rs_peak,
      | CAST(outs[1] AS INTEGER) AS rs_first,
      | CAST(outs[nout] AS INTEGER) AS rs_last
      |FROM r ORDER BY doc_id""".stripMargin

  // ---- m12: audio fingerprint retrieval (offset-vote alignment) ----------
  /** Degraded query clip: the original fixture clip with its first 25
    * frames (one fingerprint window) cut off, re-encoded as a genuinely
    * NEW WAV container — the "same recording, different file" retrieval
    * case an audio fingerprinter exists for. */
  private def degradedAudioPayload(docId: Long): Array[Byte] = {
    val a = AudioCodecs.decodeWav(audioPayload(docId))
    AudioCodecs.encodeWav(a.sampleRate, a.channels,
      a.samples.drop(25 * a.channels))
  }

  private val degradedAudioFixtures =
    scala.collection.concurrent.TrieMap[String, String]()

  private def degradedAudioTable(s: org.apache.spark.sql.SparkSession,
                                 dir: String): org.apache.spark.sql.DataFrame = {
    val path = degradedAudioFixtures.getOrElseUpdate(dir, {
      implicit val enc: Encoder[MediaPayload] = Encoders.product[MediaPayload]
      implicit val encL: Encoder[Long] = Encoders.scalaLong
      val out = fixtureTempDir("graft_audio_degraded")
      t(s, dir, "documents").filter(col("doc_id") <= 100)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => MediaPayload(id, degradedAudioPayload(id))))
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  /** One fingerprint landmark: a gram of consecutive energy-transition
    * codes at transition position p of the clip's fingerprint sequence. */
  case class AudioGram(doc_id: Long, p: Int, g: Long)

  /** Haitsma-Kalker-style fingerprint: channel-0 PCM is cut into 25-frame
    * windows; each energy transition w-1 -> w becomes a 21-bit code (sign
    * of the delta + its magnitude scaled down by 64 and capped to 20 bits
    * — enough precision to separate the fixture's near-duplicate clips,
    * which differ only by a small DC offset, while still dropping the
    * low-order bits a re-encode would perturb), and a landmark is 3
    * consecutive transition codes packed into a 63-bit gram. Dropping
    * exactly one window only SHIFTS the transition sequence, so the
    * fixture's time-cut degradation aligns every true match at offset -1
    * (the Shazam offset-histogram invariant); a lossier pipeline would
    * coarsen the magnitude field further instead of changing the shape.
    * Integer-exact end to end (energies are Σv² longs). */
  private def fingerprintGrams(r: MediaPayload): Seq[AudioGram] = {
    val a = AudioCodecs.decodeWav(r.data)
    val ch = a.channels
    val nw = a.samples.length / ch / 25
    val en = new Array[Long](nw)
    var w = 0
    while (w < nw) {
      var e = 0L
      var j = 0
      while (j < 25) {
        val v = a.samples((w * 25 + j) * ch).toLong
        e += v * v
        j += 1
      }
      en(w) = e
      w += 1
    }
    val nb = nw - 1
    val code = new Array[Long](nb)
    var i = 0
    while (i < nb) {
      val d = en(i + 1) - en(i)
      val sign = if (d > 0) 1L else 0L
      val mag = math.min(math.abs(d) >> 6, (1L << 20) - 1)
      code(i) = (sign << 20) | mag
      i += 1
    }
    (0 to nb - 3).map { p =>
      AudioGram(r.doc_id, p,
        (code(p) << 42) | (code(p + 1) << 21) | code(p + 2))
    }
  }

  /** m12: audio fingerprint retrieval — match every degraded query clip
    * back to its source recording by landmark-gram join + time-offset
    * voting (the Shazam alignment: a true match concentrates its gram hits
    * on ONE offset delta, random collisions scatter). Expected top-1 is
    * the clip's own source at delta = -1 (the cut window).
    *
    * Scale: fingerprint extraction is map-only typed mapPartitions over
    * the payload scan; the corpus gram table is the inverted-index shape
    * (gram -> postings) that lives bucketed on gram at 100 TB, so query
    * batches equi-join co-partitioned; the 63-bit gram keeps postings
    * selective at corpus scale. Vote counting is one shuffle keyed on
    * (qid, cid, delta); both rankings are bounded per-query windows. */
  private val m12: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encG: Encoder[AudioGram] = Encoders.product[AudioGram]
    val cg = audioTable(s, dir).as[MediaPayload]
      .mapPartitions(_.flatMap(fingerprintGrams)).toDF()
      .select(col("doc_id").as("cid"), col("p").as("cp"), col("g"))
    val qg = degradedAudioTable(s, dir).as[MediaPayload]
      .mapPartitions(_.flatMap(fingerprintGrams)).toDF()
      .select(col("doc_id").as("qid"), col("p").as("qp"), col("g"))
    val votes = qg.join(cg, Seq("g"))
      .groupBy(col("qid"), col("cid"), (col("qp") - col("cp")).as("delta"))
      .agg(count(lit(1)).as("votes"))
    val wBest = Window.partitionBy(col("qid"), col("cid"))
      .orderBy(col("votes").desc, col("delta"))
    val wRank = Window.partitionBy(col("qid"))
      .orderBy(col("votes").desc, col("cid"))
    votes.withColumn("rn", row_number().over(wBest)).filter(col("rn") === 1)
      .drop("rn")
      .withColumn("rank", row_number().over(wRank)).filter(col("rank") <= 3)
      .select(col("qid"), col("rank"), col("cid"), col("votes"),
        col("delta").cast("long").as("delta"))
      .psort(col("qid"), col("rank"))
  }

  // closed-form replay: corpus frame j of channel 0 is
  // (j*ch*13 + doc) % 2001 - 1000; the degraded query clip shifts j by 25.
  // Window energies -> transition codes (LAG) -> 63-bit grams (shift-
  // weighted sum over a sliding join, complete grams only) -> gram join +
  // offset votes.
  private val m12Sql =
    """WITH g AS (
      |  SELECT doc_id, 1 + doc_id % 2 AS ch, 500 + doc_id % 250 AS nf
      |  FROM documents WHERE doc_id <= 100),
      |cw AS (
      |  SELECT doc_id, j // 25 AS w,
      |    SUM(CAST((j*ch*13 + doc_id) % 2001 - 1000 AS BIGINT)
      |      * ((j*ch*13 + doc_id) % 2001 - 1000)) AS e
      |  FROM g, UNNEST(RANGE((nf // 25) * 25)) t(j)
      |  GROUP BY doc_id, j // 25),
      |cb AS (
      |  SELECT doc_id, w - 1 AS idx,
      |    CAST(CASE WHEN d > 0 THEN 1048576 ELSE 0 END
      |      + CAST(LEAST(ABS(d) // 64, 1048575) AS BIGINT) AS BIGINT) AS cd
      |  FROM (SELECT doc_id, w,
      |          e - LAG(e) OVER (PARTITION BY doc_id ORDER BY w) AS d
      |        FROM cw) WHERE d IS NOT NULL),
      |cg AS (
      |  SELECT doc_id AS cid, idx - k AS p,
      |    CAST(SUM(cd << (21 * (2 - k))) AS BIGINT) AS gm
      |  FROM cb CROSS JOIN UNNEST(RANGE(3)) t(k)
      |  WHERE idx - k >= 0
      |  GROUP BY doc_id, idx - k HAVING COUNT(*) = 3),
      |qw AS (
      |  SELECT doc_id, j // 25 AS w,
      |    SUM(CAST(((j+25)*ch*13 + doc_id) % 2001 - 1000 AS BIGINT)
      |      * (((j+25)*ch*13 + doc_id) % 2001 - 1000)) AS e
      |  FROM g, UNNEST(RANGE(((nf - 25) // 25) * 25)) t(j)
      |  GROUP BY doc_id, j // 25),
      |qb AS (
      |  SELECT doc_id, w - 1 AS idx,
      |    CAST(CASE WHEN d > 0 THEN 1048576 ELSE 0 END
      |      + CAST(LEAST(ABS(d) // 64, 1048575) AS BIGINT) AS BIGINT) AS cd
      |  FROM (SELECT doc_id, w,
      |          e - LAG(e) OVER (PARTITION BY doc_id ORDER BY w) AS d
      |        FROM qw) WHERE d IS NOT NULL),
      |qg AS (
      |  SELECT doc_id AS qid, idx - k AS p,
      |    CAST(SUM(cd << (21 * (2 - k))) AS BIGINT) AS gm
      |  FROM qb CROSS JOIN UNNEST(RANGE(3)) t(k)
      |  WHERE idx - k >= 0
      |  GROUP BY doc_id, idx - k HAVING COUNT(*) = 3),
      |votes AS (
      |  SELECT q.qid, c.cid, q.p - c.p AS delta, COUNT(*) AS v
      |  FROM qg q JOIN cg c ON q.gm = c.gm
      |  GROUP BY 1, 2, 3),
      |best AS (
      |  SELECT qid, cid, v, delta FROM (
      |    SELECT qid, cid, v, delta,
      |      ROW_NUMBER() OVER (PARTITION BY qid, cid
      |        ORDER BY v DESC, delta) AS rn
      |    FROM votes) WHERE rn = 1),
      |ranked AS (
      |  SELECT qid, cid, v, delta,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY v DESC, cid) AS rank
      |  FROM best)
      |SELECT qid, rank, cid, CAST(v AS BIGINT) AS votes,
      | CAST(delta AS BIGINT) AS delta
      |FROM ranked WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  /** Per-channel color statistics from the REAL container decode — the
    * feature-extraction stage a vision-data pipeline runs right after
    * decode (channel means feed normalization; min/max catch dead/clipped
    * channels). */
  case class ChannelStats(doc_id: Long, channel: Int, n_ch: Long,
                          sum_v: Long, min_v: Int, max_v: Int,
                          mean_micro: Long)

  private def channelStatsOne(r: MediaPayload): Seq[ChannelStats] = {
    val img = ImageCodecs.decode(r.data)
    val sums = new Array[Long](3)
    val mins = Array(255, 255, 255)
    val maxs = Array(0, 0, 0)
    var i = 0
    while (i < img.rgb.length) {
      val c = i % 3
      val v = img.rgb(i) & 0xff
      sums(c) += v
      if (v < mins(c)) mins(c) = v
      if (v > maxs(c)) maxs(c) = v
      i += 1
    }
    val n = img.rgb.length.toLong / 3
    (0 until 3).map(c =>
      ChannelStats(r.doc_id, c, n, sums(c), mins(c), maxs(c),
        sums(c) * 1000000L / n))
  }

  /** m13: decode -> per-channel stats, the m02 shape widened to channel
    * granularity. Map-only typed mapPartitions (3 rows out per payload,
    * no shuffle before the presentation sort); integer-exact means in
    * micro-units (sum*1e6 // n — positive operands, truncation ==
    * floor in both engines). The oracle replays the interleaved-RGB
    * fixture contract in closed form per channel, so a stride or
    * channel-order mis-parse in the decoder diverges. */
  private val m13: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[ChannelStats] = Encoders.product[ChannelStats]
    mediaTable(s, dir).as[MediaPayload]
      .mapPartitions(_.flatMap(channelStatsOne)).toDF()
      .psort(col("doc_id"), col("channel"))
  }

  private val m13Sql =
    """WITH g AS (
      |  SELECT doc_id, 8 + doc_id % 56 AS w, 8 + (doc_id * 7) % 40 AS h
      |  FROM documents WHERE doc_id <= 100),
      |b AS (
      |  SELECT doc_id, CAST(c AS INTEGER) AS channel,
      |    [CAST(((3 * j + c) * 7 + doc_id) % 251 AS BIGINT)
      |      FOR j IN RANGE(w * h)] AS vs,
      |    CAST(w * h AS BIGINT) AS n_ch
      |  FROM g, RANGE(3) rc(c))
      |SELECT doc_id, channel, n_ch,
      |  CAST(LIST_SUM(vs) AS BIGINT) AS sum_v,
      |  CAST(LIST_MIN(vs) AS INTEGER) AS min_v,
      |  CAST(LIST_MAX(vs) AS INTEGER) AS max_v,
      |  CAST(LIST_SUM(vs) AS BIGINT) * 1000000 // n_ch AS mean_micro
      |FROM b ORDER BY doc_id, channel""".stripMargin

  /** One active-audio segment: a maximal run of consecutive 50-frame
    * windows whose energy is strictly above the clip's mean window energy. */
  case class AudioSegment(doc_id: Long, seg_no: Int, start_win: Int,
                          end_win: Int, n_wins: Long, seg_energy: Long)

  private def audioSegmentsOne(r: MediaPayload): Seq[AudioSegment] = {
    val a = AudioCodecs.decodeWav(r.data)
    val ch = a.channels
    val nf = a.samples.length / ch
    val nw = (nf + 49) / 50
    val we = new Array[Long](nw)
    var j = 0
    while (j < nf) {
      val v = a.samples(j * ch).toLong // channel 0 of the interleaved PCM
      we(j / 50) += v * v
      j += 1
    }
    var tot = 0L
    we.foreach(tot += _)
    // active := window energy strictly above the clip mean (we*nw > tot —
    // exact integer cross-multiplication, no division)
    val segs = Seq.newBuilder[AudioSegment]
    var segNo = 0
    var w = 0
    while (w < nw) {
      if (we(w) * nw > tot) {
        val start = w
        var e = 0L
        while (w < nw && we(w) * nw > tot) { e += we(w); w += 1 }
        segNo += 1
        segs += AudioSegment(r.doc_id, segNo, start, w - 1, (w - start).toLong, e)
      } else w += 1
    }
    segs.result()
  }

  /** m14: voice/activity segmentation — the silence-trimming stage of an
    * audio training-data pipeline: 50-frame energy windows over channel 0
    * of the REAL decoded PCM, a window is active when its energy is
    * strictly above the clip's mean window energy (exact integer
    * cross-multiply, no float threshold), and maximal runs of active
    * windows become segments (gaps-and-islands). Emits one row per
    * segment with exact integer bounds and energy mass.
    *
    * Scale: decode + segmentation are a single map-only pass per clip —
    * per-clip state is O(windows), no shuffle before the presentation
    * sort; the shape fans out to billions of clips. The oracle replays the
    * closed-form fixture series through SQL windows, so any decode,
    * stride, or island-merge divergence breaks the hash. */
  private val m14: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[AudioSegment] = Encoders.product[AudioSegment]
    audioTable(s, dir).as[MediaPayload]
      .mapPartitions(_.flatMap(audioSegmentsOne)).toDF()
      .psort(col("doc_id"), col("seg_no"))
  }

  private val m14Sql =
    """WITH g AS (
      |  SELECT doc_id, 1 + doc_id % 2 AS ch, 500 + doc_id % 250 AS nf
      |  FROM documents WHERE doc_id <= 100),
      |s AS (
      |  SELECT doc_id, j, (j * ch * 13 + doc_id) % 2001 - 1000 AS v
      |  FROM g, UNNEST(RANGE(nf)) t(j)),
      |wins AS (
      |  SELECT doc_id, j // 50 AS w, SUM(v * v) AS we
      |  FROM s GROUP BY 1, 2),
      |tot AS (
      |  SELECT doc_id, COUNT(*) AS nw, SUM(we) AS tot FROM wins GROUP BY 1),
      |act AS (
      |  SELECT wins.doc_id, w, we,
      |    w - ROW_NUMBER() OVER (PARTITION BY wins.doc_id ORDER BY w) AS isl
      |  FROM wins JOIN tot USING (doc_id) WHERE we * nw > tot),
      |seg AS (
      |  SELECT doc_id, MIN(w) AS start_win, MAX(w) AS end_win,
      |    COUNT(*) AS n_wins, SUM(we) AS seg_energy
      |  FROM act GROUP BY doc_id, isl)
      |SELECT doc_id,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY start_win)
      |    AS INTEGER) AS seg_no,
      |  CAST(start_win AS INTEGER) AS start_win,
      |  CAST(end_win AS INTEGER) AS end_win,
      |  CAST(n_wins AS BIGINT) AS n_wins,
      |  CAST(seg_energy AS BIGINT) AS seg_energy
      |FROM seg ORDER BY doc_id, seg_no""".stripMargin

  /** Per-image banding + the 8x8 point-sampled gray grid the bands were
    * thresholded from (exact ints 0..765 per cell). */
  case class ImageBandGrid(doc_id: Long, bands: Array[Long], grid: Array[Long])

  private def bandGridOne(r: MediaPayload): ImageBandGrid = {
    val img = ImageCodecs.decode(r.data)
    val g = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < 8) {
      val yy = y * img.height / 8
      var x = 0
      while (x < 8) {
        val xx = x * img.width / 8
        val base = (yy * img.width + xx) * 3
        g(y * 8 + x) = (img.rgb(base) & 0xff).toLong +
          (img.rgb(base + 1) & 0xff) + (img.rgb(base + 2) & 0xff)
        total += g(y * 8 + x)
        x += 1
      }
      y += 1
    }
    val bands = new Array[Long](4)
    var i = 0
    while (i < 64) {
      if (64L * g(i) >= total) bands(i / 16) |= 1L << (i % 16)
      i += 1
    }
    ImageBandGrid(r.doc_id, bands, g)
  }

  /** m15: image near-dup candidate pairs + exact verify — the full
    * candidate->verify pipeline for images: m08's 16-bit phash bands
    * become the pigeonhole candidate join (two images within Hamming<=3
    * of the 64-bit hash MUST share a band), and each candidate pair is
    * verified by the EXACT sum of squared differences over the dims-
    * independent 8x8 point-sampled gray grids (bounded: 64 cells x 765^2).
    *
    * Scale: band buckets are equi-joins (never all-pairs); the grid
    * verify joins the bounded candidate list back to the per-image grid
    * by id — the d03/d04 LSH shape applied to vision data, decode runs
    * once per image in the same map-only stage as banding. */
  private val m15: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[ImageBandGrid] = Encoders.product[ImageBandGrid]
    val gr = mediaTable(s, dir).as[MediaPayload]
      .mapPartitions(_.map(bandGridOne)).toDF()
    val bandRows = gr.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("k", "bv")))
    val cand = bandRows.as("a").join(bandRows.as("b"),
        col("a.k") === col("b.k") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("shared_bands"))
    cand
      .join(gr.select(col("doc_id").as("d1"), col("grid").as("g1")), Seq("d1"))
      .join(gr.select(col("doc_id").as("d2"), col("grid").as("g2")), Seq("d2"))
      .select(col("d1"), col("d2"), col("shared_bands"),
        expr("aggregate(zip_with(g1, g2, (a, b) -> (a - b) * (a - b)), " +
          "0L, (acc, x) -> acc + x)").as("ssd"))
      .psort(col("d1"), col("d2"))
  }

  private val m15Sql =
    """WITH g AS (
      |  SELECT doc_id, 8 + doc_id % 56 AS w, 8 + (doc_id * 7) % 40 AS h
      |  FROM documents WHERE doc_id <= 100),
      |cells AS (
      |  SELECT doc_id, y * 8 + x AS i,
      |    CAST(LIST_SUM([((((y * h) // 8 * w + (x * w) // 8) * 3 + c) * 7 + doc_id) % 251
      |      FOR c IN RANGE(3)]) AS BIGINT) AS v
      |  FROM g, RANGE(8) ry(y), RANGE(8) rx(x)),
      |tot AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS total
      |        FROM cells GROUP BY doc_id),
      |bands AS (
      |  SELECT c.doc_id, c.i // 16 AS k,
      |    CAST(SUM(CASE WHEN 64 * c.v >= t.total
      |      THEN 1 << (c.i % 16) ELSE 0 END) AS BIGINT) AS bv
      |  FROM cells c JOIN tot t USING (doc_id) GROUP BY 1, 2),
      |cand AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS shared_bands
      |  FROM bands a JOIN bands b
      |    ON a.k = b.k AND a.bv = b.bv AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT cand.d1, cand.d2, shared_bands,
      |  CAST(SUM((ca.v - cb.v) * (ca.v - cb.v)) AS BIGINT) AS ssd
      |FROM cand
      |JOIN cells ca ON ca.doc_id = cand.d1
      |JOIN cells cb ON cb.doc_id = cand.d2 AND cb.i = ca.i
      |GROUP BY 1, 2, 3 ORDER BY d1, d2""".stripMargin

  /** Per-video motion summary: the frame boundary with the highest sum of
    * absolute pixel differences (the keyframe a sampler would keep). */
  case class VideoMotion(doc_id: Long, n_frames: Int, key_frame: Int,
                         max_sad: Long, total_sad: Long)

  private def motionOne(r: MediaPayload): VideoMotion = {
    val frames = graft.media.VideoCodecs.decodeGvid(r.data).frames
    var maxSad = -1L
    var keyF = 0
    var total = 0L
    var f = 1
    while (f < frames.length) {
      val a = frames(f - 1).rgb
      val b = frames(f).rgb
      var sad = 0L
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        sad += math.abs((a(i) & 0xff) - (b(i) & 0xff)); i += 1
      }
      total += sad
      if (sad > maxSad) { maxSad = sad; keyF = f }
      f += 1
    }
    VideoMotion(r.doc_id, frames.length, keyF, math.max(maxSad, 0L), total)
  }

  /** m16: motion-energy keyframe selection — the representative-frame
    * extraction stage of a video training-data pipeline: per consecutive
    * frame pair, the exact sum of absolute pixel differences (SAD) over
    * the REAL per-frame BMP decodes; the keyframe is the argmax boundary
    * (ties -> earliest). On the fixture the only nonzero SAD is the
    * planted scene cut, which the oracle derives in closed form — any
    * decode, stride, or argmax divergence breaks the hash.
    *
    * Scale: container decode + pairwise SAD + argmax fused in ONE typed
    * map-only stage per payload (per-clip state is two frames); only the
    * presentation sort shuffles. */
  private val m16: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[VideoMotion] = Encoders.product[VideoMotion]
    videoTable(s, dir).as[MediaPayload]
      .mapPartitions(_.map(motionOne)).toDF()
      .psort(col("doc_id"))
  }

  private val m16Sql =
    """WITH g AS (
      |  SELECT doc_id, 8 + doc_id % 8 AS w, 8 + (doc_id * 3) % 8 AS h,
      |    4 + doc_id % 5 AS nf
      |  FROM documents WHERE doc_id <= 40),
      |c AS (
      |  SELECT doc_id, w, h, nf,
      |    1 + doc_id % (nf - 1) AS cut,
      |    doc_id * 31 AS s1, doc_id * 31 + 999 AS s2
      |  FROM g),
      |sad AS (
      |  SELECT doc_id, nf, cut,
      |    CAST(LIST_SUM([ABS((i * 7 + s1) % 251 - (i * 7 + s2) % 251)
      |      FOR i IN RANGE(w * h * 3)]) AS BIGINT) AS cut_sad
      |  FROM c)
      |SELECT doc_id, CAST(nf AS INTEGER) AS n_frames,
      |  CAST(cut AS INTEGER) AS key_frame,
      |  cut_sad AS max_sad, cut_sad AS total_sad
      |FROM sad ORDER BY doc_id""".stripMargin

  /** Per-clip loudness-normalization plan: channel-0 peak, the integer
    * milli-gain that scales it to the 32000 target, and the exact
    * normalized absolute mass after applying that gain per sample. */
  case class AudioGain(doc_id: Long, peak0: Int, gain_milli: Long,
                       norm_abs_sum: Long, at_target: Long)

  private def gainOne(r: MediaPayload): AudioGain = {
    val a = AudioCodecs.decodeWav(r.data)
    val ch = a.channels
    val nf = a.samples.length / ch
    var peak = 0
    var j = 0
    while (j < nf) {
      val v = math.abs(a.samples(j * ch).toInt)
      if (v > peak) peak = v
      j += 1
    }
    val gain = if (peak == 0) 0L else 32000L * 1000L / peak
    var sum = 0L
    var atT = 0L
    j = 0
    while (j < nf) {
      val v = math.abs(a.samples(j * ch).toInt).toLong
      val n = v * gain / 1000L // per-sample floor, positive operands
      sum += n
      if (n == 32000L) atT += 1
      j += 1
    }
    AudioGain(r.doc_id, peak, gain, sum, atT)
  }

  /** m17: peak-normalization planning — the loudness-equalization stage an
    * audio corpus runs before model ingest (clips recorded at wildly
    * different levels must not dominate training by amplitude): channel-0
    * peak from the REAL PCM decode, integer milli-gain to the 32000
    * target, and the exact post-gain absolute mass (per-sample floor on
    * positive operands — floor == truncate in both engines, so every
    * emitted number is an exact integer the oracle replays closed-form).
    *
    * Scale: decode + peak + gain application fused in ONE map-only pass
    * per clip (two sequential scans of the in-memory samples); no
    * shuffle before the presentation sort. */
  private val m17: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[AudioGain] = Encoders.product[AudioGain]
    audioTable(s, dir).as[MediaPayload]
      .mapPartitions(_.map(gainOne)).toDF()
      .psort(col("doc_id"))
  }

  private val m17Sql =
    """WITH g AS (
      |  SELECT doc_id, 1 + doc_id % 2 AS ch, 500 + doc_id % 250 AS nf
      |  FROM documents WHERE doc_id <= 100),
      |s AS (
      |  SELECT doc_id, ABS((j * ch * 13 + doc_id) % 2001 - 1000) AS v
      |  FROM g, UNNEST(RANGE(nf)) t(j)),
      |pk AS (SELECT doc_id, CAST(MAX(v) AS BIGINT) AS peak FROM s GROUP BY 1),
      |gn AS (SELECT doc_id, peak,
      |         CASE WHEN peak = 0 THEN 0
      |              ELSE 32000 * 1000 // peak END AS gain
      |       FROM pk)
      |SELECT s.doc_id,
      |  CAST(gn.peak AS INTEGER) AS peak0,
      |  CAST(gn.gain AS BIGINT) AS gain_milli,
      |  CAST(SUM(s.v * gn.gain // 1000) AS BIGINT) AS norm_abs_sum,
      |  CAST(SUM(CASE WHEN s.v * gn.gain // 1000 = 32000
      |    THEN 1 ELSE 0 END) AS BIGINT) AS at_target
      |FROM s JOIN gn USING (doc_id)
      |GROUP BY s.doc_id, gn.peak, gn.gain ORDER BY s.doc_id""".stripMargin

  /** One uniformly-sampled frame slot of a clip: slot index (0..3), the
    * source frame it maps to, and that frame's exact pixel mass. */
  case class VideoSample(doc_id: Long, slot: Int, frame_idx: Int,
                         px_sum: Long)

  private def sampleOne(r: MediaPayload): Iterator[VideoSample] = {
    val frames = graft.media.VideoCodecs.decodeGvid(r.data).frames
    val nf = frames.length
    (0 until 4).iterator.map { j =>
      val idx = j * nf / 4 // uniform stride over the clip
      val px = frames(idx).rgb
      var s = 0L
      var i = 0
      while (i < px.length) { s += (px(i) & 0xff); i += 1 }
      VideoSample(r.doc_id, j, idx, s)
    }
  }

  /** m18: uniform temporal frame sampling — the fixed-frames-per-clip
    * normalization every video training pipeline applies before frame
    * encoding (clips arrive at arbitrary lengths; the model sees exactly
    * k frames): slot j of k=4 maps to source frame floor(j*nf/4), each
    * selected frame decoded from the REAL GVID container and pinned by
    * its exact pixel mass. The oracle replays frame selection and the
    * pixel formula closed-form from the fixture contract.
    *
    * Scale: decode + stride-select + checksum fuse into ONE typed
    * map-only stage per clip (the m11 audio-resample shape on the video
    * axis); output is O(4 x clips); only the presentation sort shuffles. */
  private val m18: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[VideoSample] = Encoders.product[VideoSample]
    videoTable(s, dir).as[MediaPayload]
      .mapPartitions(_.flatMap(sampleOne)).toDF()
      .psort(col("doc_id"), col("slot"))
  }

  private val m18Sql =
    """WITH g AS (
      |  SELECT doc_id, 8 + doc_id % 8 AS w, 8 + (doc_id * 3) % 8 AS h,
      |    4 + doc_id % 5 AS nf, 1 + doc_id % (3 + doc_id % 5) AS cut
      |  FROM documents WHERE doc_id <= 40),
      |slots AS (
      |  SELECT doc_id, w, h, cut, j,
      |    CAST((j * nf) // 4 AS INTEGER) AS idx
      |  FROM g, RANGE(0, 4) r(j))
      |SELECT doc_id, CAST(j AS INTEGER) AS slot, idx AS frame_idx,
      |  CAST(LIST_SUM([(i * 7 + doc_id * 31 +
      |      CASE WHEN idx >= cut THEN 999 ELSE 0 END) % 251
      |    FOR i IN RANGE(w * h * 3)]) AS BIGINT) AS px_sum
      |FROM slots ORDER BY doc_id, slot""".stripMargin

  /** One quarantine verdict row: format sniffed from magic bytes, verdict
    * from a real decode attempt, dimensions only for payloads that decode
    * clean. */
  case class MediaVerdict(doc_id: Long, format: String, verdict: String,
                          width: Option[Long], height: Option[Long],
                          n_px: Option[Long])

  private def quarantineOne(docId: Long, b: Array[Byte]): MediaVerdict = {
    val isBmp = b.length >= 2 && b(0) == 'B' && b(1) == 'M'
    val pngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val isPng = b.length >= 8 && (0 until 8).forall(i => b(i) == pngSig(i))
    if (!isBmp && !isPng)
      MediaVerdict(docId, "unknown", "bad_magic", None, None, None)
    else {
      val fmt = if (isBmp) "bmp" else "png"
      try {
        val img = ImageCodecs.decode(b)
        MediaVerdict(docId, fmt, "ok", Some(img.width.toLong),
          Some(img.height.toLong), Some(img.rgb.length.toLong))
      } catch {
        case _: Exception =>
          MediaVerdict(docId, fmt, "corrupt_data", None, None, None)
      }
    }
  }

  /** m19: corrupt-media quarantine — the validation gate every lake-scale
    * media pipeline runs BEFORE decode/feature stages: classify each binary
    * payload as ok / bad_magic / corrupt_data from its magic bytes and a
    * real decode attempt, so downstream stages see only clean payloads and
    * the quarantine rate is a monitorable metric. Corruption is PLANTED
    * deterministically on the wire (doc_id % 7 == 3 truncates the payload
    * to 10 bytes — magic intact, body gone; doc_id % 7 == 5 flips the
    * first magic byte), so the oracle replays the expected taxonomy closed
    * form while the engine must actually hit the decoder's failure paths
    * (BMP header length check, PNG chunk-bounds check) and recover per
    * row rather than aborting the partition. Dimensions for clean rows
    * come from the REAL decode, not the contract. Map-only, shuffle-free
    * — the same mapPartitions batch shape as m02. */
  private val m19: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[MediaVerdict] = Encoders.product[MediaVerdict]
    mediaTable(s, dir).as[MediaPayload]
      .mapPartitions(_.map { p =>
        val tampered = p.doc_id % 7 match {
          case 3 => java.util.Arrays.copyOf(p.data, 10)
          case 5 =>
            val c = p.data.clone(); c(0) = (c(0) ^ 0xff).toByte; c
          case _ => p.data
        }
        quarantineOne(p.doc_id, tampered)
      }).toDF()
      .psort(col("doc_id"))
  }

  private val m19Sql =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 7 = 5 THEN 'unknown'
      |       WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS format,
      |  CASE WHEN doc_id % 7 = 3 THEN 'corrupt_data'
      |       WHEN doc_id % 7 = 5 THEN 'bad_magic'
      |       ELSE 'ok' END AS verdict,
      |  CASE WHEN doc_id % 7 IN (3, 5) THEN NULL
      |       ELSE 8 + doc_id % 56 END AS width,
      |  CASE WHEN doc_id % 7 IN (3, 5) THEN NULL
      |       ELSE 8 + (doc_id * 7) % 40 END AS height,
      |  CASE WHEN doc_id % 7 IN (3, 5) THEN NULL
      |       ELSE (8 + doc_id % 56) * (8 + (doc_id * 7) % 40) * 3 END AS n_px
      |FROM documents WHERE doc_id <= 100 ORDER BY doc_id""".stripMargin

  // ---- p03: composed media curation pipeline -------------------------------

  /** Per-payload curation record: the quarantine verdict fused with m08's
    * band/grid statistic from the SAME decode — one pass, one decode. */
  case class MediaCurated(doc_id: Long, format: String, verdict: String,
                          bands: Seq[Long], grid: Seq[Long], total: Long)

  private def curateOne(docId: Long, b: Array[Byte]): MediaCurated = {
    val isBmp = b.length >= 2 && b(0) == 'B' && b(1) == 'M'
    val pngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val isPng = b.length >= 8 && (0 until 8).forall(i => b(i) == pngSig(i))
    if (!isBmp && !isPng)
      MediaCurated(docId, "unknown", "bad_magic", Nil, Nil, 0L)
    else {
      val fmt = if (isBmp) "bmp" else "png"
      try {
        val gb = bandGridOne(MediaPayload(docId, b))
        MediaCurated(docId, fmt, "ok", gb.bands.toSeq, gb.grid.toSeq,
          gb.grid.sum)
      } catch {
        case _: Exception =>
          MediaCurated(docId, fmt, "corrupt_data", Nil, Nil, 0L)
      }
    }
  }

  /** Corrupted + re-uploaded media wire fixture: doc_id % 9 == 2 rows carry
    * the PREVIOUS doc's image bytes under their own id (the re-upload dup),
    * then m19's corruption plants on top (% 7 == 3 truncates, % 7 == 5
    * flips the magic byte). Built map-only on executors, stored as parquet
    * binary — the raw-ingest shape. */
  private val tamperedFixtures = scala.collection.concurrent.TrieMap[String, String]()

  private def tamperedTable(s: org.apache.spark.sql.SparkSession,
                            dir: String): org.apache.spark.sql.DataFrame = {
    val path = tamperedFixtures.getOrElseUpdate(dir, {
      implicit val enc: Encoder[MediaPayload] = Encoders.product[MediaPayload]
      implicit val encL: Encoder[Long] = Encoders.scalaLong
      val out = fixtureTempDir("graft_media_tampered")
      t(s, dir, "documents").filter(col("doc_id") <= 100)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val eff = if (id % 9 == 2) id - 1 else id
          val raw = fixturePayload(eff)
          val bytes = id % 7 match {
            case 3 => java.util.Arrays.copyOf(raw, 10)
            case 5 =>
              val c = raw.clone(); c(0) = (c(0) ^ 0xff).toByte; c
            case _ => raw
          }
          MediaPayload(id, bytes)
        })
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  /** p03: the composed media-curation pipeline — quarantine → phash
    * near-dup → keep-list → per-format manifest, chained end to end the
    * way a lake-scale image-ingest run actually executes: (1) ONE typed
    * map-only pass decodes each payload, emitting the m19 quarantine
    * verdict fused with m08's 8x8 grid + 16-bit band signature (one
    * decode, never two); (2) clean rows pigeonhole-join on band equality
    * — never all-pairs — and candidates verify by exact grid SSD == 0;
    * (3) a duplicate keeps its lowest-id clean peer as canonical
    * (re-uploads planted on the wire: % 9 == 2 rows carry the previous
    * doc's bytes); (4) the manifest aggregates the funnel per format —
    * ingested / bad_magic / corrupt / clean / dup_dropped / kept, with
    * the kept pixel mass pinning every decode. The oracle replays the
    * whole funnel generically from the pixel contract (substitution +
    * corruption + hash + dedup in SQL), so a divergence ANYWHERE in the
    * chain — decoder failure path, band join, SSD verify, keep rule —
    * breaks the gate.
    *
    * Scale: stage 1 is map-only over the binary column; the candidate
    * join is band-bucketed (pairs ∝ collisions, not corpus²); the verify
    * touches only candidates; the manifest is an O(formats) aggregation.
    * Same 100 TB shape as d03/m15. */
  private val p03: Q = (s, dir) => {
    val curated = memoized(s"p03cur:$dir") {
      implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
      implicit val encOut: Encoder[MediaCurated] = Encoders.product[MediaCurated]
      val df = tamperedTable(s, dir).as[MediaPayload]
        .mapPartitions(_.map(p => curateOne(p.doc_id, p.data))).toDF()
      df.persist(); df.count(); df
    }
    val clean = curated.filter(col("verdict") === "ok")
    val bandRows = clean.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("k", "bv")))
    val cand = bandRows.as("a").join(bandRows.as("b"),
        col("a.k") === col("b.k") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2")).distinct()
    val verified = cand
      .join(clean.select(col("doc_id").as("d1"), col("grid").as("g1")), Seq("d1"))
      .join(clean.select(col("doc_id").as("d2"), col("grid").as("g2")), Seq("d2"))
      .filter(expr("aggregate(zip_with(g1, g2, (a, b) -> (a - b) * (a - b)), " +
        "0L, (acc, x) -> acc + x)") === 0L)
    val drops = verified.groupBy(col("d2").as("doc_id"))
      .agg(min(col("d1")).as("dup_of"))
    curated.join(drops, Seq("doc_id"), "left")
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_ingested"),
        sum(when(col("verdict") === "bad_magic", 1L).otherwise(0L)).as("n_bad_magic"),
        sum(when(col("verdict") === "corrupt_data", 1L).otherwise(0L)).as("n_corrupt"),
        sum(when(col("verdict") === "ok", 1L).otherwise(0L)).as("n_clean"),
        sum(when(col("verdict") === "ok" && col("dup_of").isNotNull, 1L)
          .otherwise(0L)).as("n_dup_dropped"),
        sum(when(col("verdict") === "ok" && col("dup_of").isNull, 1L)
          .otherwise(0L)).as("n_kept"),
        sum(when(col("verdict") === "ok" && col("dup_of").isNull, col("total"))
          .otherwise(0L)).as("kept_px_sum"))
      .psort(col("format"))
  }

  private val p03Sql =
    """WITH ids AS (
      |  SELECT doc_id, CASE WHEN doc_id % 9 = 2 THEN doc_id - 1 ELSE doc_id END AS eff
      |  FROM documents WHERE doc_id <= 100),
      |v AS (
      |  SELECT doc_id, eff,
      |    CASE WHEN doc_id % 7 = 5 THEN 'unknown'
      |         WHEN eff % 2 = 0 THEN 'bmp' ELSE 'png' END AS format,
      |    CASE WHEN doc_id % 7 = 3 THEN 'corrupt_data'
      |         WHEN doc_id % 7 = 5 THEN 'bad_magic' ELSE 'ok' END AS verdict
      |  FROM ids),
      |g AS (SELECT doc_id, eff, 8 + eff % 56 AS w, 8 + (eff * 7) % 40 AS h
      |      FROM v WHERE verdict = 'ok'),
      |cells AS (
      |  SELECT doc_id, y * 8 + x AS i,
      |    CAST(LIST_SUM([((((y * h) // 8 * w + (x * w) // 8) * 3 + c) * 7 + eff) % 251
      |      FOR c IN RANGE(3)]) AS BIGINT) AS val
      |  FROM g, RANGE(8) ry(y), RANGE(8) rx(x)),
      |tot AS (SELECT doc_id, CAST(SUM(val) AS BIGINT) AS total FROM cells GROUP BY doc_id),
      |bands AS (
      |  SELECT c.doc_id, c.i // 16 AS k,
      |    CAST(SUM(CASE WHEN 64 * c.val >= t.total THEN 1 << (c.i % 16) ELSE 0 END) AS BIGINT) AS bv
      |  FROM cells c JOIN tot t USING (doc_id) GROUP BY 1, 2),
      |cand AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2
      |  FROM bands a JOIN bands b ON a.k = b.k AND a.bv = b.bv AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |ssd AS (
      |  SELECT cand.d1, cand.d2,
      |    CAST(SUM((ca.val - cb.val) * (ca.val - cb.val)) AS BIGINT) AS ssd
      |  FROM cand
      |  JOIN cells ca ON ca.doc_id = cand.d1
      |  JOIN cells cb ON cb.doc_id = cand.d2 AND cb.i = ca.i
      |  GROUP BY 1, 2),
      |drops AS (SELECT d2 AS doc_id, MIN(d1) AS dup_of FROM ssd WHERE ssd = 0 GROUP BY d2)
      |SELECT v.format,
      |  COUNT(*) AS n_ingested,
      |  CAST(SUM(CASE WHEN verdict = 'bad_magic' THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_magic,
      |  CAST(SUM(CASE WHEN verdict = 'corrupt_data' THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
      |  CAST(SUM(CASE WHEN verdict = 'ok' THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
      |  CAST(SUM(CASE WHEN verdict = 'ok' AND drops.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_dropped,
      |  CAST(SUM(CASE WHEN verdict = 'ok' AND drops.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN verdict = 'ok' AND drops.doc_id IS NULL THEN tot.total ELSE 0 END) AS BIGINT) AS kept_px_sum
      |FROM v LEFT JOIN drops ON v.doc_id = drops.doc_id
      |       LEFT JOIN tot ON v.doc_id = tot.doc_id
      |GROUP BY v.format ORDER BY v.format""".stripMargin

  // ---- m20: cross-format exact media dedup (pixel-content digest) ---------
  /** m20: format-INDEPENDENT exact image dedup — the re-encode case byte
    * hashes (m01) and container-aware near-dup (m15) both miss: the same
    * pixels saved as BMP by one uploader and PNG by another are different
    * bytes but the same image. The fixture plants an opposite-format twin
    * (doc_id + 2000) for every third image; the engine decodes BOTH real
    * containers to raw RGB, keys on sha2(width x height x pixel bytes),
    * and reports each duplicate against its lowest-id canonical with both
    * formats. The pair survives ONLY if the BMP decoder and the PNG
    * decoder (stride padding, filter reconstruction, zlib) reproduce
    * byte-identical pixels — the oracle replays the planted-twin contract
    * in closed form, so any decoder divergence breaks the hash.
    *
    * Scale shape: decode + digest is one typed map-only stage (the same
    * mapPartitions batch shape as m02); the group is one shuffle on the
    * content digest at O(images); duplicates join back to their group's
    * canonical by digest equality — no pairwise comparisons anywhere. */
  private val m20: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encK: Encoder[(Long, String, Int, Int, String)] =
      Encoders.product[(Long, String, Int, Int, String)]
    val twins = {
      implicit val encL: Encoder[Long] = Encoders.scalaLong
      t(s, dir, "documents")
        .filter(col("doc_id") <= 100 && col("doc_id") % 3 === 0)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val (w, h) = fixtureDims(id)
          val px = fixturePixels(id, w * h * 3)
          val payload =
            if (id % 2 == 0) ImageCodecs.encodePng(w, h, px)
            else ImageCodecs.encodeBmp(w, h, px)
          MediaPayload(id + 2000L, payload)
        })
    }
    val keyed = mediaTable(s, dir).as[MediaPayload].union(twins)
      .mapPartitions(_.map { r =>
        val fmt =
          if (r.data.length >= 2 && r.data(0) == 'B' && r.data(1) == 'M') "bmp"
          else "png"
        val img = ImageCodecs.decode(r.data)
        val md = java.security.MessageDigest.getInstance("SHA-256")
        md.update(java.nio.ByteBuffer.allocate(8).putInt(img.width)
          .putInt(img.height).array())
        md.update(img.rgb)
        val key = md.digest().map("%02x".format(_)).mkString
        (r.doc_id, fmt, img.width, img.height, key)
      }).toDF("doc_id", "format", "width", "height", "key")
    val groups = keyed.groupBy(col("key"))
      .agg(min(col("doc_id")).as("canonical_id"),
        expr("min_by(format, doc_id)").as("fmt_canonical"))
    keyed.join(groups, Seq("key"))
      .filter(col("doc_id") =!= col("canonical_id"))
      .select(col("canonical_id"), col("doc_id").as("dup_id"),
        col("fmt_canonical"), col("format").as("fmt_dup"),
        col("width"), col("height"))
      .psort(col("canonical_id"))
  }

  // the oracle replays the planted-twin contract: every third fixture image
  // gains an opposite-format twin at doc_id + 2000 with identical pixels
  private val m20Sql =
    """SELECT doc_id AS canonical_id, doc_id + 2000 AS dup_id,
      | CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS fmt_canonical,
      | CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS fmt_dup,
      | CAST(8 + doc_id % 56 AS INTEGER) AS width,
      | CAST(8 + (doc_id * 7) % 40 AS INTEGER) AS height
      |FROM documents WHERE doc_id <= 100 AND doc_id % 3 = 0
      |ORDER BY canonical_id""".stripMargin

  // ---- m21: audio clipping audit (planted-plateau gate) -------------------
  /** Per-clip clipping report row. */
  case class ClippedAudio(doc_id: Long, n_samples: Long, n_clipped: Long,
                          max_run: Long, clipped_permille: Long)

  /** m21: audio ingest-health — clipping detection, the signal-quality
    * gate every audio curation pipeline runs before feature extraction:
    * per clip the count of full-scale samples (>= 32767 / <= -32768) and
    * the LONGEST consecutive clipped run (a long plateau = hard clipping;
    * isolated peaks are benign). The fixture PCM stays in [-1000, 1000]
    * by contract, so the gate follows the s33/m19 planted pattern: every
    * fourth clip gains a twin (doc_id + 3000) with a periodic full-scale
    * plateau (length docId%5+2 every 50 samples) written through the REAL
    * WAV encoder — the audit must recover the exact planted clip counts
    * and run lengths from the decoded containers, and the oracle replays
    * the plateau arithmetic in closed form.
    *
    * Scale shape: planting is bounded (<=26 twins); the audit is one
    * typed map-only decode pass per clip — only the presentation sort
    * shuffles. */
  private val m21: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[ClippedAudio] = Encoders.product[ClippedAudio]
    implicit val encL: Encoder[Long] = Encoders.scalaLong
    val twins = t(s, dir, "documents")
      .filter(col("doc_id") <= 100 && col("doc_id") % 4 === 0)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val a = AudioCodecs.decodeWav(audioPayload(id))
        val plateau = (id % 5 + 2).toInt
        val smp = a.samples.clone()
        var i = 0
        while (i < smp.length) {
          if (i % 50 < plateau) smp(i) = 32767
          i += 1
        }
        MediaPayload(id + 3000L,
          AudioCodecs.encodeWav(a.sampleRate, a.channels, smp))
      })
    audioTable(s, dir).as[MediaPayload].union(twins)
      .mapPartitions(_.map { r =>
        val a = AudioCodecs.decodeWav(r.data)
        var nClip = 0L
        var run = 0L
        var maxRun = 0L
        var i = 0
        while (i < a.samples.length) {
          val v = a.samples(i)
          if (v >= 32767 || v <= -32768) {
            nClip += 1; run += 1; if (run > maxRun) maxRun = run
          } else run = 0
          i += 1
        }
        ClippedAudio(r.doc_id, a.samples.length.toLong, nClip, maxRun,
          nClip * 1000L / a.samples.length)
      }).toDF()
      .psort(col("doc_id"))
  }

  // closed-form oracle: clean clips report zero; each planted twin's
  // periodic plateau (length L = id%5+2 every 50 samples, mono by
  // construction since id%4=0 implies channels=1) yields
  // (n//50)*L + min(L, n%50) clipped samples with max run L
  private val m21Sql =
    """WITH base AS (
      |  SELECT doc_id,
      |    CAST((500 + doc_id % 250) * (1 + doc_id % 2) AS BIGINT) AS n
      |  FROM documents WHERE doc_id <= 100),
      |clean AS (
      |  SELECT doc_id, n, CAST(0 AS BIGINT) AS n_clipped,
      |    CAST(0 AS BIGINT) AS max_run
      |  FROM base),
      |twin AS (
      |  SELECT b.doc_id + 3000 AS tid, b.n,
      |    CAST((b.n // 50) * (b.doc_id % 5 + 2)
      |      + LEAST(b.doc_id % 5 + 2, b.n % 50) AS BIGINT) AS n_clipped,
      |    CAST(b.doc_id % 5 + 2 AS BIGINT) AS max_run
      |  FROM base b WHERE b.doc_id % 4 = 0),
      |u AS (
      |  SELECT doc_id, n, n_clipped, max_run FROM clean
      |  UNION ALL SELECT tid, n, n_clipped, max_run FROM twin)
      |SELECT doc_id, n AS n_samples, n_clipped, max_run,
      |  n_clipped * 1000 // n AS clipped_permille
      |FROM u ORDER BY doc_id""".stripMargin

  // ---- m22: PNG metadata-chunk audit + strip (privacy leak gate) ----------
  /** Per-image metadata audit row. */
  case class MetaAudit(doc_id: Long, format: String, n_meta: Long,
                       meta_bytes: Long, removed_bytes: Long,
                       width: Int, height: Int, decode_ok: Boolean)

  /** Splice one tEXt chunk (keyword NUL text, per the PNG spec) right
    * after IHDR — signature(8) + IHDR chunk(12+13) = offset 33. */
  private def spliceText(png: Array[Byte], keyword: String,
                         text: String): Array[Byte] = {
    val data = (keyword + "\u0000" + text)
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val chunk = new Array[Byte](12 + data.length)
    chunk(0) = ((data.length >>> 24) & 0xff).toByte
    chunk(1) = ((data.length >>> 16) & 0xff).toByte
    chunk(2) = ((data.length >>> 8) & 0xff).toByte
    chunk(3) = (data.length & 0xff).toByte
    System.arraycopy("tEXt".getBytes("US-ASCII"), 0, chunk, 4, 4)
    System.arraycopy(data, 0, chunk, 8, data.length)
    val crc = new java.util.zip.CRC32()
    crc.update(chunk, 4, 4 + data.length)
    val c = crc.getValue.toInt
    chunk(8 + data.length) = ((c >>> 24) & 0xff).toByte
    chunk(9 + data.length) = ((c >>> 16) & 0xff).toByte
    chunk(10 + data.length) = ((c >>> 8) & 0xff).toByte
    chunk(11 + data.length) = (c & 0xff).toByte
    val at = 33
    val out = new Array[Byte](png.length + chunk.length)
    System.arraycopy(png, 0, out, 0, at)
    System.arraycopy(chunk, 0, out, at, chunk.length)
    System.arraycopy(png, at, out, at + chunk.length, png.length - at)
    out
  }

  /** m22: the training-data PRIVACY leak every image pipeline must audit —
    * ancillary metadata chunks riding inside PNG containers (EXIF-class
    * payloads: author, GPS, source URLs survive re-hosting and leak into
    * models). The fixture plants a real tEXt chunk (`src=doc_<id>`) into
    * every PNG with doc_id % 6 == 1 — spliced with a correct CRC so the
    * audit must WALK the actual chunk structure, not pattern-match. The
    * op reports per image the ancillary-chunk count/bytes, strips them
    * (critical chunks only survive), and re-decodes the stripped bytes to
    * prove the strip is lossless for pixels. The oracle replays the
    * planting arithmetic (chunk overhead = data + 12) in closed form.
    *
    * Scale shape: one typed map-only walk+strip+redecode pass per image;
    * only the presentation sort shuffles. */
  private val m22: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[MetaAudit] = Encoders.product[MetaAudit]
    mediaTable(s, dir).as[MediaPayload]
      .mapPartitions(_.map { r =>
        val payload =
          if (r.doc_id % 6 == 1)
            spliceText(r.data, "Comment", s"src=doc_${r.doc_id}")
          else r.data
        val isBmp = payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M'
        if (isBmp) {
          val img = ImageCodecs.decode(payload)
          MetaAudit(r.doc_id, "bmp", 0L, 0L, 0L, img.width, img.height, true)
        } else {
          // walk the real chunk structure: keep critical chunks, count and
          // strip ancillary ones
          val out = new java.io.ByteArrayOutputStream(payload.length)
          out.write(payload, 0, 8)
          var pos = 8
          var nMeta = 0L
          var metaBytes = 0L
          var removed = 0L
          var end = false
          while (!end) {
            val len = ((payload(pos) & 0xff) << 24) |
              ((payload(pos + 1) & 0xff) << 16) |
              ((payload(pos + 2) & 0xff) << 8) | (payload(pos + 3) & 0xff)
            val ct = new String(payload, pos + 4, 4, "US-ASCII")
            if (ct == "IHDR" || ct == "IDAT" || ct == "IEND")
              out.write(payload, pos, 12 + len)
            else {
              nMeta += 1; metaBytes += len; removed += 12L + len
            }
            if (ct == "IEND") end = true
            pos += 12 + len
          }
          val stripped = out.toByteArray
          val img = ImageCodecs.decode(stripped)
          MetaAudit(r.doc_id, "png", nMeta, metaBytes, removed,
            img.width, img.height,
            stripped.length == payload.length - removed)
        }
      }).toDF()
      .psort(col("doc_id"))
  }

  // planting contract: doc_id % 6 == 1 gains one tEXt chunk with data
  // "Comment" + NUL + "src=doc_<id>" = 16 + digits(id) bytes (+12 overhead)
  private val m22Sql =
    """SELECT doc_id,
      | CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS format,
      | CAST(CASE WHEN doc_id % 6 = 1 THEN 1 ELSE 0 END AS BIGINT) AS n_meta,
      | CAST(CASE WHEN doc_id % 6 = 1
      |   THEN 16 + LENGTH(CAST(doc_id AS VARCHAR)) ELSE 0 END AS BIGINT)
      |   AS meta_bytes,
      | CAST(CASE WHEN doc_id % 6 = 1
      |   THEN 28 + LENGTH(CAST(doc_id AS VARCHAR)) ELSE 0 END AS BIGINT)
      |   AS removed_bytes,
      | CAST(8 + doc_id % 56 AS INTEGER) AS width,
      | CAST(8 + (doc_id * 7) % 40 AS INTEGER) AS height,
      | TRUE AS decode_ok
      |FROM documents WHERE doc_id <= 100 ORDER BY doc_id""".stripMargin

  // ---- m23: thumbnail normalization (2x2 average-pool + re-encode) --------
  /** Per-image thumbnail row: pooled dims, pixel mass, round-trip proof. */
  case class Thumb(doc_id: Long, format: String, w2: Int, h2: Int,
                   n_px2: Int, pooled_sum: Long, roundtrip_ok: Boolean)

  /** m23: the RESIZE stage every image pipeline runs before feature
    * extraction or storage tiering — a 2x2 average-pool thumbnail (integer
    * floor per block, odd trailing row/column dropped) computed from the
    * REAL decoded pixels of both containers, then re-encoded as PNG at the
    * new dimensions and decoded back to prove the thumbnail round-trips
    * losslessly (gates the codec at dims the fixture never exercises). The
    * oracle replays the pooled pixel mass in closed form from the fixture
    * pixel formula — a stride, BGR, bottom-up or filter mis-parse at
    * EITHER scale diverges.
    *
    * Scale shape: one typed map-only decode+pool+re-encode pass per image;
    * only the presentation sort shuffles. */
  private val m23: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[Thumb] = Encoders.product[Thumb]
    mediaTable(s, dir).as[MediaPayload]
      .mapPartitions(_.map { r =>
        val fmt = if (r.data.length >= 2 && r.data(0) == 'B' &&
          r.data(1) == 'M') "bmp" else "png"
        val img = ImageCodecs.decode(r.data)
        val (w, h) = (img.width, img.height)
        val (w2, h2) = (w / 2, h / 2)
        val pooled = new Array[Byte](w2 * h2 * 3)
        var sum = 0L
        var y2 = 0
        while (y2 < h2) {
          var x2 = 0
          while (x2 < w2) {
            var c = 0
            while (c < 3) {
              val i00 = ((2 * y2) * w + 2 * x2) * 3 + c
              val i10 = ((2 * y2 + 1) * w + 2 * x2) * 3 + c
              val v = ((img.rgb(i00) & 0xff) + (img.rgb(i00 + 3) & 0xff) +
                (img.rgb(i10) & 0xff) + (img.rgb(i10 + 3) & 0xff)) / 4
              pooled((y2 * w2 + x2) * 3 + c) = v.toByte
              sum += v
              c += 1
            }
            x2 += 1
          }
          y2 += 1
        }
        val back = ImageCodecs.decode(ImageCodecs.encodePng(w2, h2, pooled))
        Thumb(r.doc_id, fmt, w2, h2, w2 * h2 * 3, sum,
          back.width == w2 && back.height == h2 &&
            java.util.Arrays.equals(back.rgb, pooled))
      }).toDF()
      .psort(col("doc_id"))
  }

  // pooled pixel (y2,x2,c) = floor((p(2y2,2x2,c)+p(2y2,2x2+1,c)
  //   +p(2y2+1,2x2,c)+p(2y2+1,2x2+1,c))/4), p(y,x,c)=((y*w+x)*3+c)*7+id %251;
  // the comprehension decomposes output index i as c=i%3, x2=(i//3)%w2,
  // y2=i//(3*w2)
  private val m23Sql =
    """WITH dims AS (
      |  SELECT doc_id, 8 + doc_id % 56 AS w, 8 + (doc_id*7) % 40 AS h
      |  FROM documents WHERE doc_id <= 100)
      |SELECT doc_id,
      | CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS format,
      | CAST(w//2 AS INTEGER) AS w2,
      | CAST(h//2 AS INTEGER) AS h2,
      | CAST((w//2)*(h//2)*3 AS INTEGER) AS n_px2,
      | CAST(list_sum([
      |   (((((2*(i//(3*(w//2))))*w + 2*((i//3)%(w//2)))*3 + i%3)*7
      |       + doc_id) % 251
      |   + ((((2*(i//(3*(w//2))))*w + 2*((i//3)%(w//2)) + 1)*3 + i%3)*7
      |       + doc_id) % 251
      |   + ((((2*(i//(3*(w//2))) + 1)*w + 2*((i//3)%(w//2)))*3 + i%3)*7
      |       + doc_id) % 251
      |   + ((((2*(i//(3*(w//2))) + 1)*w + 2*((i//3)%(w//2)) + 1)*3 + i%3)*7
      |       + doc_id) % 251) // 4
      |  FOR i IN range((w//2)*(h//2)*3)]) AS BIGINT) AS pooled_sum,
      | TRUE AS roundtrip_ok
      |FROM dims ORDER BY doc_id""".stripMargin

  // ---- m24: letterbox/pillarbox border detection + crop geometry ----------
  /** Per-image border-detection row: detected border thicknesses, crop
    * geometry, and the decoded interior pixel mass. */
  case class Letterbox(doc_id: Long, format: String, width: Int, height: Int,
                       top_px: Int, bottom_px: Int, left_px: Int,
                       right_px: Int, crop_w: Int, crop_h: Int,
                       border_permille: Long, interior_sum: Long)

  /** Fixture contract for the bordered corpus (shared verbatim with the
    * oracle): full dims from [[fixtureDims]]; planted border thicknesses
    * top = id%4, bottom = (id*3)%4, left = (id*5)%3, right = (id*7)%3,
    * all border pixels 0; interior pixel (y,x,c) of the (cw x ch) window
    * = (((y*cw + x)*3 + c)*7 + id) % 251; even id encodes BMP, odd PNG. */
  private def letterboxPayload(id: Long): Array[Byte] = {
    val (w, h) = fixtureDims(id)
    val (tb, bb) = ((id % 4).toInt, ((id * 3) % 4).toInt)
    val (lb, rb) = (((id * 5) % 3).toInt, ((id * 7) % 3).toInt)
    val (cw, ch) = (w - lb - rb, h - tb - bb)
    val px = new Array[Byte](w * h * 3) // zero-initialized = border color
    var y = 0
    while (y < ch) {
      var x = 0
      while (x < cw) {
        var c = 0
        while (c < 3) {
          px(((y + tb) * w + (x + lb)) * 3 + c) =
            ((((y.toLong * cw + x) * 3 + c) * 7 + id) % 251).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    if (id % 2 == 0) ImageCodecs.encodeBmp(w, h, px)
    else ImageCodecs.encodePng(w, h, px)
  }

  private val lbFixtures = scala.collection.concurrent.TrieMap[String, String]()
  private def letterboxTable(s: org.apache.spark.sql.SparkSession,
                             dir: String): org.apache.spark.sql.DataFrame = {
    val path = lbFixtures.getOrElseUpdate(dir, {
      implicit val enc: Encoder[MediaPayload] = Encoders.product[MediaPayload]
      implicit val encL: Encoder[Long] = Encoders.scalaLong
      val out = fixtureTempDir("graft_media_letterbox")
      t(s, dir, "documents").filter(col("doc_id") <= 100)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => MediaPayload(id, letterboxPayload(id))))
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  /** Generic border detection over decoded pixels — no knowledge of the
    * plant: a border row/column is a maximal run of uniform lines from the
    * edge matching the edge's corner color (rows first, then columns
    * within the row-cropped window — the nesting a real letterbox has). */
  private def detectBorders(r: MediaPayload): Letterbox = {
    val fmt = if (r.data.length >= 2 && r.data(0) == 'B' && r.data(1) == 'M')
      "bmp" else "png"
    val img = ImageCodecs.decode(r.data)
    val (w, h) = (img.width, img.height)
    val px = img.rgb
    def p(y: Int, x: Int, c: Int): Int = px((y * w + x) * 3 + c) & 0xff
    def rowUniform(y: Int): Boolean = {
      val (r0, g0, b0) = (p(y, 0, 0), p(y, 0, 1), p(y, 0, 2))
      var x = 1
      while (x < w) {
        if (p(y, x, 0) != r0 || p(y, x, 1) != g0 || p(y, x, 2) != b0)
          return false
        x += 1
      }
      true
    }
    def sameColor(y1: Int, x1: Int, y2: Int, x2: Int): Boolean =
      p(y1, x1, 0) == p(y2, x2, 0) && p(y1, x1, 1) == p(y2, x2, 1) &&
        p(y1, x1, 2) == p(y2, x2, 2)
    var top = 0
    while (top < h - 1 && rowUniform(top) && sameColor(top, 0, 0, 0)) top += 1
    var bottom = 0
    while (bottom < h - 1 - top && rowUniform(h - 1 - bottom) &&
      sameColor(h - 1 - bottom, 0, h - 1, 0)) bottom += 1
    def colUniform(x: Int): Boolean = {
      val (r0, g0, b0) = (p(top, x, 0), p(top, x, 1), p(top, x, 2))
      var y = top + 1
      while (y < h - bottom) {
        if (p(y, x, 0) != r0 || p(y, x, 1) != g0 || p(y, x, 2) != b0)
          return false
        y += 1
      }
      true
    }
    var left = 0
    while (left < w - 1 && colUniform(left) && sameColor(top, left, top, 0))
      left += 1
    var right = 0
    while (right < w - 1 - left && colUniform(w - 1 - right) &&
      sameColor(top, w - 1 - right, top, w - 1)) right += 1
    val (cw, ch) = (w - left - right, h - top - bottom)
    var isum = 0L
    var y = top
    while (y < h - bottom) {
      var x = left
      while (x < w - right) {
        var c = 0
        while (c < 3) { isum += p(y, x, c); c += 1 }
        x += 1
      }
      y += 1
    }
    Letterbox(r.doc_id, fmt, w, h, top, bottom, left, right, cw, ch,
      (w.toLong * h - cw.toLong * ch) * 1000L / (w.toLong * h), isum)
  }

  /** m24: the crop-geometry audit every image-curation pipeline runs before
    * training-resolution resize — letterboxed/pillarboxed frames waste
    * pixels and skew aspect-ratio statistics, so the pipeline detects
    * uniform borders and records the content crop box. Borders are PLANTED
    * through the real encoders at per-image thicknesses (including the
    * zero-border case, id % 12 == 0) and detected GENERICALLY from decoded
    * pixels (uniform-line runs anchored at the corners — the detector
    * never sees the plant contract); the oracle replays the contract in
    * closed form, including the interior pixel mass, so a stride, BGR,
    * bottom-up, or off-by-one crop bug at either edge diverges.
    *
    * Scale shape: one typed map-only decode+scan pass per image; only the
    * presentation sort shuffles. */
  private val m24: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[Letterbox] = Encoders.product[Letterbox]
    letterboxTable(s, dir).as[MediaPayload]
      .mapPartitions(_.map(detectBorders)).toDF()
      .psort(col("doc_id"))
  }

  // geometry + interior mass replayed from the plant contract; the engine
  // side DETECTED them from real decoded containers
  private val m24Sql =
    """WITH g AS (
      |  SELECT doc_id,
      |    8 + doc_id % 56 AS w, 8 + (doc_id*7) % 40 AS h,
      |    doc_id % 4 AS t, (doc_id*3) % 4 AS b,
      |    (doc_id*5) % 3 AS l, (doc_id*7) % 3 AS r
      |  FROM documents WHERE doc_id <= 100)
      |SELECT doc_id,
      | CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS format,
      | CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
      | CAST(t AS INTEGER) AS top_px, CAST(b AS INTEGER) AS bottom_px,
      | CAST(l AS INTEGER) AS left_px, CAST(r AS INTEGER) AS right_px,
      | CAST(w - l - r AS INTEGER) AS crop_w,
      | CAST(h - t - b AS INTEGER) AS crop_h,
      | CAST((w*h - (w-l-r)*(h-t-b)) * 1000 // (w*h) AS BIGINT)
      |   AS border_permille,
      | CAST(LIST_SUM([(i*7 + doc_id) % 251
      |   FOR i IN RANGE((w-l-r)*(h-t-b)*3)]) AS BIGINT) AS interior_sum
      |FROM g ORDER BY doc_id""".stripMargin

  // ---- m25: ViT-style patch extraction (4x4 grid explode) -----------------
  /** One 4x4-pixel patch of a decoded image: grid position, the exact
    * pixel-byte sum over the 48-byte block, and its floored mean. */
  case class ImgPatch(doc_id: Long, py: Int, px: Int, patch_sum: Long,
                      patch_mean_q: Int)

  /** m25: the patchify stage every vision-transformer pipeline runs —
    * decode, cut the image into a non-overlapping 4x4 patch grid (partial
    * edge patches dropped, the standard floor grid), and emit one row per
    * patch with its exact pixel mass. This is the EXPLODE shape of media
    * preprocessing (rows multiply per input, unlike m23's per-image
    * reduce); downstream a linear projection turns each patch row into a
    * token. The oracle replays every patch sum in closed form from the
    * fixture pixel contract, so a stride/BGR/bottom-up mis-parse or an
    * off-by-one in the grid arithmetic diverges on some patch.
    *
    * Scale shape: one typed map-only decode+flatMap pass; output rows are
    * (w/4 x h/4) per image — the explode is bounded by pixel count, runs
    * partition-parallel, and nothing shuffles but the presentation sort. */
  private val m25: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[ImgPatch] = Encoders.product[ImgPatch]
    mediaTable(s, dir).filter(col("doc_id") <= 20).as[MediaPayload]
      .mapPartitions(_.flatMap { r =>
        val img = ImageCodecs.decode(r.data)
        val (w, h) = (img.width, img.height)
        val px = img.rgb
        for (py <- (0 until h / 4).iterator; qx <- (0 until w / 4).iterator)
          yield {
            var sum = 0L
            var dy = 0
            while (dy < 4) {
              var dx = 0
              while (dx < 4) {
                var c = 0
                while (c < 3) {
                  sum += px(((4 * py + dy) * w + 4 * qx + dx) * 3 + c) & 0xff
                  c += 1
                }
                dx += 1
              }
              dy += 1
            }
            ImgPatch(r.doc_id, py, qx, sum, (sum / 48).toInt)
          }
      }).toDF()
      .psort(col("doc_id"), col("py"), col("px"))
  }

  // patch (py,px) sum = sum over the 48-byte block of the fixture pixel
  // formula; j decomposes as dy=j//12, dx=(j//3)%4, c=j%3
  private val m25Sql =
    """WITH g AS (
      |  SELECT doc_id, 8 + doc_id % 56 AS w, 8 + (doc_id*7) % 40 AS h
      |  FROM documents WHERE doc_id <= 20),
      |pi AS (
      |  SELECT doc_id, w, h, UNNEST(RANGE((w//4)*(h//4))) AS i FROM g)
      |SELECT doc_id,
      | CAST(i // (w//4) AS INTEGER) AS py,
      | CAST(i % (w//4) AS INTEGER) AS px,
      | CAST(LIST_SUM([
      |   ((((4*(i//(w//4)) + j//12) * w + 4*(i%(w//4)) + (j//3)%4)*3
      |     + j%3)*7 + doc_id) % 251
      |  FOR j IN RANGE(48)]) AS BIGINT) AS patch_sum,
      | CAST(LIST_SUM([
      |   ((((4*(i//(w//4)) + j//12) * w + 4*(i%(w//4)) + (j//3)%4)*3
      |     + j%3)*7 + doc_id) % 251
      |  FOR j IN RANGE(48)]) // 48 AS INTEGER) AS patch_mean_q
      |FROM pi ORDER BY doc_id, py, px""".stripMargin

  // ---- m26: aspect-ratio bucketing for batched training --------------------
  /** m26: the aspect-ratio bucketing step diffusion/vision training runs —
    * variable-AR images can't batch together, so each image routes to the
    * NEAREST bucket of a fixed ratio ladder (1:2, 3:4, 1:1, 4:3, 3:2, 2:1)
    * and the planner reports per bucket the image count, pixel mass, how
    * many full batches (size 4) it fills, and the fill permille (the
    * remainder is padding waste). Nearness is decided in EXACT integer
    * arithmetic: |w/h - p/q| ranks as |w*q - h*p| * (12/q) (12 = lcm of
    * the ladder denominators), ties to the lexicographically first bucket
    * — no float comparisons, so both engines rank identically. Dims come
    * from the REAL decoded containers; the oracle replays the contract.
    *
    * Scale shape: one typed map-only decode pass, a 6-row broadcast ladder
    * cross join, a per-image WindowGroupLimit argmin, one 6-row agg. */
  private val m26: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[DecodedImage] = Encoders.product[DecodedImage]
    import s.implicits._
    val dims = mediaTable(s, dir).as[MediaPayload]
      .mapPartitions(_.map(decodeOne)).toDF()
      .select(col("doc_id"), col("width").as("w"), col("height").as("h"))
    val ladder = Seq(("1:2", 1, 2, 6), ("3:4", 3, 4, 3), ("1:1", 1, 1, 12),
      ("4:3", 4, 3, 4), ("3:2", 3, 2, 6), ("2:1", 2, 1, 12))
      .toDF("bucket", "p", "q", "m")
    val scored = dims.crossJoin(broadcast(ladder))
      .withColumn("score",
        abs(col("w") * col("q") - col("h") * col("p")) * col("m"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score"), col("bucket"))
    scored.withColumn("rn", row_number().over(win)).filter(col("rn") === 1)
      .groupBy(col("bucket")).agg(
        count(lit(1)).as("n_images"),
        sum((col("w") * col("h") * 3L).cast("long")).as("total_px"),
        expr("count(1) div 4").as("n_batches"),
        expr("(count(1) div 4) * 4 * 1000 div count(1)").as("fill_permille"))
      .psort(col("bucket"))
  }

  private val m26Sql =
    """WITH g AS (
      |  SELECT doc_id, 8 + doc_id % 56 AS w, 8 + (doc_id*7) % 40 AS h
      |  FROM documents WHERE doc_id <= 100),
      |l(bucket, p, q, m) AS (VALUES
      |  ('1:2', 1, 2, 6), ('3:4', 3, 4, 3), ('1:1', 1, 1, 12),
      |  ('4:3', 4, 3, 4), ('3:2', 3, 2, 6), ('2:1', 2, 1, 12)),
      |sc AS (
      |  SELECT doc_id, w, h, bucket,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY ABS(w*q - h*p) * m, bucket) AS rn
      |  FROM g CROSS JOIN l)
      |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_images,
      |  CAST(SUM(w*h*3) AS BIGINT) AS total_px,
      |  CAST(COUNT(*) // 4 AS BIGINT) AS n_batches,
      |  CAST((COUNT(*) // 4) * 4 * 1000 // COUNT(*) AS BIGINT)
      |    AS fill_permille
      |FROM sc WHERE rn = 1 GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---- m27: fake-stereo detection (duplicated-mono audit) -----------------
  /** Per-clip stereo-difference row: exact integer inter-channel stats. */
  case class StereoAudit(doc_id: Long, n_frames: Int, sum_absdiff: Long,
                         max_absdiff: Int, mono_dup: Boolean)

  /** Fixture contract (shared verbatim with the oracle): stereo clips only
    * (all ids <= 100 encode 2 channels here); rate 8/12/16 kHz by id%3,
    * 500-749 frames; TRUE stereo interleaves sample i = (i*13+id)%2001-1000;
    * planted FAKE stereo (id % 6 == 1) duplicates the mono frame signal
    * f = (f*13+id)%2001-1000 into both channels. */
  private def stereoPayload(id: Long): Array[Byte] = {
    val rate = 8000 + (id % 3).toInt * 4000
    val nFrames = 500 + (id % 250).toInt
    val samples = new Array[Short](nFrames * 2)
    var i = 0
    if (id % 6 == 1) {
      while (i < nFrames) {
        val v = ((i.toLong * 13 + id) % 2001 - 1000).toShort
        samples(2 * i) = v
        samples(2 * i + 1) = v
        i += 1
      }
    } else {
      while (i < samples.length) {
        samples(i) = ((i.toLong * 13 + id) % 2001 - 1000).toShort
        i += 1
      }
    }
    AudioCodecs.encodeWav(rate, 2, samples)
  }

  private val stereoFixtures = scala.collection.concurrent.TrieMap[String, String]()
  private def stereoTable(s: org.apache.spark.sql.SparkSession,
                          dir: String): org.apache.spark.sql.DataFrame = {
    val path = stereoFixtures.getOrElseUpdate(dir, {
      implicit val enc: Encoder[MediaPayload] = Encoders.product[MediaPayload]
      implicit val encL: Encoder[Long] = Encoders.scalaLong
      val out = fixtureTempDir("graft_stereo_fixture")
      t(s, dir, "documents").filter(col("doc_id") <= 100)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => MediaPayload(id, stereoPayload(id))))
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  /** m27: the fake-stereo audit an audio-curation pipeline runs before
    * dedup and storage tiering — a "stereo" clip whose channels are
    * byte-identical is a mono recording wearing a stereo container (twice
    * the storage, and a near-dup of its mono original that channel-naive
    * hashing misses). Detection is GENERIC over real decoded WAV frames:
    * the exact integer sum and max of |L-R| per clip; sum == 0 is the
    * duplicated-mono verdict. The oracle replays both signal contracts in
    * closed form, so an interleave/offset/endianness mis-parse diverges.
    *
    * Scale shape: one typed map-only decode pass per clip; only the
    * presentation sort shuffles. */
  private val m27: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[StereoAudit] = Encoders.product[StereoAudit]
    stereoTable(s, dir).as[MediaPayload]
      .mapPartitions(_.map { r =>
        val a = AudioCodecs.decodeWav(r.data)
        val n = a.samples.length / a.channels
        var sum = 0L
        var mx = 0
        var f = 0
        while (f < n) {
          val d = math.abs(a.samples(2 * f) - a.samples(2 * f + 1))
          sum += d
          if (d > mx) mx = d
          f += 1
        }
        StereoAudit(r.doc_id, n, sum, mx, sum == 0L)
      }).toDF()
      .psort(col("doc_id"))
  }

  // |L-R| of true stereo frame f = |s(2f) - s(2f+1)|, s(i)=(i*13+id)%2001-1000
  private val m27Sql =
    """WITH g AS (
      |  SELECT doc_id, 500 + doc_id % 250 AS nf
      |  FROM documents WHERE doc_id <= 100)
      |SELECT doc_id, CAST(nf AS INTEGER) AS n_frames,
      | CAST(CASE WHEN doc_id % 6 = 1 THEN 0
      |   ELSE LIST_SUM([ABS(((2*f*13 + doc_id) % 2001 - 1000)
      |     - (((2*f + 1)*13 + doc_id) % 2001 - 1000)) FOR f IN RANGE(nf)])
      |   END AS BIGINT) AS sum_absdiff,
      | CAST(CASE WHEN doc_id % 6 = 1 THEN 0
      |   ELSE LIST_MAX([ABS(((2*f*13 + doc_id) % 2001 - 1000)
      |     - (((2*f + 1)*13 + doc_id) % 2001 - 1000)) FOR f IN RANGE(nf)])
      |   END AS INTEGER) AS max_absdiff,
      | doc_id % 6 = 1 AS mono_dup
      |FROM g ORDER BY doc_id""".stripMargin

  // ---- m28: dominant-color extraction (palette audit) ----------------------
  /** Per-image palette row: exact distinct-color count, the dominant color
    * (packed r<<16|g<<8|b, ties to the smallest id), and coverage. */
  case class Palette(doc_id: Long, n_px: Int, n_colors: Int, top_color: Long,
                     top_permille: Long, top4_permille: Long)

  /** m28: the dominant-color/palette audit image curation runs (flat-color
    * and low-palette images are synthetic/logo/screenshot signals, and the
    * dominant color feeds cheap near-dup blocking): per image the exact
    * distinct RGB count over the REAL decoded pixels, the most frequent
    * color with permille coverage, and the top-4 coverage. Exact integer
    * counting end to end; the oracle replays the pixel contract through a
    * real per-color GROUP BY, so the engine's in-JVM histogram must agree
    * with a full relational recount.
    *
    * Scale shape: one typed map-only decode+histogram pass per image (the
    * histogram lives in the task, never exploded into rows); only the
    * presentation sort shuffles. */
  private val m28: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[Palette] = Encoders.product[Palette]
    mediaTable(s, dir).as[MediaPayload]
      .mapPartitions(_.map { r =>
        val img = ImageCodecs.decode(r.data)
        val n = img.rgb.length / 3
        val hist = new java.util.HashMap[Long, Long]()
        var p = 0
        while (p < n) {
          val cid = ((img.rgb(3 * p) & 0xffL) << 16) |
            ((img.rgb(3 * p + 1) & 0xffL) << 8) | (img.rgb(3 * p + 2) & 0xffL)
          hist.merge(cid, 1L, (a, b) => a + b)
          p += 1
        }
        import scala.jdk.CollectionConverters._
        val sorted = hist.asScala.toArray.sortBy { case (cid, c) => (-c, cid) }
        val top4 = sorted.take(4).map(_._2).sum
        Palette(r.doc_id, n, hist.size, sorted.head._1,
          sorted.head._2 * 1000L / n, top4 * 1000L / n)
      }).toDF()
      .psort(col("doc_id"))
  }

  // pixel p's color = ((3p*7+id)%251, ((3p+1)*7+id)%251, ((3p+2)*7+id)%251)
  private val m28Sql =
    """WITH g AS (
      |  SELECT doc_id, 8 + doc_id % 56 AS w, 8 + (doc_id*7) % 40 AS h
      |  FROM documents WHERE doc_id <= 100),
      |px AS (
      |  SELECT doc_id, w*h AS npx, UNNEST([
      |    ((3*p*7 + doc_id) % 251) * 65536
      |      + (((3*p + 1)*7 + doc_id) % 251) * 256
      |      + ((3*p + 2)*7 + doc_id) % 251
      |    FOR p IN RANGE(w*h)]) AS cid
      |  FROM g),
      |cnt AS (
      |  SELECT doc_id, npx, cid, COUNT(*) AS n FROM px GROUP BY 1, 2, 3),
      |rk AS (
      |  SELECT doc_id, npx, cid, n,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, cid) AS rn
      |  FROM cnt)
      |SELECT doc_id,
      |  CAST(MAX(npx) AS INTEGER) AS n_px,
      |  CAST(COUNT(*) AS INTEGER) AS n_colors,
      |  CAST(MAX(CASE WHEN rn = 1 THEN cid END) AS BIGINT) AS top_color,
      |  CAST(MAX(CASE WHEN rn = 1 THEN n END) * 1000 // MAX(npx) AS BIGINT)
      |    AS top_permille,
      |  CAST(SUM(CASE WHEN rn <= 4 THEN n ELSE 0 END) * 1000 // MAX(npx)
      |    AS BIGINT) AS top4_permille
      |FROM rk GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- m29: sharpness audit (Laplacian response) ---------------------------
  /** Per-image sharpness row: exact integer 4-neighbor Laplacian stats. */
  case class Sharpness(doc_id: Long, n_interior: Int, lap_sse: Long,
                       max_abs_lap: Int, sharp_permille: Long)

  /** m29: the blur/sharpness gate image curation runs before training —
    * blurry or flat images carry little signal, and the standard cheap
    * detector is the variance/energy of the discrete Laplacian. Here the
    * 4-neighbor Laplacian runs over the REAL decoded pixels in exact
    * integer arithmetic: per image the interior count, the summed squared
    * response, the max |L|, and the permille of interior pixels with a
    * non-zero response. The fixture's pixel field is locally linear
    * (steps of 7 per channel index), so the Laplacian is zero EXCEPT at
    * mod-251 wrap seams — the oracle replays those seams exactly, so a
    * neighbor-offset or stride bug changes the seam pattern and diverges.
    *
    * Scale shape: one typed map-only decode+convolution pass per image;
    * only the presentation sort shuffles. */
  private val m29: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[Sharpness] = Encoders.product[Sharpness]
    mediaTable(s, dir).as[MediaPayload]
      .mapPartitions(_.map { r =>
        val img = ImageCodecs.decode(r.data)
        val (w, h) = (img.width, img.height)
        def p(y: Int, x: Int, c: Int): Int = img.rgb((y * w + x) * 3 + c) & 0xff
        var sse = 0L
        var mx = 0
        var nz = 0L
        var y = 1
        while (y < h - 1) {
          var x = 1
          while (x < w - 1) {
            var c = 0
            while (c < 3) {
              val l = 4 * p(y, x, c) - p(y - 1, x, c) - p(y + 1, x, c) -
                p(y, x - 1, c) - p(y, x + 1, c)
              sse += l.toLong * l
              val a = math.abs(l)
              if (a > mx) mx = a
              if (l != 0) nz += 1
              c += 1
            }
            x += 1
          }
          y += 1
        }
        val n = (w - 2) * (h - 2) * 3
        Sharpness(r.doc_id, n, sse, mx, nz * 1000L / n)
      }).toDF()
      .psort(col("doc_id"))
  }

  // interior index j: y = 1 + j//(3*(w-2)), x = 1 + (j//3)%(w-2), c = j%3;
  // p(y,x) = (((y*w+x)*3 + j%3)*7 + doc_id) % 251
  private val m29Sql: String = {
    def p(y: String, x: String) =
      s"(((($y)*w + ($x))*3 + j%3)*7 + doc_id) % 251"
    val Y = "1 + j//(3*(w-2))"
    val X = "1 + (j//3)%(w-2)"
    val lap = s"(4*(${p(Y, X)}) - (${p(s"($Y) - 1", X)}) - " +
      s"(${p(s"($Y) + 1", X)}) - (${p(Y, s"($X) - 1")}) - " +
      s"(${p(Y, s"($X) + 1")}))"
    s"""WITH g AS (
       |  SELECT doc_id, 8 + doc_id % 56 AS w, 8 + (doc_id*7) % 40 AS h
       |  FROM documents WHERE doc_id <= 100)
       |SELECT doc_id,
       | CAST((w-2)*(h-2)*3 AS INTEGER) AS n_interior,
       | CAST(LIST_SUM([$lap * $lap
       |   FOR j IN RANGE((w-2)*(h-2)*3)]) AS BIGINT) AS lap_sse,
       | CAST(LIST_MAX([ABS($lap)
       |   FOR j IN RANGE((w-2)*(h-2)*3)]) AS INTEGER) AS max_abs_lap,
       | CAST(LIST_SUM([CASE WHEN $lap <> 0 THEN 1 ELSE 0 END
       |   FOR j IN RANGE((w-2)*(h-2)*3)]) * 1000 // ((w-2)*(h-2)*3)
       |   AS BIGINT) AS sharp_permille
       |FROM g ORDER BY doc_id""".stripMargin
  }

  // ---- m30: indexed-color (palette) PNG decode -----------------------------
  /** m30: PALETTE PNG decode — the second PNG color type a crawl actually
    * contains (icons, screenshots, charts land as type-3 indexed PNGs).
    * The fixture encodes REAL indexed PNGs (PLTE chunk + 1-byte-per-pixel
    * filtered scanlines, all five filters rotating); the op decodes them
    * through the full chunk walk + filter reconstruction at the 1-byte
    * stride + palette resolution, and emits exact-integer facts: header
    * dims, PLTE entry count, decoded RGB byte mass, and the number of
    * DISTINCT decoded colors. doc_id % 13 == 9 plants k = 13 palettes
    * whose index formula (p*13+id) % 13 collapses to ONE used color — a
    * decoder that shortcuts the palette lookup or the filter stride gets
    * the mass and the distinct count wrong.
    *
    * Fixture contract (replayed in closed form by the oracle):
    * w = 8 + id%40, h = 8 + (id*5)%32, k = 4 + id%13 palette entries,
    * palette[j][c] = (j*37 + c*11 + id) % 256, index(p) = (p*13 + id) % k.
    *
    * Scale shape: one map-only decode pass over the fixture scan (typed
    * Dataset, mapPartitions) — no shuffle before the presentation sort. */
  private def paletteSpec(id: Long): (Int, Int, Int) =
    ((8 + id % 40).toInt, (8 + (id * 5) % 32).toInt, (4 + id % 13).toInt)

  private def palettePayload(id: Long): Array[Byte] = {
    val (w, h, k) = paletteSpec(id)
    val palette = new Array[Byte](k * 3)
    var j = 0
    while (j < k) {
      var c = 0
      while (c < 3) {
        palette(j * 3 + c) = ((j * 37 + c * 11 + id) % 256).toByte
        c += 1
      }
      j += 1
    }
    val idx = new Array[Byte](w * h)
    var p = 0
    while (p < w * h) {
      idx(p) = ((p * 13 + id) % k).toByte
      p += 1
    }
    ImageCodecs.encodePngPalette(w, h, idx, palette)
  }

  private val paletteFixtures = scala.collection.concurrent.TrieMap[String, String]()
  private def paletteTable(s: org.apache.spark.sql.SparkSession,
                           dir: String): org.apache.spark.sql.DataFrame = {
    val path = paletteFixtures.getOrElseUpdate(dir, {
      implicit val enc: Encoder[MediaPayload] = Encoders.product[MediaPayload]
      implicit val encL: Encoder[Long] = Encoders.scalaLong
      val out = fixtureTempDir("graft_palette_fixture")
      t(s, dir, "documents").filter(col("doc_id") <= 100)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => MediaPayload(id, palettePayload(id))))
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  case class PalettePng(doc_id: Long, width: Int, height: Int,
                        n_palette: Int, rgb_mass: Long, n_used: Int)

  private def decodePaletteOne(r: MediaPayload): PalettePng = {
    val img = ImageCodecs.decode(r.data)
    val nPal = ImageCodecs.pngPaletteSize(r.data)
    var mass = 0L
    val seen = new java.util.HashSet[Integer]()
    var p = 0
    val n = img.width * img.height
    while (p < n) {
      val r0 = img.rgb(p * 3) & 0xff
      val g = img.rgb(p * 3 + 1) & 0xff
      val b = img.rgb(p * 3 + 2) & 0xff
      mass += r0 + g + b
      seen.add((r0 << 16) | (g << 8) | b)
      p += 1
    }
    PalettePng(r.doc_id, img.width, img.height, nPal, mass, seen.size)
  }

  private val m30: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[PalettePng] = Encoders.product[PalettePng]
    paletteTable(s, dir).as[MediaPayload]
      .mapPartitions(_.map(decodePaletteOne)).toDF()
      .psort(col("doc_id"))
  }

  private val m30Sql =
    """WITH g AS (
      |  SELECT doc_id, 8 + doc_id % 40 AS w, 8 + (doc_id * 5) % 32 AS h,
      |    4 + doc_id % 13 AS k
      |  FROM documents WHERE doc_id <= 100)
      |SELECT doc_id,
      | CAST(w AS INTEGER) AS width,
      | CAST(h AS INTEGER) AS height,
      | CAST(k AS INTEGER) AS n_palette,
      | CAST(LIST_SUM([
      |     ((((p * 13 + doc_id) % k) * 37 + doc_id) % 256)
      |   + ((((p * 13 + doc_id) % k) * 37 + 11 + doc_id) % 256)
      |   + ((((p * 13 + doc_id) % k) * 37 + 22 + doc_id) % 256)
      |   FOR p IN RANGE(w * h)]) AS BIGINT) AS rgb_mass,
      | CAST(LEN(LIST_DISTINCT([(p * 13 + doc_id) % k
      |   FOR p IN RANGE(w * h)])) AS INTEGER) AS n_used
      |FROM g ORDER BY doc_id""".stripMargin

  // ---- m31: spectral peak detection (64-point integer DFT) ------------------
  /** m31: SPECTRAL PEAK — the frequency-domain twin of m09's time-domain
    * features: a 64-point DFT over the first 64 PCM samples of each clip,
    * power at bins 1..16, report the peak bin (the detected tone). The
    * fixture plants a square wave whose half-period (and thus fundamental
    * bin 64/(2*half)) is doc-dependent, so the detector has a ground truth
    * to land on and a header/PCM mis-parse moves real energy between bins.
    *
    * All arithmetic is exact integers: the twiddle tables are
    * round(cos|sin(2*pi*m/64) * 2^14) inlined as the SAME literals into
    * both dialects, power = re^2 + im^2 in 64-bit (max |re| is
    * 64*800*16384 = 8.4e8, square 7.1e17 — no overflow), so the oracle
    * replays the spectrum bit-for-bit from the closed-form samples while
    * the engine computes it from the DECODED WAV bytes.
    *
    * Scale shape: map-only typed pass over the media table (decode + 2048
    * multiply-adds per clip), one presentation sort. Bounded by the read
    * at any corpus size. */
  private val dftCos: IndexedSeq[Long] =
    (0 until 64).map(m => Math.round(math.cos(2 * math.Pi * m / 64) * 16384))
  private val dftSin: IndexedSeq[Long] =
    (0 until 64).map(m => Math.round(math.sin(2 * math.Pi * m / 64) * 16384))

  /** Tone fixture: mono 8 kHz, 128 frames; square wave sample
    * i = +-amp with half-period `half` — amp = 500 + doc_id%300,
    * half = 2 + doc_id%5. */
  private def tonePayload(docId: Long): Array[Byte] = {
    val half = 2 + (docId % 5).toInt
    val amp = 500 + (docId % 300).toInt
    val samples = new Array[Short](128)
    var i = 0
    while (i < samples.length) {
      samples(i) = (if ((i / half) % 2 == 0) amp else -amp).toShort
      i += 1
    }
    AudioCodecs.encodeWav(8000, 1, samples)
  }

  private val toneFixtures = scala.collection.concurrent.TrieMap[String, String]()

  private def toneTable(s: org.apache.spark.sql.SparkSession,
                        dir: String): org.apache.spark.sql.DataFrame = {
    val path = toneFixtures.getOrElseUpdate(dir, {
      implicit val enc: Encoder[MediaPayload] = Encoders.product[MediaPayload]
      implicit val encL: Encoder[Long] = Encoders.scalaLong
      val out = fixtureTempDir("graft_tone_fixture")
      t(s, dir, "documents").filter(col("doc_id") <= 80)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => MediaPayload(id, tonePayload(id))))
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  case class ToneSpectrum(doc_id: Long, half: Int, amp: Int, dc_sum: Long,
                          peak_bin: Int, peak_pow: Long)

  private def analyzeToneOne(r: MediaPayload): ToneSpectrum = {
    val a = AudioCodecs.decodeWav(r.data)
    val x = new Array[Long](64)
    var i = 0
    while (i < 64) { x(i) = a.samples(i).toLong; i += 1 }
    var dc = 0L
    i = 0
    while (i < 64) { dc += x(i); i += 1 }
    var bestK = 0
    var bestP = -1L
    var k = 1
    while (k <= 16) {
      var re = 0L
      var im = 0L
      var n = 0
      while (n < 64) {
        val m = (k * n) % 64
        re += x(n) * dftCos(m)
        im += x(n) * dftSin(m)
        n += 1
      }
      val p = re * re + im * im
      if (p > bestP) { bestP = p; bestK = k } // strict > keeps smallest bin on tie
      k += 1
    }
    // amp/half re-derived from the decoded signal itself (not the doc_id):
    // amp = |first sample|, half = run length of the first plateau
    val amp = math.abs(x(0)).toInt
    var half = 1
    while (half < 64 && x(half) == x(0)) half += 1
    ToneSpectrum(r.doc_id, half, amp, dc, bestK, bestP)
  }

  private val m31: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[ToneSpectrum] = Encoders.product[ToneSpectrum]
    toneTable(s, dir).as[MediaPayload]
      .mapPartitions(_.map(analyzeToneOne)).toDF()
      .psort(col("doc_id"))
  }

  private val m31Sql = {
    val ct = dftCos.mkString("[", ", ", "]")
    val st = dftSin.mkString("[", ", ", "]")
    s"""WITH g AS (
       |  SELECT doc_id, 2 + CAST(doc_id % 5 AS INTEGER) AS half,
       |    500 + CAST(doc_id % 300 AS INTEGER) AS amp
       |  FROM documents WHERE doc_id <= 80),
       |consts AS (SELECT $ct AS ct, $st AS st),
       |terms AS (
       |  SELECT doc_id, half, amp, k.range AS k, n.range AS n,
       |    CASE WHEN ((n.range // half) % 2) = 0 THEN amp ELSE -amp END AS x
       |  FROM g, RANGE(1, 17) k, RANGE(64) n),
       |spec AS (
       |  SELECT doc_id, half, amp, k,
       |    CAST(SUM(x * ct[((k * n) % 64) + 1]) AS BIGINT) AS re,
       |    CAST(SUM(x * st[((k * n) % 64) + 1]) AS BIGINT) AS im
       |  FROM terms, consts GROUP BY 1, 2, 3, 4),
       |ranked AS (
       |  SELECT doc_id, half, amp, k, re * re + im * im AS pow,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id
       |      ORDER BY re * re + im * im DESC, k) AS rnk
       |  FROM spec),
       |dc AS (
       |  SELECT doc_id, CAST(SUM(x) AS BIGINT) AS dc_sum
       |  FROM terms WHERE k = 1 GROUP BY doc_id)
       |SELECT r.doc_id, CAST(half AS INTEGER) AS half,
       |  CAST(amp AS INTEGER) AS amp, dc_sum,
       |  CAST(k AS INTEGER) AS peak_bin, CAST(pow AS BIGINT) AS peak_pow
       |FROM ranked r JOIN dc USING (doc_id)
       |WHERE rnk = 1 ORDER BY r.doc_id""".stripMargin
  }

  // ---- m32: cross-modal caption alignment -------------------------------
  /** Per-image dominant-channel color word from the REAL decoded pixels. */
  case class ImgColor(doc_id: Long, img_color: String)

  /** m32: image-caption alignment — the cross-modal gate a multimodal
    * training pipeline runs before pairing images with text (CLIP-style
    * corpora drop pairs whose caption contradicts cheap visual evidence).
    * The visual side is REAL: decode the image, build the exact color
    * histogram (the m28 contract), take the dominant color's argmax
    * channel as a color word (ties r > g > b). The text side derives a
    * deterministic caption color from doc_id (the x17/x30 planting
    * convention — the corpus has no organic captions); `aligned` flags
    * agreement. The oracle replays the dominant color analytically from
    * the fixture's pixel formula, so a decode, histogram, or channel-order
    * bug flips color words and diverges.
    *
    * Scale shape: one typed map-only decode+histogram pass per image,
    * then ONE doc_id equi-join against the text table — both sides keyed
    * by doc_id, so at 100 TB the join is co-partitioned (or broadcast,
    * images being the curated small side); only the presentation sort
    * shuffles beyond it. */
  private val m32: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[ImgColor] = Encoders.product[ImgColor]
    val imgs = mediaTable(s, dir).as[MediaPayload]
      .mapPartitions(_.map { r =>
        val img = ImageCodecs.decode(r.data)
        val n = img.rgb.length / 3
        val hist = new java.util.HashMap[Long, Long]()
        var p = 0
        while (p < n) {
          val cid = ((img.rgb(3 * p) & 0xffL) << 16) |
            ((img.rgb(3 * p + 1) & 0xffL) << 8) | (img.rgb(3 * p + 2) & 0xffL)
          hist.merge(cid, 1L, (a, b) => a + b)
          p += 1
        }
        import scala.jdk.CollectionConverters._
        val top = hist.asScala.toArray
          .sortBy { case (cid, c) => (-c, cid) }.head._1
        val rr = (top >> 16) & 0xff
        val gg = (top >> 8) & 0xff
        val bb = top & 0xff
        val word = if (rr >= gg && rr >= bb) "red"
          else if (gg >= bb) "green" else "blue"
        ImgColor(r.doc_id, word)
      }).toDF()
    val caps = t(s, dir, "documents").filter(col("doc_id") <= 100)
      .select(col("doc_id"),
        expr("CASE doc_id % 3 WHEN 0 THEN 'red' WHEN 1 THEN 'green' " +
          "ELSE 'blue' END").as("caption_color"),
        expr("size(split(text, ' '))").as("n_tokens"))
    imgs.join(caps, Seq("doc_id"))
      .select(col("doc_id"), col("img_color"), col("caption_color"),
        col("n_tokens"),
        (col("img_color") === col("caption_color")).cast("int").as("aligned"))
      .psort(col("doc_id"))
  }

  // dominant color replayed analytically from the fixture pixel formula
  // (the m28 oracle contract); caption color from the planted arithmetic
  private val m32Sql =
    """WITH g AS (
      |  SELECT doc_id, 8 + doc_id % 56 AS w, 8 + (doc_id*7) % 40 AS h
      |  FROM documents WHERE doc_id <= 100),
      |px AS (
      |  SELECT doc_id, UNNEST([
      |    ((3*p*7 + doc_id) % 251) * 65536
      |      + (((3*p + 1)*7 + doc_id) % 251) * 256
      |      + ((3*p + 2)*7 + doc_id) % 251
      |    FOR p IN RANGE(w*h)]) AS cid
      |  FROM g),
      |cnt AS (SELECT doc_id, cid, COUNT(*) AS n FROM px GROUP BY 1, 2),
      |rk AS (
      |  SELECT doc_id, cid,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, cid) AS rn
      |  FROM cnt),
      |ic AS (
      |  SELECT doc_id,
      |    CASE WHEN (cid // 65536) % 256 >= (cid // 256) % 256
      |           AND (cid // 65536) % 256 >= cid % 256 THEN 'red'
      |         WHEN (cid // 256) % 256 >= cid % 256 THEN 'green'
      |         ELSE 'blue' END AS img_color
      |  FROM rk WHERE rn = 1)
      |SELECT d.doc_id, ic.img_color,
      |  CASE d.doc_id % 3 WHEN 0 THEN 'red' WHEN 1 THEN 'green'
      |    ELSE 'blue' END AS caption_color,
      |  CAST(LEN(STRING_SPLIT(d.text, ' ')) AS INTEGER) AS n_tokens,
      |  CAST(CASE WHEN ic.img_color = (CASE d.doc_id % 3 WHEN 0 THEN 'red'
      |    WHEN 1 THEN 'green' ELSE 'blue' END) THEN 1 ELSE 0 END
      |    AS INTEGER) AS aligned
      |FROM documents d JOIN ic ON d.doc_id = ic.doc_id
      |WHERE d.doc_id <= 100 ORDER BY d.doc_id""".stripMargin

  // ---- m33: Adam7 interlaced PNG decode ----------------------------------
  private val ilFixtures =
    scala.collection.concurrent.TrieMap[String, String]()

  /** Interlaced-PNG fixture: the SAME pixel formula as the main media
    * fixture, containerized through the Adam7 encoder — so the oracle
    * replays positions analytically while the engine must run the real
    * 7-pass reconstruction. */
  private def interlacedTable(s: org.apache.spark.sql.SparkSession,
                              dir: String): org.apache.spark.sql.DataFrame = {
    val path = ilFixtures.getOrElseUpdate(dir, {
      implicit val enc: Encoder[MediaPayload] = Encoders.product[MediaPayload]
      implicit val encL: Encoder[Long] = Encoders.scalaLong
      val out = fixtureTempDir("graft_media_interlaced")
      t(s, dir, "documents").filter(col("doc_id") <= 80)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val (w, h) = fixtureDims(id)
          MediaPayload(id,
            ImageCodecs.encodePngInterlaced(w, h, fixturePixels(id, w * h * 3)))
        })
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  /** Position probes over the deinterlaced raster. A histogram would pass
    * even with scrambled pixel POSITIONS (interlacing permutes placement,
    * not the color multiset), so the gate is position-sensitive: three
    * point probes plus a position-weighted checksum. */
  case class InterlaceProbe(doc_id: Long, n_px: Int, c_first: Long,
                            c_mid: Long, c_last: Long, pos_checksum: Long)

  /** m33: Adam7 INTERLACED PNG decode — progressive-download PNGs are
    * common in crawl corpora and decode WRONG (not failing, silently
    * scrambled) if pass geometry or per-pass filter state is mishandled.
    * The fixture encodes the standard pixel formula through a real Adam7
    * encoder (7 passes, per-pass independent filtering, all five filter
    * types); the engine runs the real 7-pass reconstruction; the oracle
    * replays the EXPECTED raster analytically. Any pass-offset, stride,
    * or filter-state bug moves pixels and breaks the position-weighted
    * checksum even though the color histogram would still match.
    *
    * Scale shape: one typed map-only decode+probe pass per image; only
    * the presentation sort shuffles. */
  private val m33: Q = (s, dir) => {
    implicit val encIn: Encoder[MediaPayload] = Encoders.product[MediaPayload]
    implicit val encOut: Encoder[InterlaceProbe] =
      Encoders.product[InterlaceProbe]
    interlacedTable(s, dir).as[MediaPayload]
      .mapPartitions(_.map { r =>
        val img = ImageCodecs.decode(r.data)
        val n = img.rgb.length / 3
        def cidAt(p: Int): Long =
          ((img.rgb(3 * p) & 0xffL) << 16) |
            ((img.rgb(3 * p + 1) & 0xffL) << 8) | (img.rgb(3 * p + 2) & 0xffL)
        var sum = 0L
        var p = 0
        while (p < n) { sum += (p + 1L) * cidAt(p); p += 1 }
        InterlaceProbe(r.doc_id, n, cidAt(0), cidAt(n / 2), cidAt(n - 1),
          sum % 1000000007L)
      }).toDF()
      .psort(col("doc_id"))
  }

  private val m33Sql =
    """WITH g AS (
      |  SELECT doc_id, 8 + doc_id % 56 AS w, 8 + (doc_id*7) % 40 AS h
      |  FROM documents WHERE doc_id <= 80),
      |px AS (
      |  SELECT doc_id, w*h AS npx, p,
      |    ((3*p*7 + doc_id) % 251) * 65536
      |      + (((3*p + 1)*7 + doc_id) % 251) * 256
      |      + ((3*p + 2)*7 + doc_id) % 251 AS cid
      |  FROM g, UNNEST(RANGE(w*h)) AS t(p))
      |SELECT doc_id, CAST(MAX(npx) AS INTEGER) AS n_px,
      |  CAST(MAX(CASE WHEN p = 0 THEN cid END) AS BIGINT) AS c_first,
      |  CAST(MAX(CASE WHEN p = npx // 2 THEN cid END) AS BIGINT) AS c_mid,
      |  CAST(MAX(CASE WHEN p = npx - 1 THEN cid END) AS BIGINT) AS c_last,
      |  CAST(SUM((p + 1) * cid) % 1000000007 AS BIGINT) AS pos_checksum
      |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "m31_spectral_peak" -> m31,
    "m33_interlaced_png" -> m33,
    "m32_caption_align" -> m32,
    "m30_palette_png" -> m30,
    "m29_sharpness" -> m29,
    "m28_dominant_colors" -> m28,
    "m27_fake_stereo" -> m27,
    "m26_aspect_buckets" -> m26,
    "m25_patchify" -> m25,
    "m24_letterbox" -> m24,
    "m23_thumbnail" -> m23,
    "m22_png_metadata" -> m22,
    "m21_audio_clipping" -> m21,
    "m20_crossformat_dedup" -> m20,
    "p03_media_pipeline" -> p03,
    "m19_media_quarantine" -> m19,
    "m18_video_resample" -> m18,
    "m17_audio_gain" -> m17,
    "m16_video_keyframe" -> m16,
    "m15_image_neardup" -> m15,
    "m14_audio_segments" -> m14,
    "m13_channel_stats" -> m13,
    "m12_audio_fingerprint" -> m12,
    "m11_audio_resample" -> m11,
    "m10_video_scenes" -> m10,
    "m01_binary_meta" -> m01,
    "m02_image_decode" -> m02,
    "m03_frame_sample" -> m03,
    "m04_image_resize" -> m04,
    "m05_image_features" -> m05,
    "m06_source_profile" -> m06,
    "m07_audio_decode" -> m07,
    "m08_image_phash" -> m08,
    "m09_audio_frames" -> m09)

  val oracleSql: Map[String, String] = Map(
    "m31_spectral_peak" -> m31Sql,
    "m33_interlaced_png" -> m33Sql,
    "m32_caption_align" -> m32Sql,
    "m30_palette_png" -> m30Sql,
    "m29_sharpness" -> m29Sql,
    "m28_dominant_colors" -> m28Sql,
    "m27_fake_stereo" -> m27Sql,
    "m26_aspect_buckets" -> m26Sql,
    "m25_patchify" -> m25Sql,
    "m24_letterbox" -> m24Sql,
    "m23_thumbnail" -> m23Sql,
    "m22_png_metadata" -> m22Sql,
    "m21_audio_clipping" -> m21Sql,
    "m20_crossformat_dedup" -> m20Sql,
    "p03_media_pipeline" -> p03Sql,
    "m19_media_quarantine" -> m19Sql,
    "m18_video_resample" -> m18Sql,
    "m17_audio_gain" -> m17Sql,
    "m16_video_keyframe" -> m16Sql,
    "m15_image_neardup" -> m15Sql,
    "m14_audio_segments" -> m14Sql,
    "m13_channel_stats" -> m13Sql,
    "m12_audio_fingerprint" -> m12Sql,
    "m11_audio_resample" -> m11Sql,
    "m10_video_scenes" -> m10Sql,
    "m01_binary_meta" -> m01Sql,
    "m02_image_decode" -> m02Sql,
    "m03_frame_sample" -> m03Sql,
    "m04_image_resize" -> m04Sql,
    "m05_image_features" -> m05Sql,
    "m06_source_profile" -> m06Sql,
    "m07_audio_decode" -> m07Sql,
    "m08_image_phash" -> m08Sql,
    "m09_audio_frames" -> m09Sql)
}
