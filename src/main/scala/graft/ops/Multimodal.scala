package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Materialize

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata (north star).
  *
  * The Spark-side plumbing is real — schema, partition-friendly batch
  * iteration, deterministic feature extraction over bytes. The IMAGE leg is
  * a REAL codec: payloads are genuine PNG byte streams (encoded by
  * [[ImageCodec.encodePng]] from deterministic pixel patterns) and
  * [[extractFeatures]] decodes them with `javax.imageio.ImageIO` — actual
  * header parse + zlib inflate + pixel access, certified by the driver gate
  * because the oracle predicts the dims from the GENERATOR's formula while
  * Spark re-derives them from the decoded image (a header round-trip, not a
  * shared fake). Audio/video decode stays a clearly-marked deterministic
  * stub — the JDK ships no audio/video codec and this container has no
  * native media libraries. On a real cluster, swap `StubCodec` for a JNI/
  * library decoder inside the same `mapPartitions` shape (one codec init per
  * partition, streamed batches — never per-row init, never driver-side).
  */
object Multimodal {

  /** Typed media record: payload + metadata travel together; the payload is
    * an opaque binary column Spark never interprets. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = true),  // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("source", StringType, nullable = true)
  ))

  /** REAL image codec over `javax.imageio` (JDK-only, zero external deps).
    * Encode side exists so the synthetic corpus carries genuine PNG payloads;
    * decode side is the production path. All math is integer until the final
    * per-feature divide, so features are bit-deterministic. */
  object ImageCodec {
    // In-memory streams only: ImageIO's default scratch-file cache would do
    // executor-local disk IO per image.
    javax.imageio.ImageIO.setUseCache(false)

    /** Deterministic RGB test pattern: pixel (x,y) of a `seed`-ed image is a
      * fixed linear-congruential mix, so the SAME (w,h,seed) always encodes
      * the same image — and any decoder returning different pixels is wrong. */
    def patternRgb(x: Int, y: Int, seed: Long): Int = {
      val s = (seed & 0xFFFFFFL).toInt
      val r = (x * 31 + y * 7 + s) & 0xFF
      val g = (x * 13 + y * 29 + s * 3) & 0xFF
      val b = (x * 17 + y * 11 + s * 5) & 0xFF
      (r << 16) | (g << 8) | b
    }

    /** Encode the (w,h,seed) pattern as an actual PNG byte stream. */
    def encodePng(w: Int, h: Int, seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, patternRgb(x, y, seed)); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Decode any ImageIO-supported payload (PNG/GIF/BMP/JPEG). Null when
      * the bytes are not a recognized image — callers surface that as a
      * decode failure, never a crash. */
    def decode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))

    /** Real pixel-statistic features from a decoded image: per-channel means,
      * luminance mean/min/max, aspect ratio — integer sums, one divide each,
      * cycled/truncated to `dims`. */
    def pixelStats(img: java.awt.image.BufferedImage, dims: Int): Array[Float] = {
      val w = img.getWidth; val h = img.getHeight; val n = w.toLong * h
      var sr = 0L; var sg = 0L; var sb = 0L
      var lmin = 255; var lmax = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF; val b = p & 0xFF
          sr += r; sg += g; sb += b
          // integer ITU-R 601 luma approximation (deterministic)
          val l = (r * 299 + g * 587 + b * 114) / 1000
          if (l < lmin) lmin = l
          if (l > lmax) lmax = l
          x += 1
        }
        y += 1
      }
      val base = Array[Float](
        sr.toFloat / n / 255f, sg.toFloat / n / 255f, sb.toFloat / n / 255f,
        (sr * 299L + sg * 587L + sb * 114L).toFloat / 1000f / n / 255f,
        lmin / 255f, lmax / 255f, w.toFloat / h, w * h)
      Array.tabulate(dims)(i => base(i % base.length))
    }
  }

  /** REAL audio codec over `javax.sound.sampled` (JDK-only): the JDK ships
    * a genuine WAV/AIFF PCM container parser — `AudioSystem` reads the RIFF
    * header (format, rate, channels, frame count) and streams the PCM
    * frames. Encode side hand-writes the 44-byte canonical RIFF/WAVE header
    * plus 16-bit LE PCM, so payloads are byte-deterministic; decode is the
    * production path, exercised against what a real WAV reader must return. */
  object AudioCodec {
    import java.nio.{ByteBuffer, ByteOrder}

    /** Deterministic 16-bit PCM sample i of a `seed`-ed clip — an LCG mix,
      * so the same (n, seed) always produces the same waveform. */
    def sampleAt(i: Int, seed: Long): Short =
      (((i * 2654435761L + seed * 40503L) & 0xFFFF) - 32768).toShort

    /** Encode n deterministic samples as a real PCM WAV (16-bit LE mono). */
    def encodeWav(nSamples: Int, rateHz: Int, seed: Long): Array[Byte] = {
      val dataLen = nSamples * 2
      val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
      bb.putShort(1) /* PCM */ ; bb.putShort(1) /* mono */
      bb.putInt(rateHz); bb.putInt(rateHz * 2) /* byte rate */
      bb.putShort(2) /* block align */ ; bb.putShort(16) /* bits */
      bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
      var i = 0
      while (i < nSamples) { bb.putShort(sampleAt(i, seed)); i += 1 }
      bb.array()
    }

    /** Decoded clip: container-parsed rate/channels/frames + the PCM bytes. */
    case class Clip(rateHz: Int, channels: Int, frames: Long, pcm: Array[Byte])

    /** Real container parse via AudioSystem; None when the bytes are not a
      * recognized audio stream. */
    def decode(payload: Array[Byte]): Option[Clip] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val fmt = ais.getFormat
        val pcm = ais.readAllBytes()
        Some(Clip(fmt.getSampleRate.toInt, fmt.getChannels, ais.getFrameLength, pcm))
      } catch { case _: javax.sound.sampled.UnsupportedAudioFileException |
                     _: java.io.IOException => None }

    /** Real waveform features over decoded 16-bit LE PCM: mean |amplitude|,
      * peak, zero-crossing count — integer accumulation, one divide each. */
    def pcmStats(clip: Clip, dims: Int): Array[Float] = {
      val bb = ByteBuffer.wrap(clip.pcm).order(ByteOrder.LITTLE_ENDIAN)
      val n = clip.pcm.length / 2
      var sumAbs = 0L; var peak = 0L; var zc = 0L; var prev = 0
      var i = 0
      while (i < n) {
        val s = bb.getShort(i * 2).toInt
        val a = math.abs(s.toLong)
        sumAbs += a
        if (a > peak) peak = a
        if (i > 0 && ((s >= 0) != (prev >= 0))) zc += 1
        prev = s
        i += 1
      }
      val base = Array[Float](
        if (n == 0) 0f else sumAbs.toFloat / n / 32768f,
        peak / 32768f,
        if (n == 0) 0f else zc.toFloat / n,
        clip.rateHz / 48000f, clip.channels.toFloat, n.toFloat)
      Array.tabulate(dims)(i => base(i % base.length))
    }
  }

  /** STUB CODEC — deterministic fake for the ONE media type the JDK cannot
    * decode (video). Every value is a pure function of the payload bytes
    * (md5-derived), so tests are stable and the plumbing (batch shape,
    * schema, null handling) is exercised end-to-end. */
  object StubCodec {
    /** ??? real impl: video container demux (ffmpeg-class, via JNI). */
    def decodeDims(payload: Array[Byte]): (Int, Int) = {
      val h = java.security.MessageDigest.getInstance("MD5").digest(payload)
      (((h(0) & 0x7F) << 4) + 64, ((h(1) & 0x7F) << 3) + 48)
    }
    /** ??? real impl: feature extractor (CNN embedding / mel spectrogram). */
    def features(payload: Array[Byte], dims: Int): Array[Float] = {
      val h = java.security.MessageDigest.getInstance("MD5").digest(payload)
      Array.tabulate(dims)(i => ((h(i % h.length) & 0xFF) / 255.0f) - 0.5f)
    }
  }

  /** Image dims used by the synthetic generator: tiny (4–16 × 4–14) so a
    * 100 TB-scale corpus of test media stays cheap, derived from text length
    * so the DuckDB oracle can predict what ImageIO must decode. */
  def imgW(len: Int): Int = len % 13 + 4
  def imgH(len: Int): Int = len % 11 + 4

  /** Audio generator shape: 8 samples per text char at 8 kHz mono, so the
    * REAL decoded duration is exactly `len` milliseconds — the formula the
    * oracle predicts while AudioSystem re-derives it from the parsed
    * container (frames / rate). */
  val AudioRateHz = 8000
  def audioSamples(len: Int): Int = len * 8

  /** Build a media table from any (id, text) frame. IMAGE rows carry a real
    * PNG payload (pattern seeded by media_id, dims from text length — see
    * [[imgW]]/[[imgH]]); AUDIO rows carry a real PCM WAV (len×8 samples at
    * 8 kHz → decoded duration = len ms); video rows carry the UTF-8 text
    * bytes as an opaque stand-in payload (no JDK video codec). Metadata
    * columns reflect the payload where a real codec exists: image
    * width/height are the true encoded dims. Typed-map generation (not pure
    * columns) because media encoding is genuinely imperative — same codec
    * boundary as [[extractFeatures]]. */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // `len` is computed ENGINE-SIDE with Spark's length() — code points,
    // matching DuckDB's length(text) in every m-family oracle. Scala's
    // String.length (UTF-16 units) would diverge on any supplementary-plane
    // character the driver's next corpus regeneration might carry, shifting
    // every derived dim and hash-failing the gate (the documented
    // testdata-regeneration hazard). Null text is treated as length 0 (no
    // nulls exist in the generator contract; if one ever appears the
    // SQL-side NULL propagation turns the m-queries red LOUDLY, pointing
    // here).
    docs.select(
        col("doc_id").as("media_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        col("text"),
        coalesce(length(col("text")), lit(0)).as("len"),
        col("source"))
      .as[(Long, String, String, Int, String)]
      .mapPartitions { rows =>
        rows.map { case (id, mtype, text, len, src) =>
          val (content, w, h) = mtype match {
            case "image" =>
              (ImageCodec.encodePng(imgW(len), imgH(len), id), imgW(len), imgH(len))
            case "audio" =>
              (AudioCodec.encodeWav(audioSamples(len), AudioRateHz, id),
                len % 640 + 64, len % 480 + 48)
            case _ =>
              (if (text == null) null else text.getBytes("UTF-8"),
                len % 640 + 64, len % 480 + 48)
          }
          (id, mtype, content, w, h, len.toLong * 100, src)
        }
      }
      .toDF("media_id", "media_type", "content", "width", "height",
        "duration_ms", "source")
  }

  /** Decode result row: dims apply to images, dec_ms to audio (container
    * duration), -1 where the dimension has no meaning for the type. */
  case class MediaFeatures(media_id: Long, media_type: String,
                           dec_width: Int, dec_height: Int, dec_ms: Long,
                           features: Array[Float])

  /** Decode + feature-extract: `mapPartitions` so a real codec is initialized
    * once per partition and rows stream through in place (the Scala analogue
    * of `mapInPandas` batch processing). Image rows: REAL ImageIO decode
    * (header parse + inflate + pixel stats). Audio rows: REAL AudioSystem
    * WAV parse (container rate/frames → duration, PCM waveform stats).
    * Video rows: the documented stub. A payload that fails its decoder
    * surfaces as (-1, -1, -1) rather than an executor crash. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      featureDims: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "media_type", "content")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // real codec boundary: per-partition init happens here (ImageIO /
        // AudioSystem registries are cached JVM-wide; a native decoder
        // would allocate its context at this point)
        rows.map { case (id, mtype, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          mtype match {
            case "image" => ImageCodec.decode(bytes) match {
              case Some(img) =>
                MediaFeatures(id, mtype, img.getWidth, img.getHeight, -1L,
                  ImageCodec.pixelStats(img, featureDims))
              case None =>
                MediaFeatures(id, mtype, -1, -1, -1L, Array.fill(featureDims)(0f))
            }
            case "audio" => AudioCodec.decode(bytes) match {
              case Some(clip) =>
                MediaFeatures(id, mtype, -1, -1,
                  clip.frames * 1000L / clip.rateHz,
                  AudioCodec.pcmStats(clip, featureDims))
              case None =>
                MediaFeatures(id, mtype, -1, -1, -1L, Array.fill(featureDims)(0f))
            }
            case _ =>
              val (w, h) = StubCodec.decodeDims(bytes)
              MediaFeatures(id, mtype, w, h, -1L,
                StubCodec.features(bytes, featureDims))
          }
        }
      }
  }

  /** Real image RESIZE (the north-star verb the family was missing):
    * decode → aspect-preserving downscale to fit `maxDim` (never upscale)
    * → re-encode PNG → re-decode, emitting the dims read back from the
    * re-decoded thumbnail — so a hash match certifies the full
    * decode→resize→encode→decode round trip, not an arithmetic echo.
    * Target dims are integer floor math ( tw = max(1, w·maxDim/m),
    * m = max(w,h) ), reproducible in SQL for the oracle. Same
    * `mapPartitions` codec boundary; non-image rows and undecodable
    * payloads are dropped (resize is an image op). */
  def thumbnails(spark: SparkSession, media: DataFrame,
                 maxDim: Int = 8): DataFrame = {
    import spark.implicits._
    media.filter(col("media_type") === "image")
      .select("media_id", "content")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          ImageCodec.decode(bytes).map { img =>
            val w = img.getWidth; val h = img.getHeight
            val m = math.max(w, h)
            val (tw, th) =
              if (m <= maxDim) (w, h)
              else (math.max(1, w * maxDim / m), math.max(1, h * maxDim / m))
            val thumb = new java.awt.image.BufferedImage(
              tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = thumb.createGraphics()
            try g.drawImage(img, 0, 0, tw, th, null) finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(thumb, "png", bos)
            // degrade-not-crash contract: a thumbnail that fails to
            // round-trip drops the row instead of killing the task
            ImageCodec.decode(bos.toByteArray)
              .map(rb => (id, w, h, rb.getWidth, rb.getHeight))
          }.flatten
        }
      }
      .toDF("media_id", "orig_w", "orig_h", "thumb_w", "thumb_h")
  }

  /** Cross-media shared-segment detection: which media pairs contain
    * identical sampled frames — the multimodal analogue of the d12/x17
    * span-sharing diagnostics (shared intros, watermark cards, re-uploads
    * of the same clip inside different containers).
    *
    * Scale: frames reduce to (media_id, frame_md5) DISTINCT pairs in one
    * pass; super-common frames (test patterns, black frames) are pruned by
    * the same bucket-cap rule every LSH join here uses, so the
    * self-equi-join on frame_md5 expands to ≤ maxMedia² rows per frame and
    * never goes quadratic in media count. */
  def sharedFrames(media: DataFrame, frameBytes: Int = 16,
                   strideBytes: Int = 64, maxMedia: Int = 32): DataFrame = {
    val fr = sampleFrames(media, frameBytes, strideBytes)
      .select(col("media_id"), col("frame_md5")).distinct()
    val frM = Materialize.pin(fr)
    val rare = frM.groupBy("frame_md5").agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxMedia).select("frame_md5")
    val pruned = frM.join(rare, Seq("frame_md5"), "left_semi")
    pruned.as("l").join(pruned.as("r"),
        col("l.frame_md5") === col("r.frame_md5") &&
        col("l.media_id") < col("r.media_id"))
      .groupBy(col("l.media_id").as("media_a"), col("r.media_id").as("media_b"))
      .agg(count(lit(1)).as("shared_frames"))
  }

  /** Frame sampling: every `strideBytes`-th fixed-width slice of the payload
    * (stand-in for video frame extraction). Pure expressions — the payload is
    * sliced lazily, exploded rows carry only the sampled frame. Temporal-media
    * semantics: callers sampling a mixed corpus filter to audio/video first
    * (slicing a compressed still image's byte stream is not frame access). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 16, strideBytes: Int = 64): DataFrame = {
    val n = greatest(lit(1), floor(length(col("content")) / strideBytes).cast("int"))
    media.select(col("media_id"),
        posexplode(transform(sequence(lit(0), n - 1),
          i => substring(col("content"), lit(1) + i * strideBytes, lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame_bytes")
      .withColumn("frame_md5", md5(col("frame_bytes")))
  }
}
