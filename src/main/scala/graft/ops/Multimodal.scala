package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Materialize

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata (north star).
  *
  * ALL THREE legs are REAL codecs — no stubs:
  *  - IMAGE: genuine PNG byte streams ([[ImageCodec.encodePng]]) decoded
  *    with `javax.imageio.ImageIO` — header parse + zlib inflate + pixel
  *    access.
  *  - AUDIO: genuine RIFF/WAVE 16-bit PCM ([[AudioCodec.encodeWav]]) parsed
  *    with `javax.sound.sampled.AudioSystem` — container rate/frames + PCM.
  *  - VIDEO: genuine uncompressed AVI ([[VideoCodec.encodeAvi]]) demuxed by
  *    a hand-written RIFF chunk-tree walker — avih/strf header parse + raw
  *    bottom-up BI_RGB frame access (the format is public; the JDK has no
  *    video API, so the demuxer is implemented here from the byte layout).
  * In each case the driver gate certifies an encode→decode ROUND TRIP: the
  * oracle predicts dims/duration/pixels from the GENERATOR's formulas while
  * Spark re-derives them from the decoded container. Compressed codecs
  * (JPEG video, H.264, MP3) would slot in behind the same `mapPartitions`
  * boundary via a JNI/library decoder (one codec init per partition,
  * streamed batches — never per-row init, never driver-side).
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

    /** Decode any ImageIO-supported payload (PNG/GIF/BMP/JPEG). None when
      * the bytes are not a recognized image — callers surface that as a
      * decode failure, never a crash. The try matters: ImageIO.read returns
      * null only when NO reader claims the bytes; a payload with a valid
      * magic but a truncated/corrupt body makes the claiming reader THROW
      * (IIOException), which must degrade like any other junk (review
      * finding — the audio and video codecs already caught their parsers'
      * exceptions, this one didn't). */
    def decode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }

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
        // pcmStats interprets the bytes as SIGNED 16-bit LITTLE-ENDIAN PCM;
        // AudioSystem also parses AIFF (big-endian), 8-bit, and u-law
        // streams "successfully", which would yield silently wrong
        // features — and a crafted header with sample rate 0 would divide
        // the duration by zero downstream. Reject anything that is not the
        // layout the feature extractor reads (review finding).
        // 16-bit PCM frames are exactly 2 bytes per channel; anything else
        // is the wrong layout for pcmStats.
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
            fmt.getSampleRate <= 0 || fmt.getChannels <= 0 ||
            fmt.getFrameSize != fmt.getChannels * 2) None
        else {
          // LIVENESS (byte-mutation fuzz finding): readAllBytes() here can
          // SPIN FOREVER — AudioInputStream.read rounds the requested
          // length DOWN to whole frames and returns 0 (not -1) for a
          // sub-frame request, while InputStream.readNBytes retries a 0
          // return with the same arguments. Any frame size that does not
          // divide the 8 KiB chunk (a mutated blockAlign > 8192, but also
          // a perfectly legitimate 3-channel clip, frameSize 6, since
          // 8192 % 6 != 0) wedges the reading task beyond what retries can
          // fix. Read through a FRAME-ALIGNED buffer instead, so every
          // request is a whole number of frames, and treat 0 as
          // termination anyway (defense in depth).
          val frameSize = fmt.getFrameSize
          val buf = new Array[Byte](frameSize * math.max(1, 8192 / frameSize))
          val out = new java.io.ByteArrayOutputStream()
          var n = ais.read(buf)
          while (n > 0) { out.write(buf, 0, n); n = ais.read(buf) }
          Some(Clip(fmt.getSampleRate.toInt, fmt.getChannels, ais.getFrameLength,
            out.toByteArray))
        }
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

  /** REAL video codec: hand-written muxer/demuxer for uncompressed AVI —
    * RIFF `AVI ` container, `hdrl` (avih + strl{strh,strf}) headers, `movi`
    * LIST of `00db` frames holding bottom-up 24-bit BI_RGB DIBs with 4-byte
    * row padding. The format is fully public (Microsoft AVI / OpenDML spec);
    * both sides are implemented from the byte layout, no library involved.
    * Decode walks the chunk tree for real: a payload with a wrong fourcc,
    * a compressed `strf`, or a frame whose size disagrees with the parsed
    * dims is rejected — so the gate certifies genuine container demux + raw
    * frame access, not an arithmetic echo. Compressed codecs (H.264 etc.)
    * would slot in behind the same demux at the `00dc` branch via JNI. */
  object VideoCodec {
    import java.nio.{ByteBuffer, ByteOrder}

    /** 10 fps: frame period in microseconds, as stored in `avih`/`strh`. */
    val UsPerFrame = 100000

    /** DIB rows are padded to 4-byte boundaries (BMP/AVI rule). */
    def stride(w: Int): Int = (w * 3 + 3) & ~3

    /** Raw bottom-up BGR frame bytes for the (w,h,seed) pattern — the SAME
      * pattern function as the image leg, so frame equality is seed+dims
      * equality (distinct seeds under 256 give distinct frames: each pixel
      * channel depends on the seed only mod 256). */
    def frameDib(w: Int, h: Int, seed: Long): Array[Byte] = {
      val st = stride(w)
      val out = new Array[Byte](st * h)
      var y = 0
      while (y < h) {
        val row = (h - 1 - y) * st
        var x = 0
        while (x < w) {
          val p = ImageCodec.patternRgb(x, y, seed)
          out(row + x * 3) = (p & 0xFF).toByte
          out(row + x * 3 + 1) = ((p >> 8) & 0xFF).toByte
          out(row + x * 3 + 2) = ((p >> 16) & 0xFF).toByte
          x += 1
        }
        y += 1
      }
      out
    }

    /** Mux nFrames pattern frames (frame k seeded `seedBase + k`) into a
      * spec-complete uncompressed AVI byte stream. */
    def encodeAvi(w: Int, h: Int, nFrames: Int, usPerFrame: Int,
                  seedBase: Long): Array[Byte] = {
      val st = stride(w)
      val frameSize = st * h
      val avihSize = 56; val strhSize = 56; val strfSize = 40
      val strlSize = 4 + (8 + strhSize) + (8 + strfSize)
      val hdrlSize = 4 + (8 + avihSize) + (8 + strlSize)
      val moviSize = 4 + nFrames * (8 + frameSize)
      val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
      val bb = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
      def fcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
      fcc("RIFF"); bb.putInt(riffSize); fcc("AVI ")
      fcc("LIST"); bb.putInt(hdrlSize); fcc("hdrl")
      // MainAVIHeader: usPerFrame, maxBytesPerSec, padding, flags, totalFrames,
      // initialFrames, streams, suggestedBufSize, width, height, reserved[4]
      fcc("avih"); bb.putInt(avihSize)
      bb.putInt(usPerFrame); bb.putInt(0); bb.putInt(0); bb.putInt(0)
      bb.putInt(nFrames); bb.putInt(0); bb.putInt(1); bb.putInt(frameSize)
      bb.putInt(w); bb.putInt(h); bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
      fcc("LIST"); bb.putInt(strlSize); fcc("strl")
      // AVIStreamHeader: 'vids'/'DIB ', flags, prio+lang, initFrames,
      // scale, rate (fps = rate/scale), start, length, bufSize, quality,
      // sampleSize, rcFrame
      fcc("strh"); bb.putInt(strhSize)
      fcc("vids"); fcc("DIB "); bb.putInt(0); bb.putInt(0); bb.putInt(0)
      bb.putInt(usPerFrame); bb.putInt(1000000); bb.putInt(0); bb.putInt(nFrames)
      bb.putInt(frameSize); bb.putInt(-1); bb.putInt(0)
      bb.putShort(0); bb.putShort(0); bb.putShort(w.toShort); bb.putShort(h.toShort)
      // BITMAPINFOHEADER: size, w, h, planes, bitCount=24, compression=BI_RGB
      fcc("strf"); bb.putInt(strfSize)
      bb.putInt(40); bb.putInt(w); bb.putInt(h); bb.putShort(1); bb.putShort(24)
      bb.putInt(0); bb.putInt(frameSize); bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
      fcc("LIST"); bb.putInt(moviSize); fcc("movi")
      var k = 0
      while (k < nFrames) {
        fcc("00db"); bb.putInt(frameSize); bb.put(frameDib(w, h, seedBase + k))
        k += 1
      }
      bb.array()
    }

    /** Demuxed clip: header-parsed dims + frame period, raw DIB frames. */
    case class Vid(width: Int, height: Int, usPerFrame: Int,
                   frames: IndexedSeq[Array[Byte]]) {
      def durationMs: Long = frames.length.toLong * usPerFrame / 1000
      /** Pixel (x,y) of frame f in top-left coordinates — undoes the
        * bottom-up DIB row order and BGR byte order. */
      def rgbAt(f: Int, x: Int, y: Int): Int = {
        val st = stride(width)
        val base = (height - 1 - y) * st + x * 3
        val d = frames(f)
        ((d(base + 2) & 0xFF) << 16) | ((d(base + 1) & 0xFF) << 8) | (d(base) & 0xFF)
      }
    }

    /** Real chunk-tree walk. None for anything that is not a well-formed
      * uncompressed 24-bit AVI — garbage, truncation, or a codec we cannot
      * decode all degrade, never crash. */
    def decode(payload: Array[Byte]): Option[Vid] =
      try {
        if (payload.length < 12) return None
        val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
        def fcc(): String = {
          val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
        }
        if (fcc() != "RIFF") return None
        bb.getInt()
        if (fcc() != "AVI ") return None
        var w = -1; var h = -1; var us = -1; var rgb24 = false
        val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
        def walk(end: Int, depth: Int): Unit =
          while (bb.position() + 8 <= end) {
            val id = fcc(); val sz = bb.getInt()
            // LONG arithmetic: position + sz overflows Int for a crafted
            // sz near 2^31, bypassing the bound and allocating gigabytes —
            // and the resulting OutOfMemoryError is fatal, escaping the
            // NonFatal catch below (review finding)
            if (sz < 0 || bb.position().toLong + sz > end) return
            val next = bb.position() + sz + (sz & 1) // chunks are word-aligned
            // depth cap: real AVIs nest LISTs ~3 deep; a crafted chain of
            // nested LIST headers would otherwise recurse once per 12
            // bytes of payload into a fatal StackOverflowError (review
            // finding). Beyond the cap the subtree is skipped, not parsed.
            if (id == "LIST") { fcc(); if (depth < 32) walk(bb.position() + sz - 4, depth + 1) }
            else if (id == "avih" && sz >= 40) {
              val p = bb.position()
              us = bb.getInt(p); w = bb.getInt(p + 32); h = bb.getInt(p + 36)
            } else if (id == "strf" && sz >= 20) {
              val p = bb.position()
              rgb24 = bb.getShort(p + 14) == 24 && bb.getInt(p + 16) == 0
            } else if (id == "00db" || id == "00dc") {
              val a = new Array[Byte](sz); bb.get(a); frames += a
            }
            bb.position(math.min(next, end))
          }
        walk(payload.length, depth = 0)
        // LONG frame-size check: stride(w)·h in Int arithmetic wraps for a
        // crafted avih width (w = 0x55555556 → stride wraps to 4), aliasing
        // the product onto a genuine frame length — the accepted Vid then
        // indexes frames at the TRUE (huge) width and rgbAt dies in an
        // uncaught ArrayIndexOutOfBounds outside this try (review finding).
        // A frame is ≤ the payload ≤ Int.MaxValue bytes, so the long-exact
        // product can only match when the Int forms are exact too.
        val expected = ((w.toLong * 3 + 3) & ~3L) * h
        if (w <= 0 || h <= 0 || us <= 0 || !rgb24) None
        else if (frames.isEmpty || frames.exists(_.length.toLong != expected)) None
        else Some(Vid(w, h, us, frames.toVector))
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Real pixel-statistic features over all decoded frames: channel means,
      * luma mean/min/max, aspect, frame count — same integer-until-the-last-
      * divide discipline as the image leg. */
    def frameStats(v: Vid, dims: Int): Array[Float] = {
      var sr = 0L; var sg = 0L; var sb = 0L
      var lmin = 255; var lmax = 0
      var f = 0
      while (f < v.frames.length) {
        var y = 0
        while (y < v.height) {
          var x = 0
          while (x < v.width) {
            val p = v.rgbAt(f, x, y)
            val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF; val b = p & 0xFF
            sr += r; sg += g; sb += b
            val l = (r * 299 + g * 587 + b * 114) / 1000
            if (l < lmin) lmin = l
            if (l > lmax) lmax = l
            x += 1
          }
          y += 1
        }
        f += 1
      }
      val n = v.frames.length.toLong * v.width * v.height
      val base = Array[Float](
        sr.toFloat / n / 255f, sg.toFloat / n / 255f, sb.toFloat / n / 255f,
        (sr * 299L + sg * 587L + sb * 114L).toFloat / 1000f / n / 255f,
        lmin / 255f, lmax / 255f, v.width.toFloat / v.height, v.frames.length.toFloat)
      Array.tabulate(dims)(i => base(i % base.length))
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

  /** Video generator shape: tiny dims and 2–8 frames at 10 fps, all pure
    * functions of text length the oracle can predict while the demuxer
    * re-derives them from the parsed container. Frame k of media `id` is the
    * pattern seeded `(id%25)*8 + k` — always under 256, so two frames are
    * pixel-identical exactly when (seed, dims) match; videos in the same
    * id%25 cohort with equal dims genuinely share their common frame prefix
    * (the structure `sharedVideoFrames`' oracle predicts). */
  def vidW(len: Int): Int = len % 12 + 4
  def vidH(len: Int): Int = len % 10 + 4
  def vidFrames(len: Int): Int = len % 7 + 2
  def vidSeedBase(id: Long): Long = (id % 25) * 8

  /** Build a media table from any (id, text) frame. IMAGE rows carry a real
    * PNG payload (pattern seeded by media_id, dims from text length — see
    * [[imgW]]/[[imgH]]); AUDIO rows carry a real PCM WAV (len×8 samples at
    * 8 kHz → decoded duration = len ms); VIDEO rows carry a real
    * uncompressed AVI (see [[vidW]]/[[vidH]]/[[vidFrames]] — 10 fps, so
    * decoded duration = frames×100 ms). Metadata columns reflect the
    * payload: image/video width/height are the true encoded dims, video
    * duration the true container duration. Typed-map generation (not pure
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
    // `text` itself stays OUT of the typed projection: only its engine-side
    // length feeds the generators, and carrying the full document through
    // the encoder would serialize/deserialize every byte per row for
    // nothing (review finding).
    docs.select(
        col("doc_id").as("media_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        coalesce(length(col("text")), lit(0)).as("len"),
        col("source"))
      .as[(Long, String, Int, String)]
      .mapPartitions { rows =>
        rows.map { case (id, mtype, len, src) =>
          val (content, w, h, durMs) = mtype match {
            case "image" =>
              (ImageCodec.encodePng(imgW(len), imgH(len), id),
                imgW(len), imgH(len), len.toLong * 100)
            case "audio" =>
              (AudioCodec.encodeWav(audioSamples(len), AudioRateHz, id),
                len % 640 + 64, len % 480 + 48, len.toLong * 100)
            case _ =>
              (VideoCodec.encodeAvi(vidW(len), vidH(len), vidFrames(len),
                  VideoCodec.UsPerFrame, vidSeedBase(id)),
                vidW(len), vidH(len), vidFrames(len).toLong * 100)
          }
          (id, mtype, content, w, h, durMs, src)
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
    * Video rows: REAL AVI demux (chunk-tree walk → dims + frame period from
    * the headers, pixel stats over the raw frames). A payload that fails
    * its decoder surfaces as (-1, -1, -1) rather than an executor crash. */
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
            case _ => VideoCodec.decode(bytes) match {
              case Some(v) =>
                MediaFeatures(id, mtype, v.width, v.height, v.durationMs,
                  VideoCodec.frameStats(v, featureDims))
              case None =>
                MediaFeatures(id, mtype, -1, -1, -1L, Array.fill(featureDims)(0f))
            }
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
                   strideBytes: Int = 64, maxMedia: Int = 32): DataFrame =
    sharedFromFrames(sampleFrames(media, frameBytes, strideBytes)
      .select(col("media_id"), col("frame_md5")), maxMedia)

  /** Shared-frame pair detection over REAL demuxed video frames: frame
    * identity is the md5 of (dims ‖ raw DIB bytes), so two videos pair up
    * exactly when they contain pixel-identical frames at equal dims —
    * genuine content equality through the container, not byte-slice
    * coincidence. Same bucket-cap discipline as every LSH join here. */
  def sharedVideoFrames(spark: SparkSession, media: DataFrame,
                        maxMedia: Int = 32): DataFrame =
    sharedFromFrames(videoFrameHashes(spark, media), maxMedia)

  /** The shared pair pipeline: distinct (media_id, frame_md5) → prune
    * super-common frames (test cards, black frames) by the bucket cap →
    * self-equi-join on frame_md5, which expands to ≤ maxMedia² rows per
    * frame and never goes quadratic in media count. */
  private def sharedFromFrames(frames: DataFrame, maxMedia: Int): DataFrame = {
    val frM = Materialize.pin(frames.select("media_id", "frame_md5").distinct())
    val rare = frM.groupBy("frame_md5").agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxMedia).select("frame_md5")
    val pruned = frM.join(rare, Seq("frame_md5"), "left_semi")
    pruned.as("l").join(pruned.as("r"),
        col("l.frame_md5") === col("r.frame_md5") &&
        col("l.media_id") < col("r.media_id"))
      .groupBy(col("l.media_id").as("media_a"), col("r.media_id").as("media_b"))
      .agg(count(lit(1)).as("shared_frames"))
  }

  /** REAL video frame extraction: demux each AVI and emit one row per frame
    * with corner-pixel channels read from the decoded DIB. Top-left (0,0)
    * and bottom-right (w−1,h−1) pin both ends of the frame buffer, so a
    * stride/padding bug or a missed bottom-up row flip fails the oracle —
    * undecodable payloads degrade to zero rows, never a crash. */
  def videoFrames(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.filter(col("media_type") === "video")
      .select("media_id", "content")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          VideoCodec.decode(bytes).iterator.flatMap { v =>
            (0 until v.frames.length).iterator.map { k =>
              val p0 = v.rgbAt(k, 0, 0)
              val p1 = v.rgbAt(k, v.width - 1, v.height - 1)
              (id, k, (p0 >> 16) & 0xFF, (p0 >> 8) & 0xFF, p0 & 0xFF,
                (p1 >> 16) & 0xFF, (p1 >> 8) & 0xFF, p1 & 0xFF)
            }
          }
        }
      }
      .toDF("media_id", "frame_no", "px00_r", "px00_g", "px00_b",
        "pxwh_r", "pxwh_g", "pxwh_b")
  }

  /** Demux → per-frame content hash (dims ‖ raw DIB bytes): dims are part
    * of the key so equal-length buffers from different layouts can never
    * alias. One row per (media_id, frame). */
  def videoFrameHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.filter(col("media_type") === "video")
      .select("media_id", "content")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { case (id, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          VideoCodec.decode(bytes).iterator.flatMap { v =>
            v.frames.iterator.map { dib =>
              md.reset()
              md.update(s"${v.width}x${v.height}:".getBytes("US-ASCII"))
              md.update(dib)
              (id, md.digest().map(b => f"${b & 0xFF}%02x").mkString)
            }
          }
        }
      }
      .toDF("media_id", "frame_md5")
  }

  /** BYTE-slice sampling: every `strideBytes`-th fixed-width slice of the
    * payload. Pure expressions — the payload is sliced lazily, exploded rows
    * carry only the sampled slice. This is the fallback for OPAQUE payloads
    * whose container has no decoder (at 100 TB most corpora carry some):
    * shared byte runs still betray re-uploads and shared segments even when
    * the frames themselves are unreachable. For decodable video, prefer
    * [[videoFrames]]/[[videoFrameHashes]] — real demuxed frame content. */
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
