package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.ImageCodec

/** The real-image leg of the multimodal plumbing (r12 verdict #2): the PNG
  * payloads are genuine byte streams and `extractFeatures` runs an actual
  * `javax.imageio` decode. These tests pin the codec against HAND-COMPUTED
  * expectations — a 2×1 image with known pure-color pixels whose channel
  * means, integer luma bounds, and aspect ratio are derived on paper, so a
  * decoder returning anything but the true encoded pixels fails loudly. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("hand-built PNG: decode returns the exact pixels that were encoded") {
    // 2×1 image, hand-chosen pixels: (0,0) pure red, (1,0) pure blue.
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000)
    img.setRGB(1, 0, 0x0000FF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    // a real PNG starts with the 8-byte signature
    assert(png.take(8).map(b => f"${b & 0xFF}%02x").mkString == "89504e470d0a1a0a")
    val dec = ImageCodec.decode(png).get
    assert(dec.getWidth == 2 && dec.getHeight == 1)
    assert((dec.getRGB(0, 0) & 0xFFFFFF) == 0xFF0000)
    assert((dec.getRGB(1, 0) & 0xFFFFFF) == 0x0000FF)
    // pixel stats, hand-computed: sr=255, sg=0, sb=255 over n=2;
    // per-pixel integer luma: red -> 255*299/1000 = 76, blue -> 255*114/1000 = 29
    val f = ImageCodec.pixelStats(dec, 8)
    assert(f(0) == 255f / 2 / 255f)                      // mean R = 0.5
    assert(f(1) == 0f)                                   // mean G
    assert(f(2) == 255f / 2 / 255f)                      // mean B = 0.5
    assert(f(3) == (255L * 299 + 255L * 114).toFloat / 1000f / 2 / 255f) // mean luma
    assert(f(4) == 29f / 255f && f(5) == 76f / 255f)     // luma min/max
    assert(f(6) == 2f && f(7) == 2f)                     // aspect 2:1, area 2
  }

  test("encodePng round-trips the deterministic pattern bit-exactly") {
    val (w, h, seed) = (7, 5, 42L)
    val dec = ImageCodec.decode(ImageCodec.encodePng(w, h, seed)).get
    assert(dec.getWidth == w && dec.getHeight == h)
    for (y <- 0 until h; x <- 0 until w)
      assert((dec.getRGB(x, y) & 0xFFFFFF) == ImageCodec.patternRgb(x, y, seed),
        s"pixel ($x,$y) drifted through the PNG round-trip")
  }

  test("extractFeatures: image, audio AND video rows all use REAL decoders") {
    // doc_id 0 -> image, 1 -> audio, 2 -> video (the %3 type assignment)
    val docs = Seq(
      (0L, "x" * 60, "en", "s0", 60L),
      (1L, "y" * 60, "en", "s0", 60L),
      (2L, "z" * 60, "en", "s0", 60L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.syntheticMedia(docs)
    val feats = Multimodal.extractFeatures(spark, media).collect()
      .map(f => f.media_id -> f).toMap
    // image: decoded dims must equal the generator's formula (60%13+4, 60%11+4)
    assert(feats(0L).dec_width == Multimodal.imgW(60))
    assert(feats(0L).dec_height == Multimodal.imgH(60))
    assert(feats(0L).dec_ms == -1L)
    // and the features are pixel stats: the area feature (index 7) is w*h
    assert(feats(0L).features(7) == (Multimodal.imgW(60) * Multimodal.imgH(60)).toFloat)
    // audio: REAL WAV container parse — duration = frames/rate = len ms,
    // and the sample-count feature (index 5) is the generator's n
    assert(feats(1L).dec_width == -1 && feats(1L).dec_height == -1)
    assert(feats(1L).dec_ms == 60L)
    assert(feats(1L).features(5) == Multimodal.audioSamples(60).toFloat)
    // video: REAL AVI demux — dims from the parsed avih header, duration
    // from the walked frame chunks (60%7+2 = 6 frames at 10 fps = 600 ms),
    // frame-count feature (index 7) from the movi walk
    assert(feats(2L).dec_width == Multimodal.vidW(60))
    assert(feats(2L).dec_height == Multimodal.vidH(60))
    assert(feats(2L).dec_ms == Multimodal.vidFrames(60).toLong * 100)
    assert(feats(2L).features(7) == Multimodal.vidFrames(60).toFloat)
  }

  test("hand-built AVI: demux returns the exact headers and pixels that were muxed") {
    import Multimodal.VideoCodec
    // 5×3, 2 frames: stride = (5*3+3)&~3 = 16 (one pad byte per row)
    val avi = VideoCodec.encodeAvi(5, 3, 2, 100000, seedBase = 9L)
    // real RIFF layout: fourcc at 0–3, form type at 8–11
    assert(new String(avi.take(4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val v = VideoCodec.decode(avi).get
    assert(v.width == 5 && v.height == 3 && v.usPerFrame == 100000)
    assert(v.frames.length == 2 && v.durationMs == 200L)
    assert(v.frames.forall(_.length == 16 * 3)) // padded stride held
    // every pixel of every frame reads back through the bottom-up flip:
    // frame k is the pattern seeded 9+k
    for (k <- 0 until 2; y <- 0 until 3; x <- 0 until 5)
      assert(v.rgbAt(k, x, y) == ImageCodec.patternRgb(x, y, 9L + k),
        s"pixel ($x,$y) of frame $k drifted through the AVI round-trip")
    // garbage and truncation degrade, never crash
    assert(VideoCodec.decode("not an avi".getBytes("UTF-8")).isEmpty)
    assert(VideoCodec.decode(avi.take(40)).isEmpty)
    // a WAV is RIFF but not AVI — the form-type check must reject it
    assert(VideoCodec.decode(Multimodal.AudioCodec.encodeWav(4, 8000, 1L)).isEmpty)
  }

  test("videoFrames emits decoded corner pixels; sharing follows cohort+dims") {
    import Multimodal.VideoCodec
    // ids 2 and 77 are video rows (%3 = 2) in the same id%25 cohort; same
    // text length -> same dims and frame count -> every frame shared.
    // id 152 (also cohort 2, also video) with different length -> different
    // dims, no sharing despite the cohort.
    val docs = Seq(
      (2L, "a" * 30, "en", "s0", 30L),
      (77L, "b" * 30, "en", "s0", 30L),
      (152L, "c" * 31, "en", "s0", 31L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.syntheticMedia(docs)
    val fr = Multimodal.videoFrames(spark, media).collect()
    val nf = Multimodal.vidFrames(30)
    assert(fr.count(_.getLong(0) == 2L) == nf)
    // corner pixels match the pattern arithmetic the oracle uses
    val f0 = fr.find(r => r.getLong(0) == 2L && r.getInt(1) == 0).get
    val s = Multimodal.vidSeedBase(2L).toInt
    assert(f0.getInt(2) == s % 256 && f0.getInt(3) == (s * 3) % 256 &&
      f0.getInt(4) == (s * 5) % 256)
    val (w, h) = (Multimodal.vidW(30), Multimodal.vidH(30))
    assert(f0.getInt(5) == ((w - 1) * 31 + (h - 1) * 7 + s) % 256)
    val shared = Multimodal.sharedVideoFrames(spark, media).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(shared == Map((2L, 77L) -> nf.toLong))
  }

  test("hand-built WAV: AudioSystem parses the exact header and PCM that were encoded") {
    import Multimodal.AudioCodec
    // 4 samples at 8 kHz: hand-checkable frames/rate and waveform stats
    val wav = AudioCodec.encodeWav(4, 8000, seed = 7L)
    // canonical RIFF layout: 44-byte header + 2 bytes per sample
    assert(wav.length == 44 + 8)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val clip = AudioCodec.decode(wav).get
    assert(clip.rateHz == 8000 && clip.channels == 1 && clip.frames == 4L)
    // PCM read back byte-identically: stats computed over the exact samples
    val samples = (0 until 4).map(i => AudioCodec.sampleAt(i, 7L))
    val meanAbs = samples.map(s => math.abs(s.toLong)).sum.toFloat / 4 / 32768f
    val stats = AudioCodec.pcmStats(clip, 8)
    assert(stats(0) == meanAbs)
    assert(stats(1) == samples.map(s => math.abs(s.toLong)).max / 32768f)
    // garbage bytes are not audio
    assert(AudioCodec.decode("not a wav".getBytes("UTF-8")).isEmpty)
  }

  test("thumbnails: real resize round-trip emits the re-decoded dims") {
    import Multimodal.ImageCodec
    // 16x4 image: max dim 16 > 8 -> scale to (8, max(1, 4*8/16)=2)
    val wide = ImageCodec.encodePng(16, 4, 1L)
    // 6x5 image: already fits -> kept as-is
    val small = ImageCodec.encodePng(6, 5, 2L)
    val media = Seq(
      (1L, "image", wide), (2L, "image", small),
      (3L, "video", "xx".getBytes("UTF-8")) // dropped: resize is an image op
    ).toDF("media_id", "media_type", "content")
    val got = Multimodal.thumbnails(spark, media).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))))
      .toMap
    assert(got == Map(1L -> ((16, 4, 8, 2)), 2L -> ((6, 5, 6, 5))))
  }

  test("syntheticMedia image payloads are genuine PNGs with true metadata dims") {
    val docs = Seq((3L, "z" * 100, "en", "s0", 100L), (6L, "q" * 47, "en", "s0", 47L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Multimodal.syntheticMedia(docs).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("media_type") == "image")
      val content = r.getAs[Array[Byte]]("content")
      val dec = ImageCodec.decode(content).get
      assert(dec.getWidth == r.getAs[Int]("width"))
      assert(dec.getHeight == r.getAs[Int]("height"))
    }
  }

  test("a non-image byte payload under media_type=image degrades to (-1,-1), no crash") {
    val media = Seq((9L, "image", "definitely not a png".getBytes("UTF-8")))
      .toDF("media_id", "media_type", "content")
    val f = Multimodal.extractFeatures(spark, media).collect().head
    assert(f.dec_width == -1 && f.dec_height == -1)
    assert(f.features.forall(_ == 0f))
  }

  test("corrupt payloads with VALID magics degrade, never crash the task") {
    // The degrade-never-crash contract under adversarial bytes (review
    // findings): a truncated PNG body makes the claiming ImageIO reader
    // THROW rather than return null; an AVI chunk size near 2^31 overflowed
    // the Int bounds check into a fatal 2GB allocation; a chain of nested
    // LIST headers recursed into StackOverflowError. All three must read
    // as decode failures.
    val png = graft.ops.Multimodal.ImageCodec.encodePng(8, 8, seed = 1L)
    val truncated = png.take(png.length / 2) // valid magic, torn body
    assert(graft.ops.Multimodal.ImageCodec.decode(truncated).isEmpty)

    def avi(chunks: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + chunks.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + chunks.length)
        .put("AVI ".getBytes("US-ASCII")).put(chunks)
      bb.array()
    }
    // one frame chunk claiming ~2^31 bytes
    val bomb = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("00db".getBytes("US-ASCII")).putInt(0x7FFFFFF0).array()
    assert(graft.ops.Multimodal.VideoCodec.decode(avi(bomb)).isEmpty)
    // 50k nested LIST headers (each: 'LIST' + size + 4cc)
    val depth = 50000
    val nest = java.nio.ByteBuffer.allocate(12 * depth)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until depth).foreach { i =>
      nest.put("LIST".getBytes("US-ASCII"))
        .putInt((depth - i) * 12 - 8).put("xxxx".getBytes("US-ASCII"))
    }
    assert(graft.ops.Multimodal.VideoCodec.decode(avi(nest.array())).isEmpty)
  }

  test("crafted avih dims whose stride·height wraps Int degrade, never crash") {
    // stride(0x55555556) wraps Int arithmetic to 4, so 4·(frameLen/4)
    // aliases the size check onto a genuine frame length — the accepted Vid
    // would then index frames at the TRUE ~1.4e9 width and rgbAt dies in an
    // uncaught ArrayIndexOutOfBounds (review finding). The long-exact check
    // must reject the payload instead.
    import graft.ops.Multimodal.VideoCodec
    val good = VideoCodec.encodeAvi(8, 4, nFrames = 1,
      VideoCodec.UsPerFrame, seedBase = 0L)
    val frameLen = VideoCodec.stride(8) * 4
    val bb = java.nio.ByteBuffer.wrap(good.clone())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // avih payload starts at byte 32 (RIFF 12 + LIST 8 + 'hdrl' 4 + chunk
    // header 8); width/height sit at +32/+36 within it
    assert(bb.getInt(64) == 8 && bb.getInt(68) == 4, "avih offset drifted")
    bb.putInt(64, 0x55555556)        // stride() wraps to 4
    bb.putInt(68, frameLen / 4)      // 4 · h == real frame length
    assert(VideoCodec.decode(bb.array()).isEmpty,
      "wraparound dims must be rejected, not accepted with aliased sizes")
    // and the untouched original still decodes
    assert(VideoCodec.decode(good).exists(v => v.width == 8 && v.height == 4))
  }

  test("audio decode rejects layouts pcmStats cannot read (8-bit, big-endian, rate 0)") {
    // AudioSystem parses AIFF (big-endian) and 8-bit WAVs "successfully",
    // but pcmStats reads 16-bit LE — silently wrong features; a rate-0
    // header would divide the duration by zero (review finding).
    def wav(bits: Short, rate: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 4)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(rate)
        .putInt(rate * (bits / 8)).putShort((bits / 8).toShort).putShort(bits)
        .put("data".getBytes("US-ASCII")).putInt(4)
        .putInt(0)
      bb.array()
    }
    assert(graft.ops.Multimodal.AudioCodec.decode(wav(8, 8000)).isEmpty,
      "8-bit PCM must be rejected, not misread as 16-bit")
    assert(graft.ops.Multimodal.AudioCodec.decode(wav(16, 0)).isEmpty,
      "sample rate 0 must be rejected, not divide the duration by zero")
    // the leg's own 16-bit LE encoding still decodes
    val good = graft.ops.Multimodal.AudioCodec.encodeWav(16, 8000, seed = 2L)
    assert(graft.ops.Multimodal.AudioCodec.decode(good).isDefined)
  }
}
