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

  test("extractFeatures: image rows use the REAL decoder, audio rows the stub") {
    // doc_id 0 -> image, doc_id 1 -> audio (the %3 type assignment)
    val docs = Seq(
      (0L, "x" * 60, "en", "s0", 60L),
      (1L, "y" * 60, "en", "s0", 60L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.syntheticMedia(docs)
    val feats = Multimodal.extractFeatures(spark, media).collect()
      .map(f => f.media_id -> f).toMap
    // image: decoded dims must equal the generator's formula (60%13+4, 60%11+4)
    assert(feats(0L).dec_width == Multimodal.imgW(60))
    assert(feats(0L).dec_height == Multimodal.imgH(60))
    // and the features are pixel stats, not the stub's md5 fakes: the area
    // feature (index 7) is w*h
    assert(feats(0L).features(7) == (Multimodal.imgW(60) * Multimodal.imgH(60)).toFloat)
    // audio: stub path unchanged (md5-derived dims over the text payload)
    val (sw, sh) = Multimodal.StubCodec.decodeDims(("y" * 60).getBytes("UTF-8"))
    assert(feats(1L).dec_width == sw && feats(1L).dec_height == sh)
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
}
