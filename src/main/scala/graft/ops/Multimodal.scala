package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Materialize

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata (north star).
  *
  * The Spark-side plumbing is real — schema, partition-friendly batch
  * iteration, deterministic feature extraction over bytes. The actual media
  * CODECS ARE STUBBED (this container has no image/audio libraries): decode
  * is a clearly-marked deterministic fake so the dataflow, schema, and
  * batching are testable. On a real cluster, swap `StubCodec` for a JNI/
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

  /** Build a media table from any (id, text) frame — payload = UTF-8 bytes,
    * metadata derived deterministically. Stand-in generator for tests. */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      (length(col("text")) % 640 + 64).cast("int").as("width"),
      (length(col("text")) % 480 + 48).cast("int").as("height"),
      (length(col("text")) * 100).cast("long").as("duration_ms"),
      col("source"))

  /** STUB CODEC — deterministic fake standing in for a real decoder.
    * Every value is a pure function of the payload bytes (md5-derived), so
    * tests are stable and the plumbing (batch shape, schema, null handling)
    * is exercised end-to-end. */
  object StubCodec {
    /** ??? real impl: image decode (e.g. TwelveMonkeys/ImageIO via JNI). */
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

  case class MediaFeatures(media_id: Long, media_type: String,
                           dec_width: Int, dec_height: Int,
                           features: Array[Float])

  /** Decode + feature-extract: `mapPartitions` so a real codec is initialized
    * once per partition and rows stream through in place (the Scala analogue
    * of `mapInPandas` batch processing). */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      featureDims: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "media_type", "content")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // real codec: init native decoder HERE, once per partition
        rows.map { case (id, mtype, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          val (w, h) = StubCodec.decodeDims(bytes)
          MediaFeatures(id, mtype, w, h, StubCodec.features(bytes, featureDims))
        }
      }
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
    * sliced lazily, exploded rows carry only the sampled frame. */
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
