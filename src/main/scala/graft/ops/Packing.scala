package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-example assembly: lay documents head-to-tail
  * inside fixed-capacity token packs (the tokenize-and-pack step of a
  * pretraining data pipeline) and report, per document, which pack its first
  * token lands in and at what offset — the contiguous-fill contract of the
  * downstream packing loop (tokens concatenate in order; packs cut every
  * `capacity` tokens; documents may bleed across pack boundaries).
  *
  * Scale shape: documents are first hash-split into `buckets` independent
  * packing streams (same md5-derived bucketing as the deterministic sampler,
  * so the layout is reproducible run-to-run and engine-to-engine), then each
  * bucket runs ONE partition-local running sum — the window partitions by
  * bucket, so parallelism = `buckets`; size it ~4x the executor-core count.
  * No global sort, no single-partition window.
  */
object Packing {

  /** (doc_id, bucket, n_tokens, pack_id, pack_offset): the doc's first token
    * lands in `pack_id` (bucket-local, 0-based) at `pack_offset`. Docs
    * ordered by doc_id within their bucket. */
  def packSequences(df: DataFrame, textCol: String, capacity: Int,
                    buckets: Int = 8, salt: String = "pack"): DataFrame = {
    require(capacity > 0 && buckets > 0)
    val nTok = size(TextAnalysis.tokens(col(textCol))).cast("long")
    val bucket = Dedup.strHash31(concat(col("doc_id").cast("string"), lit("_" + salt))) % buckets
    val base = df.select(col("doc_id"), nTok.as("n_tokens"), bucket.as("bucket"))
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("__start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("bucket"), col("n_tokens"),
        (col("__start") / capacity).cast("long").as("pack_id"),
        (col("__start") % capacity).as("pack_offset"))
  }
}
