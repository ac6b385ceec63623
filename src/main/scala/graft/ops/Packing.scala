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

  /** Quantile length bucketing for batched inference/training: group
    * documents into token-length quantile buckets, then assemble
    * fixed-count batches of length-adjacent documents inside each bucket —
    * the padding-minimizing batching every serving/training loop wants
    * (batch cost is max-length × batch-size; sorting by length first makes
    * max ≈ min).
    *
    * Scale shape: the quantile boundaries are ONE tiny aggregate row
    * (nBuckets-1 values) cross-joined back broadcast-style — no global sort
    * of the corpus. Batch numbering partitions by (bucket, shard): shards
    * split each bucket into independent numbering streams, so window
    * parallelism = nBuckets × shards, and batches never cross shards. The
    * within-shard ORDER BY n_tok keeps batches length-homogeneous. Shard
    * assignment is `doc_id % shards` for engine-portable determinism (swap
    * in a hash at production scale if ids are clustered).
    *
    * Output: (doc_id, n_tok, bucket, shard, batch_id) — batch key is
    * (bucket, shard, batch_id). */
  def lengthBuckets(df: DataFrame, textCol: String, nBuckets: Int = 4,
                    batchSize: Int = 8, shards: Int = 4): DataFrame = {
    require(nBuckets >= 2 && batchSize > 0 && shards > 0)
    val ps = (1 until nBuckets).map(_.toDouble / nBuckets)
    val toks = df.select(col("doc_id"),
      size(TextAnalysis.tokens(col(textCol))).as("n_tok"))
    val bounds = toks.agg(
      percentile(col("n_tok"), typedLit(ps)).as("bs"))
    val bucket = (1 until nBuckets)
      .map(i => when(col("n_tok") > element_at(col("bs"), i), 1).otherwise(0))
      .reduce(_ + _)
    val w = Window.partitionBy("bucket", "shard").orderBy("n_tok", "doc_id")
    toks.crossJoin(broadcast(bounds))
      .select(col("doc_id"), col("n_tok"), bucket.as("bucket"),
        (col("doc_id") % shards).as("shard"))
      .withColumn("batch_id",
        floor((row_number().over(w) - lit(1)).cast("double") / batchSize)
          .cast("long"))
  }

  /** Sliding-window chunker: cut each document into token windows of `width`
    * advancing by `stride` (overlap = width − stride) — the context-window
    * shaping step of RAG indexing and long-doc pretraining (every token
    * appears in ≥1 chunk; boundary context is preserved by the overlap).
    * Chunk starts are 0, stride, 2·stride, …; the LAST chunk is the first
    * start whose window reaches the end (no trailing chunk fully contained
    * in its predecessor); a doc shorter than `width` (even empty) emits
    * exactly one chunk. Emits (doc_id, chunk_id, start_tok, n_tokens,
    * chunk) with chunk text re-joined on single spaces.
    *
    * All arithmetic is integer and all content is substring re-assembly —
    * no floats anywhere, so the oracle match is exact by construction.
    * Scale: map-only + one Generate (the start-offset explode); no shuffle,
    * no state — the 100 TB plan is embarrassingly parallel. */
  def chunkWindows(df: DataFrame, textCol: String, width: Int = 128,
                   stride: Int = 96): DataFrame = {
    require(width > 0 && stride > 0 && stride <= width,
      "need 0 < stride <= width")
    val toks = TextAnalysis.tokens(col(textCol))
    val len = size(toks).cast("long")
    // n = 1 + ceil((len - width) / stride) for len > width, else 1 —
    // integer form: (len - width + stride - 1) div stride + 1. floor of the
    // double quotient is exact here (operands are tiny vs 2^53).
    val n = when(len <= width, lit(1L))
      .otherwise(floor((len - width + stride - 1) / stride).cast("long") + 1L)
    df.select(col("doc_id"), toks.as("__t"), len.as("__len"), n.as("__n"))
      .select(col("doc_id"), col("__t"), col("__len"),
        explode(sequence(lit(0L), (col("__n") - 1L) * stride, lit(stride.toLong)))
          .as("start_tok"))
      .select(
        col("doc_id"),
        (col("start_tok") / stride).cast("int").as("chunk_id"),
        col("start_tok"),
        greatest(lit(0L), least(lit(width.toLong), col("__len") - col("start_tok")))
          .as("n_tokens"),
        array_join(slice(col("__t"), (col("start_tok") + 1L).cast("int"), lit(width)), " ")
          .as("chunk"))
  }

  /** [[chunkWindows]] as DuckDB SQL (oracle), sharing the token regex and
    * integer window arithmetic. */
  def chunkWindowsSql(tokenRe: String, width: Int, stride: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '$tokenRe') AS t
       |  FROM documents),
       |sized AS (
       |  SELECT doc_id, t, CAST(len(t) AS BIGINT) AS l,
       |    CASE WHEN len(t) <= $width THEN 1
       |         ELSE (CAST(len(t) AS BIGINT) - $width + $stride - 1) // $stride + 1
       |    END AS n FROM toks)
       |SELECT doc_id,
       |  CAST(u.s // $stride AS INT) AS chunk_id,
       |  CAST(u.s AS BIGINT) AS start_tok,
       |  greatest(0, least($width, l - u.s)) AS n_tokens,
       |  array_to_string(t[CAST(u.s + 1 AS INT) : CAST(u.s + $width AS INT)], ' ')
       |    AS chunk
       |FROM sized, unnest(generate_series(0, (n - 1) * $stride, $stride)) AS u(s)""".stripMargin
}
