package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Materialize.DatasetPin

import graft.ops.Dedup

/** Streaming near-duplicate detection: incoming documents checked against a
  * STATIC corpus index — the incremental leg of the MinHash+LSH dedup family
  * (a pretraining pipeline admits new crawl batches by deduping them against
  * the already-curated corpus).
  *
  * Everything on the stream side is STATELESS: per-row signatures
  * ([[Dedup.rowMinhashSignatures]] — one native loop, no groupBy), band
  * explosion, and a stream-static equi-join on (band_id, band_key) against
  * the prebuilt index. No watermark, no state store; at scale the index is a
  * bucketed table on band_key so the join is a lookup, and the stream shuffles
  * only fixed-width signatures.
  *
  * A pair that shares multiple bands surfaces once per shared band; dedupe
  * per micro-batch in the sink (`foreachBatch` + `dropDuplicates`) — each
  * document lives in exactly one micro-batch of a stream-static join, so
  * batch-local dedup is globally exact. [[StreamDedupSpec]] certifies
  * equivalence with the batch pipeline.
  */
object StreamDedup {

  /** Build the static corpus index: (doc_id, band_id, band_key, sh).
    * At scale: write bucketed by band_key; rebuild as the corpus grows. */
  def corpusIndex(docs: DataFrame, textCol: String, n: Int = 3,
                  rowsPerBand: Int = 2): DataFrame = {
    val sigs = Dedup.minhashSignaturesWithSets(docs, textCol, n)
    Dedup.lshBands(sigs, rowsPerBand)
      .join(sigs.select(col("doc_id"), col("sh")), "doc_id")
  }

  /** Self-maintaining dedup ingest: a `foreachBatch` sink that checks each
    * micro-batch against the on-disk MinHash band index of EVERYTHING
    * admitted so far, writes only novel documents to `freshPath`, and
    * appends their band rows to `indexPath` — so later batches dedup
    * against earlier ones without any driver state (the index IS the
    * state, durable and restart-safe; re-reading it per batch is exactly
    * the stream-static pattern with a static side that grows).
    *
    * Contract: dedup is against previously-ADMITTED documents only;
    * near-dups arriving within one micro-batch are both admitted (run the
    * batch [[Dedup.nearDupPairs]] on `freshPath` afterwards if intra-batch
    * pairs matter). At scale, write `indexPath` bucketed by band_key and
    * compact periodically ([[graft.etl.Compact]]).
    */
  def dedupIngest(indexPath: String, freshPath: String, textCol: String = "text",
                  n: Int = 3, rowsPerBand: Int = 2, threshold: Double = 0.5)
      : (DataFrame, Long) => Unit = (batch: DataFrame, _: Long) => {
    val spark = batch.sparkSession
    val newIdx = corpusIndex(batch, textCol, n, rowsPerBand).pinned
    val existing =
      try Some(spark.read.parquet(indexPath))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    val dupIds = existing match {
      case None => spark.range(0).select(col("id").as("doc_id"))
      case Some(idx) =>
        newIdx.select(col("doc_id"), col("band_id"), col("band_key"), col("sh").as("sh_new"))
          .join(idx.select(col("band_id"), col("band_key"), col("sh").as("sh_old")),
            Seq("band_id", "band_key"))
          .filter(Dedup.jaccardExpr(col("sh_new"), col("sh_old")) >= threshold)
          .select("doc_id").distinct()
    }
    val freshIdx = newIdx.join(dupIds, Seq("doc_id"), "left_anti").pinned
    batch.join(freshIdx.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
      .write.mode("append").parquet(freshPath)
    freshIdx.write.mode("append").parquet(indexPath)
  }

  /** EXACT streaming dedup against a static seen-set via a Bloom probe:
    * the batch-side [[Dedup.bloomDedup]] shape lifted to a stream. The
    * sketch is built ONCE from the seen corpus (a bounded binary literal —
    * no stream-static join, no state store, no watermark), and each
    * streaming row probes it map-side: sketch-negative rows are DEFINITELY
    * fresh (Bloom filters have no false negatives) and pass with
    * `is_certain=true`; sketch-positive rows are either true dups or the
    * ~fpp sliver and are emitted flagged for the sink's exact verification
    * (a per-batch anti-join in `foreachBatch`, against a seen-set lookup
    * that only the flagged sliver pays).
    *
    * Output: (doc_id, row_hash, maybe_seen). Fully stateless per row —
    * survives any micro-batch boundary placement. */
  def bloomFresh(stream: DataFrame, seen: DataFrame, textCol: String,
                 expectedItems: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    val sketch = Bridge.column(new BloomFilterAggregate(
      Bridge.expression(xxhash64(md5(col(textCol)))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    val bfBytes = seen.agg(sketch.as("bf")).head().getAs[Array[Byte]]("bf")
    val keyed = stream.select(col("doc_id"), md5(col(textCol)).as("row_hash"))
    if (bfBytes == null) return keyed.withColumn("maybe_seen", lit(false))
    keyed.withColumn("maybe_seen", Bridge.column(BloomFilterMightContain(
      Literal(bfBytes, BinaryType),
      Bridge.expression(xxhash64(col("row_hash"))))))
  }

  /** Near-dup candidates of a streaming doc frame against the static index,
    * with exact Jaccard verification: (new_doc_id, corpus_doc_id, jaccard).
    * Rows may repeat per shared band — see the class doc for the sink-side
    * per-batch dedup contract. */
  def nearDupAgainst(stream: DataFrame, index: DataFrame, textCol: String,
                     n: Int = 3, rowsPerBand: Int = 2,
                     threshold: Double = 0.5): DataFrame = {
    val sigs = Dedup.rowMinhashSignatures(stream, textCol, n)
    // band keys and the jaccard formula come from the SAME definitions the
    // batch index uses (Dedup.bandStructs / Dedup.jaccardExpr) — any future
    // change to the banding scheme changes both sides together
    val banded = sigs.select(col("doc_id").as("new_doc_id"), col("sh").as("sh_new"),
        explode(array(Dedup.bandStructs(rowsPerBand): _*)).as("band"))
      .select(col("new_doc_id"), col("sh_new"),
        col("band.band_id").as("band_id"), col("band.band_key").as("band_key"))
    banded
      .join(index.select(col("band_id"), col("band_key"),
          col("doc_id").as("corpus_doc_id"), col("sh").as("sh_corpus")),
        Seq("band_id", "band_key"))
      .filter(col("new_doc_id") =!= col("corpus_doc_id"))
      .select(col("new_doc_id"), col("corpus_doc_id"),
        Dedup.jaccardExpr(col("sh_new"), col("sh_corpus")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
