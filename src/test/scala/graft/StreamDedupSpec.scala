package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.streaming.StreamDedup

/** Streaming near-dup against a static corpus index: stateless stream-side
  * signatures + stream-static band join must find exactly the pairs the
  * batch MinHash+LSH pipeline finds for the same documents. */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "a completely different document about spark catalyst optimizer internals"),
    (3L, "students enrolled in the database course passed the final exam with honors")
  ).toDF("doc_id", "text")

  // 101: near-dup of 1 (one word changed); 102: near-dup of 3 (one word
  // changed); 103: novel text, no corpus relative
  private val incoming = Seq(
    (101L, "the quick brown fox jumps over the lazy cat near the river bank today"),
    (102L, "students enrolled in the database course passed the final exam with distinction"),
    (103L, "totally unrelated content regarding quantum chemistry simulations on clusters")
  )

  test("stream-static near-dup equals the batch pipeline on the same docs") {
    val index = StreamDedup.corpusIndex(corpus, "text")

    val input = MemoryStream[(Long, String)]
    val stream = input.toDF.toDF("doc_id", "text")
    val out = StreamDedup.nearDupAgainst(stream, index, "text", threshold = 0.3)
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val q = out.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // per-batch dedup of multi-band hits — globally exact for
        // stream-static joins (each doc lives in one micro-batch)
        collected ++= batch.dropDuplicates("new_doc_id", "corpus_doc_id")
          .as[(Long, Long, Double)].collect()
        ()
      }.start()
    try {
      input.addData(incoming.take(2))
      q.processAllAvailable()
      input.addData(incoming.drop(2))
      q.processAllAvailable()
    } finally q.stop()

    // batch ground truth: near-dup pairs over corpus+incoming, restricted to
    // (incoming x corpus) orientation
    val all = corpus.unionByName(incoming.toDF("doc_id", "text"))
    // band the ground truth like the PERSISTED streaming index (r=2, the
    // checkpoint-compat literal) — at threshold 0.3 the derivation would
    // pick the wider r=1 banding and could surface pairs the r=2 index
    // structurally cannot
    val batchPairs = Dedup.nearDupPairs(all, "text", threshold = 0.3, rowsPerBand = 2)
      .filter((col("a") >= 100 && col("b") < 100) || (col("b") >= 100 && col("a") < 100))
      .select(greatest(col("a"), col("b")).as("new_doc_id"),
        least(col("a"), col("b")).as("corpus_doc_id"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet

    assert(collected.toSet == batchPairs,
      s"\nstream: ${collected.toSet}\nbatch:  $batchPairs")
    assert(collected.map(_._1).toSet == Set(101L, 102L)) // 103 is novel
  }

  test("streaming bloom probe: negatives are exactly-fresh, all true dups flagged") {
    val seen = Seq((1L, "alpha doc"), (2L, "beta doc")).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF.toDF("doc_id", "text")
    val out = StreamDedup.bloomFresh(stream, seen, "text")
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
    val q = out.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        collected ++= batch.select("doc_id", "maybe_seen")
          .as[(Long, Boolean)].collect()
        ()
      }.start()
    try {
      input.addData(Seq((10L, "alpha doc"), (11L, "gamma doc")))
      q.processAllAvailable()
      input.addData(Seq((12L, "beta doc"), (13L, "delta doc")))
      q.processAllAvailable()
    } finally q.stop()
    val flags = collected.toMap
    assert(flags.keySet == Set(10L, 11L, 12L, 13L))
    // true dups MUST be flagged (no false negatives across batch boundaries)
    assert(flags(10L) && flags(12L))
    // sketch-negative rows are definitely fresh; at this sketch size the
    // two novel docs also pass unflagged (fpp ~3% makes flips vanishingly
    // unlikely on 2 items, and the sketch is deterministic per build)
    assert(!flags(11L) && !flags(13L))
  }

  test("dedup ingest: later batches dedup against earlier admissions via the index") {
    val dir = java.nio.file.Files.createTempDirectory("ingest").toString
    val idxPath = s"$dir/index"; val freshPath = s"$dir/fresh"
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF.toDF("doc_id", "text")
    val q = stream.writeStream.outputMode("append")
      .foreachBatch(StreamDedup.dedupIngest(idxPath, freshPath, threshold = 0.3))
      .start()
    try {
      input.addData(Seq(
        (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2L, "a completely different document about spark catalyst optimizer internals")))
      q.processAllAvailable()
      input.addData(Seq(
        // near-dup of admitted doc 1 -> rejected
        (3L, "the quick brown fox jumps over the lazy cat near the river bank today"),
        // novel -> admitted, and then
        (4L, "students enrolled in the database course passed the final exam with honors")))
      q.processAllAvailable()
      input.addData(Seq(
        // near-dup of batch-2 admission 4 -> rejected (index grew)
        (5L, "students enrolled in the database course passed the final exam with distinction"),
        (6L, "totally unrelated content regarding quantum chemistry simulations on clusters")))
      q.processAllAvailable()
    } finally q.stop()
    val fresh = spark.read.parquet(freshPath).select("doc_id")
      .as[Long].collect().toSet
    assert(fresh == Set(1L, 2L, 4L, 6L), s"admitted: $fresh")
    // the index holds band rows for exactly the admitted docs
    val idxDocs = spark.read.parquet(idxPath).select("doc_id")
      .as[Long].collect().toSet
    assert(idxDocs == Set(1L, 2L, 4L, 6L))
  }

  test("dedup ingest is idempotent per batchId: a crash-replayed batch changes nothing") {
    // The sink's writes are per-batchId OVERWRITES, and the dup probe
    // excludes the replayed batch's own index partition — a crash between
    // the sink write and the offset commit re-runs the batch, which must
    // neither re-admit duplicates nor mark its own docs as self-dups
    // (review finding: two blind appends did both).
    val dir = java.nio.file.Files.createTempDirectory("ingest_replay").toString
    val idxPath = s"$dir/index"; val freshPath = s"$dir/fresh"
    val sink = StreamDedup.dedupIngest(idxPath, freshPath, threshold = 0.3)
    val b0 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "a completely different document about spark catalyst optimizer internals"))
      .toDF("doc_id", "text")
    sink(b0, 0L)
    sink(b0, 0L) // crash replay of the SAME batchId
    val b1 = Seq( // near-dup of doc 1 must still be rejected afterwards
      (3L, "the quick brown fox jumps over the lazy cat near the river bank today"))
      .toDF("doc_id", "text")
    sink(b1, 1L)
    val fresh = spark.read.parquet(freshPath).select("doc_id").as[Long].collect().toSeq
    assert(fresh.sorted == Seq(1L, 2L), s"replay changed the admitted set: $fresh")
    val idxDocs = spark.read.parquet(idxPath).select("doc_id").as[Long].collect().toSet
    assert(idxDocs == Set(1L, 2L))
  }

  test("dedup ingest: a legacy flat index reads as batch=-1, mixed tree included") {
    // An index written by the pre-idempotence flat-append code has bare
    // part-*.parquet files at the top level and no batch column; naive
    // partition discovery over the MIXED tree (legacy files + new batch=<id>
    // dirs) fails with "conflicting directory structures" (review finding).
    // The migration path reads the layouts separately: legacy rows join the
    // probe as batch=-1 — never self-excluded, which is correct because
    // they predate every replayable batch.
    val dir = java.nio.file.Files.createTempDirectory("ingest_legacy").toString
    val idxPath = s"$dir/index"; val freshPath = s"$dir/fresh"
    val legacy = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text")
    StreamDedup.corpusIndex(legacy, "text").write.parquet(idxPath) // flat layout
    val sink = StreamDedup.dedupIngest(idxPath, freshPath, threshold = 0.3)
    sink(Seq(
      // near-dup of LEGACY doc 1 -> rejected via the flat index
      (3L, "the quick brown fox jumps over the lazy cat near the river bank today"),
      (4L, "students enrolled in the database course passed the final exam with honors"))
      .toDF("doc_id", "text"), 0L)
    // tree is now mixed: flat legacy files + batch=0
    sink(Seq(
      // near-dup of batch-0 admission 4 -> rejected via the MIXED read
      (5L, "students enrolled in the database course passed the final exam with distinction"),
      (6L, "totally unrelated content regarding quantum chemistry simulations on clusters"))
      .toDF("doc_id", "text"), 1L)
    val fresh = spark.read.parquet(freshPath).select("doc_id").as[Long].collect().toSet
    assert(fresh == Set(4L, 6L), s"admitted: $fresh")
  }

  test("dedup ingest: an index that exists but cannot be read stays loud") {
    // Swallowing every AnalysisException as "no index yet" would admit the
    // whole batch with ZERO dedup on a broken index (review finding).
    val dir = java.nio.file.Files.createTempDirectory("ingest_broken").toString
    val idxPath = s"$dir/index"; val freshPath = s"$dir/fresh"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(idxPath))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$idxPath/part-00000.parquet"), "not parquet")
    val sink = StreamDedup.dedupIngest(idxPath, freshPath, threshold = 0.3)
    intercept[Exception] {
      sink(Seq((1L, "some document text here")).toDF("doc_id", "text"), 0L)
    }
  }

  test("row signatures match aggregate signatures exactly") {
    val byRow = Dedup.rowMinhashSignatures(corpus, "text").drop("sh")
    val byAgg = Dedup.minhashSignatures(corpus, "text")
    assert(byRow.exceptAll(byAgg).isEmpty && byAgg.exceptAll(byRow).isEmpty)
    val rowSets = Dedup.rowMinhashSignatures(corpus, "text").select("doc_id", "sh")
    val aggSets = Dedup.minhashSignaturesWithSets(corpus, "text").select("doc_id", "sh")
    assert(rowSets.exceptAll(aggSets).isEmpty && aggSets.exceptAll(rowSets).isEmpty)
  }
}
