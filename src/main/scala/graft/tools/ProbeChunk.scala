package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shuffle-volume probe for the chunk-dedup keep-first shapes (PLANS.md
  * r16). Three contenders, identical output (verified with `except` both
  * ways):
  *
  *   - `window_text` (r15 production): row_number window keyed by raw
  *     chunk text; text crosses the window shuffle in full, survivors
  *     cross again in the rebuild.
  *   - `window_hash_join` (the shape the old in-code comment prescribed
  *     for 100 TB): narrow (xxhash64, doc_id, pos) window + one doc_id
  *     join folding winners onto the pinned text. Measured WORSE at ×100:
  *     hash rows don't lz4-compress and the fold-back re-shuffles ALL text.
  *   - `agg_text` (r16 production, graft.ops.Dedup.chunkDedup): keep-first
  *     as groupBy(chunk).agg(min(doc_id*K + pos)) over a packed long —
  *     sort-free HashAggregate, map-side partial combine collapses
  *     duplicate chunks before the wire, narrow fold-back. See the
  *     chunkDedup Scaladoc for the measured numbers.
  *
  * `runMain graft.tools.ProbeChunk <docsDir>` — one warm pass per shape,
  * then a measured pass with a stage listener summing shuffle bytes and
  * records. */
object ProbeChunk {

  private def chunkArrays(docs: DataFrame, textCol: String,
                          width: Int): DataFrame = {
    val toks = col("__t")
    graft.Materialize.pin(graft.model.Tables
      .spread(docs.select(col("doc_id"), col(textCol)), col("doc_id"))
      .select(col("doc_id"),
        explode(array(graft.ops.TextAnalysis.tokens(col(textCol)))).as("__t"))
      .select(col("doc_id"),
        when(size(toks) > 0,
          transform(sequence(lit(0), ((size(toks) - 1) / width).cast("int")),
            i => array_join(slice(toks, i * width + 1, lit(width)), " ")))
          .otherwise(array().cast("array<string>")).as("chunks")))
  }

  /** r15 shape, verbatim (keep-first window keyed by raw chunk text). */
  private def windowText(docs: DataFrame, textCol: String,
                         width: Int): DataFrame = {
    val arr = chunkArrays(docs, textCol, width)
    val exploded = arr.select(col("doc_id"),
      posexplode(col("chunks")).as(Seq("pos", "chunk")))
    val keepFirst = Window.partitionBy("chunk").orderBy(col("doc_id"), col("pos"))
    val rebuilt = exploded
      .withColumn("__rn", row_number().over(keepFirst))
      .filter(col("__rn") === 1)
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("chunk")))),
          s => s("chunk")), " ").as("text_dedup"))
    arr.select(col("doc_id"), size(col("chunks")).as("n_chunks"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }

  /** The prescribed-but-refuted shape: narrow hash-keyed window, winners
    * folded back onto the pinned text via one doc_id join. */
  private def windowHashJoin(docs: DataFrame, textCol: String,
                             width: Int): DataFrame = {
    val arr = chunkArrays(docs, textCol, width)
    val slim = arr.select(col("doc_id"),
        posexplode(col("chunks")).as(Seq("pos", "chunk")))
      .select(xxhash64(col("chunk")).as("__h"), col("doc_id"), col("pos"))
    val keepFirst = Window.partitionBy("__h").orderBy(col("doc_id"), col("pos"))
    val winners = slim
      .withColumn("__rn", row_number().over(keepFirst))
      .filter(col("__rn") === 1)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("__keep"))
    arr.join(winners, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("chunks")).as("n_chunks"),
        coalesce(size(col("__keep")), lit(0)).cast("long").as("n_kept"),
        coalesce(array_join(transform(col("__keep"),
          p => element_at(col("chunks"), p + 1)), " "), lit(""))
          .as("text_dedup"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val width = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", width)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Per-run shuffle totals via stage listener (same machinery as
    // ProfStages, bytes added — the probe's whole point is wire BYTES).
    val rB = new java.util.concurrent.atomic.AtomicLong(0)
    val wB = new java.util.concurrent.atomic.AtomicLong(0)
    val rR = new java.util.concurrent.atomic.AtomicLong(0)
    val wR = new java.util.concurrent.atomic.AtomicLong(0)
    @volatile var collect = false
    StageProf.attach(spark) { i =>
      if (collect) {
        val m = i.taskMetrics
        rB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        wB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        rR.addAndGet(m.shuffleReadMetrics.recordsRead)
        wR.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        if (sys.env.contains("GRAFT_PROBE_STAGES")) println(StageProf.line(i))
      }
    }

    val docs = graft.model.Tables(spark, sfDir, "documents")
    // Force EVERY column: a bare count() lets Catalyst prune the winners
    // subtree entirely (left-join elimination over the unique-keyed
    // aggregate), which silently measures nothing — the hash-xor touches
    // text_dedup so the keep-first, join, and rebuild all execute.
    // bit_xor, not sum: ANSI mode overflows a long sum of 500k hashes.
    def force(df: DataFrame): Long = {
      val r = df.agg(count(lit(1)),
        bit_xor(xxhash64(struct(df.columns.map(col): _*)))).head()
      r.getLong(0)
    }
    def run(tag: String, mk: () => DataFrame): DataFrame = {
      force(mk()) // warm
      Seq(rB, wB, rR, wR).foreach(_.set(0))
      collect = true
      val t0 = System.nanoTime()
      val n = force(mk())
      // listener events are async; give the bus a beat before reading
      // (listenerBus.waitUntilEmpty is private[spark])
      Thread.sleep(1500)
      collect = false
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"chunk_dedup","shape":"$tag","sf":"$sfDir","rows":$n,"sec":$sec%.1f,"shuf_write_mb":${wB.get / 1e6}%.1f,"shuf_read_mb":${rB.get / 1e6}%.1f,"shuf_write_rec":${wR.get},"shuf_read_rec":${rR.get}}""")
      mk()
    }
    val prod = run("agg_text", () => graft.ops.Dedup.chunkDedup(docs, "text"))
    val wTxt = run("window_text", () => windowText(docs, "text", 5))
    val wHash = run("window_hash_join", () => windowHashJoin(docs, "text", 5))
    for ((tag, other) <- Seq("window_text" -> wTxt, "window_hash_join" -> wHash)) {
      val d = prod.exceptAll(other).count() + other.exceptAll(prod).count()
      println(s"""{"probe":"chunk_dedup","vs":"$tag","output_diff_rows":$d}""")
    }
    spark.stop()
  }
}
