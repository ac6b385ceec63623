package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc timer for named SparkEntry queries:
  * `runMain graft.tools.TimeQueries <sfDir> q1 q2 ...` — times each query
  * (count-forced) in registration conditions matching Bench (local[32],
  * 32 shuffle partitions), two passes so warm-JVM numbers are visible.
  *
  * The materialization seam is costable here: pass
  * `-Dgraft.materialize.mode=reliable -Dgraft.materialize.dir=<dir>` (via
  * GRAFT_EXTRA_JAVA_OPTS) to time the cluster-FS checkpoint posture
  * against the default `local` — PLANS.md's reliable-mode costing probe. */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("d6_dup_clusters")
    // Width override for scale probes: at 10× data the sf0.1-sized 32-wide
    // shuffle makes each task's slice 10× larger (the d14 sf1 OOM at 8g) —
    // widening the shuffle is the standard cluster answer, so the probe
    // tool must be able to express it.
    val width = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", width)
      .config(graft.model.Tables.ShuffleWriterThreshold._1, graft.model.Tables.ShuffleWriterThreshold._2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (k <- Seq(graft.Materialize.ModeKey, graft.Materialize.DirKey);
         v <- sys.props.get(k)) {
      spark.conf.set(k, v)
      println(s"[time] $k=$v")
    }
    // Runtime-settable posture probes (e.g. RocksDB changelog
    // checkpointing): forward spark.sql.streaming.* sysprops — ONLY that
    // namespace — from GRAFT_EXTRA_JAVA_OPTS into the session conf.
    // Non-streaming spark.sql.* keys are NOT forwarded (several are
    // start-time-only and conf.set would throw); set those in the
    // builder above if a probe needs them.
    for ((k, v) <- sys.props if k.startsWith("spark.sql.streaming.")) {
      spark.conf.set(k, v)
      println(s"[time] $k=$v")
    }
    graft.model.Tables(spark, sfDir, "documents").limit(1).count() // warm session
    // count() lets Catalyst PRUNE computed columns nothing downstream
    // consumes — a MAP-ONLY query (x13's per-doc rule columns, x1's token
    // stats) times as a bare scan (the ProbeChunk elimination trap).
    // SPARK_GRAFT_FORCE=hash folds every output column through xxhash64
    // into one bit_xor (xor, not sum — an ANSI long sum overflows on
    // full-range hashes) so the full projection provably evaluates per
    // row; count mode stays the default because filters/joins/aggregates
    // force their own inputs and the fold adds per-row hash cost to the
    // reading.
    val forceHash = sys.env.get("SPARK_GRAFT_FORCE").contains("hash")
    for (pass <- 1 to 2; n <- names) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val rows =
        if (forceHash) {
          import org.apache.spark.sql.functions._
          // xxhash64 rejects MapType at analysis (Skew.hashSafe documents
          // the constraint) — a map-valued output column would abort the
          // whole timing run. Route non-hashable columns through to_json
          // instead of dropping them: the point of hash mode is forcing
          // EVERY output column to evaluate per row (ADVICE r17).
          val folded = df.schema.fields.map { f =>
            if (graft.ops.Skew.hashSafe(f.dataType)) col(f.name)
            else to_json(col(f.name))
          }
          val r = df.agg(count(lit(1)), bit_xor(xxhash64(folded.toIndexedSeq: _*))).head()
          println(s"[time] $n checksum=${r.get(1)}")
          r.getLong(0)
        } else df.count()
      println(f"[time] pass=$pass $n rows=$rows t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
