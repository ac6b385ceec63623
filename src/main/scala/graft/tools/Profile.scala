package graft.tools

import org.apache.spark.sql.SparkSession
import graft.model.Tables
import graft.ops.Dedup

/** Dev profiler for the near-dup pipeline: times each stage separately so a
  * regression is attributable. runMain graft.tools.Profile <sfDir> */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    if (args.length > 1 && args(1) == "interfere") {
      // Cross-query interference experiment: heavy queries first, then d3.
      Seq("e2_embed_neardup", "d5_simhash_neardup", "e3_srp_ann_topk",
          "d3_lsh_jaccard_pairs", "d3_lsh_jaccard_pairs").foreach { n =>
        time(n)(graft.SparkEntry.queries(n)(spark, sfDir).count())
      }
      // does reclaiming driver state (ContextCleaner via GC) restore speed?
      time("gc+settle") { (1 to 3).foreach { _ => System.gc(); Thread.sleep(2000) } }
      time("d3 after gc")(
        graft.SparkEntry.queries("d3_lsh_jaccard_pairs")(spark, sfDir).count())
      spark.stop(); return
    }

    // No .cache() anywhere: Spark's CacheManager would silently substitute
    // cached subplans into "fresh" DAGs and fake the numbers.
    val docs = Tables(spark, sfDir, "documents")
    time("docs.count")(docs.count())
    time("shingle hash rows")(Dedup.shingleHashRows(docs, "text", 3).count())
    time("minhash signatures")(Dedup.minhashSignatures(docs, "text", 3).count())
    time("bands")(Dedup.lshBands(Dedup.minhashSignatures(docs, "text", 3)).count())
    time("candidate pairs")(
      Dedup.candidatePairs(Dedup.lshBands(Dedup.minhashSignatures(docs, "text", 3))).count())
    time("full d3")(
      Dedup.jaccardPairs(docs,
        Dedup.candidatePairs(Dedup.lshBands(Dedup.minhashSignatures(docs, "text", 3))),
        "text", 3).count())
    spark.stop()
  }
}
