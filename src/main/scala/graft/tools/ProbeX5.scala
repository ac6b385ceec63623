package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B probe for VERDICT r17 #2: x5's fused clean-corpus pass with the
  * per-doc token stats via explode + groupBy(doc_id) (the registered
  * cleanCorpus) vs the map-side higher-order aggregate() fold
  * (cleanCorpusFold). Both force through the final content-hash groupBy
  * (x5's joins/groupBy self-force — the r17 fourth-decade table measured
  * it count-mode for the same reason).
  *
  *   runMain graft.tools.ProbeX5 <dir>
  */
object ProbeX5 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.model.Tables(spark, dir, "documents")
    def time(label: String)(body: => Long): Unit =
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = body
        println(f"[x5] pass=$pass $label rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    if (args.lift(1).contains("x3")) {
      // x3 arm: languageId alone. Both forms hash-forced through every
      // output column (pred_lang/hits are map-only in the fold form — a
      // bare count would prune them, the ProbeChunk elimination trap).
      import org.apache.spark.sql.functions._
      def force(df: org.apache.spark.sql.DataFrame): Long = {
        val r = df.agg(count(lit(1)),
          bit_xor(xxhash64(df.columns.map(col): _*))).head()
        r.getLong(0)
      }
      time("x3 explode+groupBy (registered languageId)") {
        force(graft.ops.TextAnalysis.languageId(spark, docs, "text"))
      }
      time("x3 map-side fold (languageIdFold)") {
        force(graft.ops.TextAnalysis.languageIdFold(docs, "text"))
      }
    } else {
      time("explode+groupBy (registered cleanCorpus)") {
        graft.ops.TextAnalysis.cleanCorpus(docs, "text").count()
      }
      time("map-side aggregate() fold (cleanCorpusFold)") {
        graft.ops.TextAnalysis.cleanCorpusFold(docs, "text").count()
      }
    }
    spark.stop()
  }
}
