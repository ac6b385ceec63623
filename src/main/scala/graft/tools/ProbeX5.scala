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
    time("explode+groupBy (registered cleanCorpus)") {
      graft.ops.TextAnalysis.cleanCorpus(docs, "text").count()
    }
    time("map-side aggregate() fold (cleanCorpusFold)") {
      graft.ops.TextAnalysis.cleanCorpusFold(docs, "text").count()
    }
    spark.stop()
  }
}
