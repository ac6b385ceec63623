package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan for selected registered
  * queries so pushdown / broadcast / codegen can be inspected and iterated.
  *
  * Usage: runMain graft.Explain <sfDir> [queryName ...]
  * With no names, explains a representative subset.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("s1_scan_clean", "t10_point_lookup", "t18_dim_join",
        "join_shuffle_agg", "join_interval", "a1_weighted_gpa",
        "flagship_progress", "d3_lsh_jaccard_pairs", "d7_minhash_rowsig",
        "e1_cosine_topk", "x5_clean_corpus", "x10_contamination")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
