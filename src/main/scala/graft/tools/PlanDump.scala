package graft.tools
import org.apache.spark.sql.SparkSession
/** Dumps formatted physical plans of headline queries -> stdout (PLANS.md). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("t10_point_lookup", "join_shuffle_agg", "flagship_progress",
        "d3_lsh_jaccard_pairs", "e4_ivf_topk", "join_asof")
    names.foreach { n =>
      println(s"@@QUERY $n")
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
