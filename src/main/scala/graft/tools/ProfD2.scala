package graft.tools
import org.apache.spark.sql.SparkSession
object ProfD2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("d3_lsh_jaccard_pairs")(spark, sfDir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    println("[plan] Generate(explode) nodes: " + "Generate explode".r.findAllIn(plan).length)
    println("[plan] ShuffleQueryStage: " + "ShuffleQueryStage".r.findAllIn(plan).length)
    println("[plan] collect_set partials: " + "partial_collect_set".r.findAllIn(plan).length)
    println("[plan] min partials: " + "partial_min".r.findAllIn(plan).length)
    plan.linesIterator.filter(l => l.contains("ShuffleQueryStage") || l.contains("ReusedQueryStage")).take(20).foreach(l => println("[sqs] " + l.trim.take(100)))
    spark.stop()
  }
}
