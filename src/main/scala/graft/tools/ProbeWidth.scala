package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot probe: what pair-join width does the candidate-volume
  * derivation pick for a corpus, and what is the underlying Σdf²?
  * `runMain graft.tools.ProbeWidth <sfDir> [n]` */
object ProbeWidth {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.model.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val posts = graft.ops.Dedup.cappedPostingsWithTf(docs, "text", n, 0.2, 1000)._2
    println(s"[probe] n=$n postings=${posts.count()} " +
      s"sumDf=${posts.agg(sum(col("df"))).head().getLong(0)} " +
      s"width=${graft.ops.Dedup.pairJoinWidth(posts)}")
    // replicate d14's stage-volume derivation (threshold 0.8)
    import org.apache.spark.sql.expressions.Window
    val norms = posts.groupBy("doc_id").agg(sum(col("tf") * col("tf")).as("sq"))
    val hotFirst = Window.partitionBy("doc_id")
      .orderBy(col("df").desc, col("term").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val idx = posts.join(norms, Seq("doc_id"))
      .withColumn("__cum", sum(col("tf") * col("tf")).over(hotFirst))
      .filter(col("__cum") >= lit(0.8 * 0.8) * col("sq"))
      .select(col("term"), col("doc_id")).localCheckpoint(true)
    val genVol = idx.groupBy("term").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c"))).head().getLong(0)
    val cand = idx.select(col("term"), col("doc_id").as("a"))
      .join(idx.select(col("term"), col("doc_id").as("b")), Seq("term"))
      .filter(col("a") < col("b")).select("a", "b").distinct()
    println(s"[probe] idx=${idx.count()} genVol=$genVol cand=${cand.count()}")
    spark.stop()
  }
}
