package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfD2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.model.Tables(spark, sfDir, "documents")
    val t0 = System.nanoTime()
    val pairs = graft.ops.Dedup.simhashNearDup(graft.ops.Dedup.simhash(docs, "text"), 3)
    println(f"[p] pairs=${pairs.count()} build=${(System.nanoTime()-t0)/1e9}%.1fs")
    // inline CC with iteration logging
    val edges = pairs.select(col("a").as("x"), col("b").as("y"))
      .unionByName(pairs.select(col("b").as("x"), col("a").as("y")))
      .distinct().localCheckpoint()
    var labels = edges.select(col("x").as("id")).distinct()
      .select(col("id"), col("id").as("label")).localCheckpoint()
    var changed = 1L; var it = 0
    while (changed > 0) {
      val t1 = System.nanoTime()
      val nbrMin = edges.join(labels.select(col("id").as("y"), col("label").as("ylabel")), "y")
        .groupBy(col("x").as("id")).agg(min(col("ylabel")).as("nmin"))
      val step = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("next"))
        .localCheckpoint()
      changed = step.filter(col("next") =!= col("label")).count()
      labels = step.select(col("id"), col("next").as("label"))
      it += 1
      println(f"[cc] iter=$it changed=$changed ${(System.nanoTime()-t1)/1e9}%.2fs")
    }
    spark.stop()
  }
}
