package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builds the scaling-probe corpus (PLANS.md "Scaling probe"): the sf
  * documents table replicated `factor`× with a unique suffix token per
  * replica, so replicas are NEAR-dups of each other (the hard case for the
  * near-dup family — exact dedup can't collapse them first).
  *
  *   runMain graft.tools.ScaleCorpus <srcSfDir> <outDir> <factor>
  *
  * Writes `<outDir>/documents.parquet` with doc_id offset per replica;
  * point TimeQueries at <outDir> for any documents-only query. */
object ScaleCorpus {
  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args.take(3)
    val factor = factorS.toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.model.Tables(spark, src, "documents")
    val n = docs.count()
    val reps = (0 until factor).map { r =>
      docs.select(
        (col("doc_id") + lit(r * n)).as("doc_id"),
        concat(col("text"), lit(s" rep$r")).as("text"),
        col("source"))
    }.reduce(_ unionByName _)
    reps.repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
    println(s"[scale] wrote ${factor}x corpus (${factor * n} docs) to $out")
    spark.stop()
  }
}
