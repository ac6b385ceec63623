package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builds the scaling-probe corpus (PLANS.md "Scaling probe"): the sf
  * documents table replicated `factor`× with a unique suffix token per
  * replica, so replicas are NEAR-dups of each other (the hard case for the
  * near-dup family — exact dedup can't collapse them first), and the
  * embeddings table replicated with a small deterministic per-replica
  * perturbation (replicas stay distinct vectors, so top-k rankings are not
  * degenerate ties).
  *
  *   runMain graft.tools.ScaleCorpus <srcSfDir> <outDir> <factor>
  *
  * Writes `<outDir>/documents.parquet` and `<outDir>/embeddings.parquet`
  * with ids offset per replica; point TimeQueries at <outDir> for any
  * documents/embeddings-only query. */
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
    val emb = graft.model.Tables(spark, src, "embeddings")
    val m = emb.count()
    val embReps = (0 until factor).map { r =>
      emb.select(
        (col("vec_id") + lit(r * m)).as("vec_id"),
        transform(col("embedding"),
          x => (x + lit(r * 1e-4f)).cast("float")).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
    embReps.repartition(32).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")
    println(s"[scale] wrote ${factor}x embeddings (${factor * m} vecs) to $out")
    spark.stop()
  }
}
