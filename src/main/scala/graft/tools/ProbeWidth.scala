package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot probe: what pair-join width does the candidate-volume
  * derivation pick for a corpus, and what is the underlying Σdf²?
  * `runMain graft.tools.ProbeWidth <sfDir> [n]`
  *
  * The prefix index is built by the SAME `Dedup.prefixIndexFrame` d14
  * executes (not a hand-copied twin), so the reported genVol/cand numbers
  * stay true to the operator's plan across future changes to its
  * indexing. */
object ProbeWidth {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // empty posting frames yield null sum() cells — report 0, don't NPE
    def longAt(r: org.apache.spark.sql.Row, i: Int): Long =
      if (r.isNullAt(i)) 0L else r.getLong(i)
    val docs = graft.model.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val posts = graft.ops.Dedup.cappedPostingsWithTf(docs, "text", n, 0.2, 1000)._2
    println(s"[probe] n=$n postings=${posts.count()} " +
      s"sumDf=${longAt(posts.agg(sum(col("df"))).head(), 0)} " +
      s"width=${graft.ops.Dedup.pairJoinWidth(posts)}")
    // d14's stage-volume derivation, on d14's own index (threshold 0.8)
    val idx = graft.ops.Dedup.prefixIndexFrame(posts, 0.8)
      .localCheckpoint(true)
    val genVol = longAt(idx.groupBy("term").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c"))).head(), 0)
    val cand = idx.select(col("term"), col("doc_id").as("a"))
      .join(idx.select(col("term"), col("doc_id").as("b")), Seq("term"))
      .filter(col("a") < col("b")).select("a", "b").distinct()
    println(s"[probe] idx=${idx.count()} genVol=$genVol cand=${cand.count()}")
    spark.stop()
  }
}
