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
      // Same extensions as Verify/Bench: t16_grade_band_ext resolves the
      // injected grade_scale routine, so the sweep can cover all 159.
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config(model.Tables.ShuffleWriterThreshold._1, model.Tables.ShuffleWriterThreshold._2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (names == Seq("--sweep")) sweep(spark, sfDir)
    else names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }

  /** `runMain graft.Explain <sfDir> --sweep` — one line per REGISTERED query
    * summarizing its formatted physical plan (exchange count, join
    * strategies, scans with/without PushedFilters, cartesian/BNLJ flags), so "all ~150 untouched plans are clean" is a
    * committed, diffable artifact instead of a /tmp claim (r19 verdict #6).
    * Streaming replay rungs execute at build time — run at a small sf. */
  private def sweep(spark: SparkSession, sfDir: String): Unit = {
    val nodeRe = """\(\d+\) ([A-Za-z]+)""".r
    val pushedRe = """PushedFilters: \[(.*?)\]""".r
    for (n <- SparkEntry.queries.keys.toSeq.sorted) {
      val line = try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val nodes = nodeRe.findAllMatchIn(plan).map(_.group(1)).toSeq
        val joins = nodes.filter(s => s.contains("Join") || s == "CartesianProduct")
          .groupBy(identity).map { case (k, v) => s"$k:${v.size}" }.toSeq.sorted
        val pushed = pushedRe.findAllMatchIn(plan).map(_.group(1).trim).toSeq
        f"$n%-28s exchanges=${nodes.count(_ == "Exchange")}%-3d " +
          f"joins=${if (joins.isEmpty) "-" else joins.mkString(",")}%s " +
          f"scans=${nodes.count(_.startsWith("Scan"))} " +
          f"pushed=${pushed.count(_.nonEmpty)}/${pushed.size} " +
          f"cartesian=${nodes.count(_ == "CartesianProduct")} " +
          f"bnlj=${nodes.count(_ == "BroadcastNestedLoopJoin")}"
      } catch { case e: Throwable => s"$n ERROR ${e.getClass.getSimpleName}: ${e.getMessage.take(100)}" }
      println(s"[sweep] $line")
    }
  }
}
