package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Stage-level profiler for named SparkEntry queries:
  * `runMain graft.tools.ProfStages <sfDir> q1 q2 ...` — one warm pass, then
  * a measured pass per query printing every stage's task count, summed task
  * time, and shuffle record volumes. This is the tool that found the AQE
  * explosive-join blind spot (PLANS.md round 8): a stage whose taskTime is
  * large but whose task count is 2-3 on a 32-core host means byte-based
  * partition coalescing fused an expanding join onto too few cores. */
object ProfStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("d13_lexical_neardup")
    // Width override mirrors TimeQueries' SPARK_GRAFT_SHUFFLE so spill/GC
    // effects of the volume-derived pair-join width can be profiled A/B.
    // SPARK_GRAFT_CPUS additionally sets the master's core count (default
    // 32, the bench's 32-core leg) so a stage profile can be taken at the
    // driver's 8-core leg too — the join_fuzzy width adjudication (r19
    // verdict #1) needs like-for-like stage rows at both widths.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val width = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", width)
      .config(graft.model.Tables.ShuffleWriterThreshold._1, graft.model.Tables.ShuffleWriterThreshold._2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var collect = false
    StageProf.attachPrinter(spark)(() => collect)
    graft.model.Tables(spark, sfDir, "documents").limit(1).count()
    for (n <- names) {
      graft.SparkEntry.queries(n)(spark, sfDir).count() // warm
      println(s"== $n ==")
      collect = true
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(n)(spark, sfDir).count()
      StageProf.drain() // async bus: don't lose the final stage lines
      collect = false
      println(f"[q] $n rows=$rows wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
