package graft.tools
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
object ProfD2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val agg = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) agg.merge(te.stageId, (m.executorRunTime, m.executorCpuTime/1000000, 1),
          (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        val (run, cpu, n) = agg.getOrDefault(si.stageId, (0L, 0L, 0))
        if (dur > 0.2) println(f"[stage] id=${si.stageId} tasks=$n wall=$dur%6.2f sumCpu=${cpu}ms")
      }
    })
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    try { spark.range(1000).selectExpr("id % 7 AS k").groupBy("k").count().count()
      graft.model.Tables(spark, sfDir, "documents").limit(10).count() } catch { case _: Throwable => () }
    (1 to 2).foreach { i =>
      time(s"d3 iter$i")(graft.SparkEntry.queries("d3_lsh_jaccard_pairs")(spark, sfDir).count())
    }
    spark.stop()
  }
}
