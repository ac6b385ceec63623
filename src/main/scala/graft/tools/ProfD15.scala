package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Phase profile of the d13-vs-d15 warm gap, with per-stage task metrics
  * (task count, total task time, input/shuffle volumes) so the slow stage
  * is identified by measurement, not plan reading. */
object ProfD15 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var collect = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (collect) {
          val i = sc.stageInfo
          val m = i.taskMetrics
          println(f"[stage] id=${i.stageId}%-4d tasks=${i.numTasks}%-3d " +
            f"taskTime=${m.executorRunTime / 1e3}%7.1fs " +
            f"shufRead=${m.shuffleReadMetrics.recordsRead}%10d rec " +
            f"shufWrite=${m.shuffleWriteMetrics.recordsWritten}%10d rec  " +
            i.name.takeWhile(_ != '\n').take(60))
        }
    })
    val docs = graft.model.Tables(spark, sfDir, "documents")
    docs.limit(1).count()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p] $tag%-16s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    // warm pass, no stage noise
    t("warm_d13") { graft.ops.Dedup.lexicalNearDup(docs, "text", 0.8, 0.2, 3).count() }
    collect = true
    println("== d13 ==")
    t("full_d13") { graft.ops.Dedup.lexicalNearDup(docs, "text", 0.8, 0.2, 3).count() }
    println("== d15 ==")
    t("full_d15") { graft.ops.Dedup.lexicalNearDupIdf(docs, "text", 0.8, 0.2, 3).count() }
    spark.stop()
  }
}
