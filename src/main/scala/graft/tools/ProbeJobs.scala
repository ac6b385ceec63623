package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Job-level profiler for named SparkEntry queries — the driver-latency
  * counterpart of [[ProfStages]]: where ProfStages says what each STAGE
  * cost in executor time, this says how many sequential driver round-trips
  * (jobs) a query runs and where the WALL goes between them. The r19
  * verdict's d14/CC-loop items are driver-latency items (scaling ratio ≈1,
  * ~25 sub-second stages): the lever is fewer/overlapped jobs, and this is
  * the tool that scores it.
  *
  *   runMain graft.tools.ProbeJobs <sfDir> q1 q2 ...
  *
  * Per query: one warm pass, then a measured pass printing each job's
  * wall, stage count and task count, plus the GAP (driver idle between the
  * previous job's end and this job's start — scheduling + planning +
  * driver-side scalar handling). Σgap is the fusible/overlappable budget.
  * Honors SPARK_GRAFT_CPUS / SPARK_GRAFT_SHUFFLE like ProfStages. */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("d14_prefix_neardup")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val width = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", width)
      .config(graft.model.Tables.ShuffleWriterThreshold._1, graft.model.Tables.ShuffleWriterThreshold._2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class J(id: Int, start: Long, var end: Long = 0L,
                       var stages: Int = 0, var tasks: Int = 0,
                       var site: String = "")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    @volatile var collect = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (collect) {
        val j = J(e.jobId, e.time, stages = e.stageInfos.size,
          tasks = e.stageInfos.map(_.numTasks).sum,
          site = Option(e.properties).map(p =>
            "exec=" + Option(p.getProperty("spark.sql.execution.id")).getOrElse("-") +
            " " + Option(p.getProperty("callSite.short")).getOrElse("")).getOrElse(""))
        jobs.put(e.jobId, j); order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.end = e.time
      }
    })

    graft.model.Tables(spark, sfDir, "documents").limit(1).count()
    for (n <- names) {
      graft.SparkEntry.queries(n)(spark, sfDir).count() // warm
      println(s"== $n ==")
      jobs.clear(); order.clear(); collect = true
      val t0 = System.currentTimeMillis()
      val rows = graft.SparkEntry.queries(n)(spark, sfDir).count()
      StageProf.drain()
      collect = false
      val t1 = System.currentTimeMillis()
      import scala.jdk.CollectionConverters._
      var prevEnd = t0
      var gapSum = 0L; var jobSum = 0L
      for (id <- order.asScala; j = jobs.get(id) if j != null) {
        val gap = math.max(j.start - prevEnd, 0L)
        gapSum += gap; jobSum += math.max(j.end - j.start, 0L)
        println(f"[job] id=${j.id}%-4d wall=${(j.end - j.start) / 1e3}%6.2fs " +
          f"gap=${gap / 1e3}%5.2fs stages=${j.stages}%-3d tasks=${j.tasks}%-4d ${j.site}%s")
        prevEnd = math.max(j.end, prevEnd)
      }
      println(f"[q] $n rows=$rows wall=${(t1 - t0) / 1e3}%.2fs " +
        f"jobs=${order.size} jobSum=${jobSum / 1e3}%.2fs gapSum=${gapSum / 1e3}%.2fs")
      // Catalyst phase costs for one fresh build of the same query (what a
      // bench pass pays before any job runs): driver-side, single-threaded.
      val qe = graft.SparkEntry.queries(n)(spark, sfDir).queryExecution
      qe.executedPlan // force analysis -> optimization -> physical planning
      val ph = qe.tracker.phases.toSeq.sortBy(_._2.startTimeMs)
        .map { case (k, s) => f"$k=${s.endTimeMs - s.startTimeMs}ms" }
      println(s"[q] $n phases: ${ph.mkString(" ")}")
    }
    spark.stop()
  }
}
