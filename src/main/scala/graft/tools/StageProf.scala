package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, StageInfo}
import org.apache.spark.sql.SparkSession

/** Shared stage-completion profiling for the probe tools — ONE listener
  * definition instead of the three drifted inline copies ProfStages /
  * ProbeChunk / ProbeAnn had grown (review finding).
  *
  * Two hazards this centralizes:
  *  - listener-bus events are ASYNCHRONOUS: a probe that flips its collect
  *    flag off (or reads accumulated totals) the moment the measured body
  *    returns can silently lose the final stages of the job — typically
  *    the aggregate stage that was the probe's whole point. Call [[drain]]
  *    first.
  *  - format drift: [[line]] prints the superset every tool needs (tasks,
  *    summed task time, shuffle records AND bytes, both directions). */
object StageProf {

  def attach(spark: SparkSession)(f: StageInfo => Unit): Unit =
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        f(sc.stageInfo)
    })

  /** Attach a printer gated on `enabled` (read per event, so a @volatile
    * flag in the caller works). */
  def attachPrinter(spark: SparkSession)(enabled: () => Boolean): Unit =
    attach(spark)(i => if (enabled()) println(line(i)))

  def line(i: StageInfo): String = {
    val m = i.taskMetrics
    f"[stage] id=${i.stageId}%-4d tasks=${i.numTasks}%-3d " +
      f"taskTime=${m.executorRunTime / 1e3}%7.1fs " +
      f"gc=${m.jvmGCTime / 1e3}%5.1fs " +
      f"spill=${m.memoryBytesSpilled / 1e6}%6.1f MB " +
      f"shufRead=${m.shuffleReadMetrics.recordsRead}%10d rec " +
      f"${m.shuffleReadMetrics.totalBytesRead / 1e6}%7.1f MB " +
      f"shufWrite=${m.shuffleWriteMetrics.recordsWritten}%10d rec " +
      f"${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.1f MB"
  }

  /** Best-effort listener-bus drain. The bus exposes no public flush, so
    * this sleeps long enough for stage-completed events of a just-finished
    * job to be delivered on an otherwise idle driver. */
  def drain(): Unit = Thread.sleep(500)
}
