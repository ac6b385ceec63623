package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-micro-batch wall decomposition for the streaming replay rungs (r19
  * verdict #4: the replay family is ~26 % of the bench with scaling ratio
  * ≈1 — before touching any knob, prove where a batch's ~0.3-0.4 s goes).
  *
  *   runMain graft.tools.ProbeReplay <sfDir> q1 q2 ...
  *
  * Attaches a StreamingQueryListener and, for each named SparkEntry replay
  * query, sums the engine's own per-trigger durationMs decomposition over
  * every progress event of the run: triggerExecution (total), and its
  * components latestOffset/getBatch (source), queryPlanning (per-batch
  * incremental plan), walCommit (offset log fsync), addBatch (the actual
  * work incl. sink append + state commit), commitOffsets (commit log
  * fsync). Also sums stateOperators commit times where present. The gap
  * between ΣtriggerExecution and the query wall is harness cost (staging,
  * query start/stop, sink re-read). */
object ProbeReplay {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("sess_stream_replay")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val keys = Seq("triggerExecution", "latestOffset", "getBatch",
      "queryPlanning", "walCommit", "addBatch", "commitOffsets")
    val sums = scala.collection.concurrent.TrieMap.empty[String, Long]
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val stateCommit = new java.util.concurrent.atomic.AtomicLong(0L)
    @volatile var collect = false
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (collect) {
          batches.incrementAndGet()
          val d = e.progress.durationMs
          for (k <- keys; v = d.get(k) if v != null)
            sums.updateWith(k) { prev => Some(prev.getOrElse(0L) + v.longValue()) }
          for (op <- e.progress.stateOperators)
            stateCommit.addAndGet(op.commitTimeMs)
        }
    })

    graft.model.Tables(spark, sfDir, "documents").limit(1).count()
    for (n <- names) {
      println(s"== $n ==")
      sums.clear(); batches.set(0); stateCommit.set(0L)
      collect = true
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(n)(spark, sfDir).count()
      // progress events are async; give the bus a moment
      Thread.sleep(700)
      collect = false
      val wall = (System.nanoTime() - t0) / 1e9
      val nb = math.max(batches.get(), 1)
      println(f"[replay] $n rows=$rows wall=$wall%.2fs batches=${batches.get()}")
      for (k <- keys) {
        val tot = sums.getOrElse(k, 0L) / 1e3
        println(f"[replay]   $k%-16s total=$tot%6.2fs per-batch=${tot / nb}%6.3fs")
      }
      println(f"[replay]   stateCommit      total=${stateCommit.get() / 1e3}%6.2fs " +
        f"per-batch=${stateCommit.get() / 1e3 / nb}%6.3fs")
      val trig = sums.getOrElse("triggerExecution", 0L) / 1e3
      println(f"[replay]   harness(wall-Σtrigger)=${wall - trig}%.2fs")
    }
    spark.stop()
  }
}
