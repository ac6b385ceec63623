package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Does `Dataset.observe` deliver its metrics when the action is
  * `localCheckpoint(eager = true)` (the Materialize.pin action)? If yes, the
  * CC loop's per-materialization convergence count can ride the checkpoint
  * job instead of being its own driver round-trip (r19 verdict #3). This
  * probe answers it empirically on this exact Spark build — the answer
  * hinges on checkpoint() running through withAction/SQLExecution, which is
  * version-dependent plumbing, not documented API. */
object ProbeObserve {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(100000).withColumn("flip", col("id") % 7)
    val obs = Observation("probe")
    val pinned = df.observe(obs, count(when(col("flip") === 0, 1)).as("n"))
      .localCheckpoint(true)
    // obs.get blocks forever if the metric never arrives, so bound the wait
    // ourselves: a timeout here IS the refutation.
    @volatile var got: Option[Map[String, Any]] = None
    val t = new Thread(() => { got = Some(obs.get) })
    t.setDaemon(true); t.start(); t.join(30000)
    println(s"[observe] after eager localCheckpoint: metrics=$got")
    println(s"[observe] pinned rows=${pinned.count()} (count of flip==0 expected 14286)")
    spark.stop()
  }
}
