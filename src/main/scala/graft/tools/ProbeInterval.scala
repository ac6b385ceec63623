package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale probe for the interval-join bucket-range clamp: an SCD2-shaped
  * dimension (per-user version chains whose CURRENT row ends at the
  * 9999-12-31 sentinel) joined to the events table as points, at 1-hour
  * buckets.
  *
  * Without the clamp each current row explodes to sentinel/bucket ≈ 7·10^13
  * bucket rows — the query is dead at ANY scale (sequence() refuses past
  * 2.1B elements). With the clamp every interval is bounded by the points'
  * observed bucket range (~720 hourly buckets at sf0.1), so the probe
  * measures an ordinary bounded join. Two passes; the warm one is the
  * reading. `runMain graft.tools.ProbeInterval <sfDir>`
  */
object ProbeInterval {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // second arg: bucket micros, or "derived" to exercise the no-knob
    // median-length auto-width (the production default)
    val bucketArg = args.drop(1).headOption.getOrElse("3600000000")
    val bucketUs: Option[Long] =
      if (bucketArg == "derived") None else Some(bucketArg.toLong)
    val width = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", width)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = graft.model.Tables(spark, sfDir, "events")
    val pts = e.select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("t_us"))
    // SCD2 chain: every 97th event opens a version; end = next start − 1,
    // current row ends at the 9999-12-31 sentinel (the shape that
    // motivated the clamp)
    val sentinel = 253402300799000000L
    val w = Window.partitionBy("user_id").orderBy("start_us")
    val ivs = e.filter(col("event_id") % 97 === 0)
      .select(col("event_id").as("ver_id"), col("user_id"),
        unix_micros(col("ts")).as("start_us"))
      .withColumn("end_us",
        coalesce(lead(col("start_us"), 1).over(w) - 1L, lit(sentinel)))

    val nOpen = ivs.filter(col("end_us") === sentinel).count()
    for (pass <- Seq("cold", "warm")) {
      val t0 = System.nanoTime()
      val n = bucketUs match {
        case Some(b) => graft.ops.IntervalJoin.bucketed(pts, ivs, "user_id",
          "t_us", "start_us", "end_us", bucketMicros = b).count()
        case None => graft.ops.IntervalJoin.bucketed(pts, ivs, "user_id",
          "t_us", "start_us", "end_us").count()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"interval_scd2","pass":"$pass","sf":"$sfDir","bucket_us":"$bucketArg","pairs":$n,"open_intervals":$nOpen,"sec":$sec%.1f}""")
    }
    spark.stop()
  }
}
