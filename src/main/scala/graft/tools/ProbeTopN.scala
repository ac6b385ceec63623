package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** w_topn_group ×1000 experiment (r16 verdict item 5): does a sort-free
  * two-level top-k beat the window plan's two full sorts once per-task
  * group density drops to ~k? Three arms over the same events corpus,
  * identical output rows (the checksum pins it):
  *
  *   window   — the registered shape: row_number window + rn <= 3
  *              (Sort → WindowGroupLimit(Partial) → Exchange → Sort →
  *               WindowGroupLimit(Final) → Window)
  *   nolimit  — same, with the WindowGroupLimit rewrite disabled
  *              (spark.sql.optimizer.windowGroupLimitThreshold = -1):
  *              isolates what the partial limit buys/costs
  *   agg      — ops.TopK.groupedTopK: one LexTopK hash aggregate,
  *              map-side combined, zero sorts
  *
  *   runMain graft.tools.ProbeTopN <sfDir>
  */
object ProbeTopN {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.model.Tables(spark, dir, "events")

    // checksum folds (user_id, event_id, rn) so no arm can win by pruning
    // the ranking itself; equal checksums across arms pin row identity
    def time(label: String)(body: => (Long, Long)): Unit =
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val (n, sum) = body
        println(f"[topn] pass=$pass $label rows=$n checksum=$sum " +
          f"t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    def fold(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        sum(pmod(col("user_id") * 31 + col("event_id") * 7 + col("rn"),
          lit(1000000007L)))).head()
      (r.getLong(0), r.getLong(1))
    }

    val w = Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id").asc)
    def windowed = ev.select(col("user_id"), col("event_id"), col("value"),
        row_number().over(w).cast("int").as("rn"))
      .filter(col("rn") <= 3)

    time("window (registered shape)") { fold(windowed) }
    time("nolimit (WindowGroupLimit disabled)") {
      spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "-1")
      try fold(windowed)
      finally spark.conf.unset("spark.sql.optimizer.windowGroupLimitThreshold")
    }
    time("agg (LexTopK hash aggregate)") {
      fold(graft.ops.TopK.groupedTopK(ev, Seq("user_id"),
        col("event_id"), col("value"), -col("event_id"), 3,
        valueName = "event_id", ordName = "value"))
    }
    spark.stop()
  }
}
