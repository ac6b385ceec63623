package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A5: the Kibana dashboard layer (reference `README.md:25-27,43-44`,
  * `detail.png`) — score distributions, trends, per-class stats. No code in
  * the reference (config lives inside Kibana); semantics reconstructed as the
  * standard OLAP aggregates those dashboards are built from.
  *
  * All single-shuffle groupBy aggregates with map-side partial aggregation;
  * the distinct-count variants offer both exact and sketch
  * (`approx_count_distinct`, constant memory) forms — at 100 TB the sketch is
  * the default and the exact form is the audit path.
  */
object Dashboards {

  /** Score histogram: distribution of a numeric column in fixed-width bins. */
  def histogram(df: DataFrame, valueCol: String, binWidth: Double): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy((floor(col(valueCol) / binWidth) * binWidth).as("bin_lo"))
      .agg(count(lit(1)).as("n"))

  /** Date histogram: daily counts + basic stats of a value column. */
  def dateHistogram(df: DataFrame, tsCol: String, valueCol: String): DataFrame =
    df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol)).as("total"),
        avg(col(valueCol)).as("mean"),
        min(col(valueCol)).as("lo"),
        max(col(valueCol)).as("hi"))

  /** Per-group stats: avg/count/distinct-entity, exact. */
  def groupStats(df: DataFrame, groupCols: Seq[String], valueCol: String,
                 entityCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        avg(col(valueCol)).as("mean"),
        countDistinct(col(entityCol)).as("n_entities"))

  /** Winsorization: clip a value column to its per-group [lo, hi] exact
    * percentiles — the robust-statistics guard dashboards apply before
    * means/trends so a single fat-finger value can't swamp a panel.
    *
    * Scale shape: the bounds frame is |groups| rows (one exact-percentile
    * aggregate) and comes back as a broadcast; the clip itself is map-only.
    * At 100 TB swap `percentile` for `approx_percentile` (mergeable GK
    * sketch, same plan shape) — the exact form is the audit path, mirroring
    * the a5 percentile pair. */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
                lo: Double, hi: Double): DataFrame = {
    require(0 <= lo && lo < hi && hi <= 1, "need 0 <= lo < hi <= 1")
    val bounds = df.groupBy(groupCols.map(col): _*).agg(
      percentile(col(valueCol), lit(lo)).as("__lo"),
      percentile(col(valueCol), lit(hi)).as("__hi"))
    df.join(broadcast(bounds), groupCols)
      .withColumn(valueCol + "_w",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Sketch form: HLL++ distinct entities — constant memory per group,
    * mergeable across partitions; the 100 TB default. */
  def groupStatsApprox(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       entityCol: String, rsd: Double = 0.01): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        avg(col(valueCol)).as("mean"),
        approx_count_distinct(col(entityCol), rsd).as("n_entities_approx"))
}
