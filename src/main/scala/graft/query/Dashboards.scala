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
