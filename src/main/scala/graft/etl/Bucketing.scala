package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table co-located joins: the storage-layout half of shuffle
  * elimination. Writing a table with `bucketBy(n, key)` pins a
  * hash-partitioning ON DISK; every later join or aggregation keyed on the
  * bucket column then satisfies its required distribution straight off the
  * scan — no Exchange, at any number of re-reads. This is how a 100 TB fact
  * table amortizes its one big shuffle: pay it once at write time, never
  * again at query time (complements [[Layout.zorderWrite]], which pins a
  * sort-order for pruning; buckets pin a partitioning for joins).
  *
  * PlanChecksSpec pins the zero-Exchange plan; the `l2_bucketed_join` oracle
  * certifies the result equals the plain shuffled join.
  */
object Bucketing {

  /** Write `df` as an external parquet table bucketed (and in-bucket sorted)
    * by `key` at `path`, registered as `table` (dropped first if present —
    * the write is an idempotent rebuild). */
  def writeBucketed(df: DataFrame, table: String, path: String, key: String,
                    buckets: Int): DataFrame = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)
    spark.table(table)
  }

  /** Enrich every event with its user's exact fixed-point value total, both
    * sides read from ONE bucketed table: the per-user aggregate needs no
    * Exchange (bucket distribution already satisfies it) and the join of
    * aggregate-back-to-rows needs none either — the whole query runs
    * shuffle-free off the layout. Values are 1e-2 fixed-point BIGINTs so the
    * total is an order-independent integer sum. */
  def bucketedUserTotals(spark: SparkSession, events: DataFrame, dir: String,
                         buckets: Int = 8): DataFrame = {
    val t = writeBucketed(
      events.select(col("event_id"), col("user_id"),
        round(col("value") * 100).cast("long").as("value_c")),
      "graft_events_bucketed", s"$dir/graft_events_bucketed", "user_id", buckets)
    val totals = t.groupBy("user_id").agg(sum(col("value_c")).as("user_total_c"))
    t.join(totals, Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("value_c"), col("user_total_c"))
  }
}
