package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for cluster-scale joins and aggregations.
  *
  * AQE's skew-join split handles sort-merge skew automatically
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default); these helpers
  * cover the cases AQE does not: skewed *aggregation* keys and broadcast-
  * ineligible skewed joins. Both are pure DataFrame rewrites — no custom
  * physical operators needed.
  */
object Skew {

  /** Salted two-phase aggregation: groupBy(keys + salt) partial, then final
    * groupBy(keys) — sum and count are merge-associative, so the rollup is
    * exact. Turns one hot key's single reducer into `buckets` parallel
    * reducers; output: (keys..., sum_<valueCol>, n).
    *
    * The salt is DETERMINISTIC (content hash), not monotonically_increasing_id:
    * a nondeterministic expression feeding a shuffle is the SPARK-23207
    * hazard — on a partial stage retry the recomputed map tasks assign
    * different salts, so rows land in different reduce partitions than the
    * surviving ones consumed, silently double-counting or dropping them
    * (review finding). The trade: rows that are bit-identical share a salt
    * and stay on one reducer — pre-aggregate exact duplicates first if that
    * is the actual skew shape. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                buckets: Int = 32): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col): _*), lit(buckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("n"))
  }

  /** Salted join for a skewed left side against a non-broadcastable right
    * side: left rows get a random salt in [0, buckets); right rows are
    * replicated `buckets` times. The hot key spreads over `buckets` tasks at
    * the cost of replicating the right side — the classic trade when the
    * right side is too big to broadcast but far smaller than the left. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 buckets: Int = 8): DataFrame = {
    // deterministic content-derived salt — same SPARK-23207 rationale as
    // saltedSum (a retried map task must re-assign the SAME salt)
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(buckets)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
