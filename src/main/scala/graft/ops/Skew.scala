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

  import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

  /** Spark's hash() rejects MapType at analysis (map equality is
    * ill-defined), including maps nested inside structs/arrays — so the
    * content salt hashes only the hash-safe columns. Fewer salt inputs just
    * means coarser spread, never wrong results (the salt only partitions
    * work); a frame with NO hash-safe columns degrades to a single salt
    * bucket, i.e. plain unsalted aggregation. */
  private[graft] def hashSafe(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case s: StructType => s.fields.forall(f => hashSafe(f.dataType))
    case a: ArrayType => hashSafe(a.elementType)
    case _ => true
  }

  private def contentSalt(df: DataFrame, buckets: Int): Column = {
    val cols = df.schema.fields.filter(f => hashSafe(f.dataType))
      .map(f => col(f.name))
    if (cols.isEmpty) lit(0) else pmod(hash(cols.toIndexedSeq: _*), lit(buckets))
  }

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
    val salted = df.withColumn("__salt", contentSalt(df, buckets))
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
    * right side is too big to broadcast but far smaller than the left.
    *
    * Same bit-identical-rows caveat as [[saltedSum]]: left rows that are
    * exact duplicates share a salt and stay on one task, so a hot key made
    * of REPLICATED identical rows does not spread — dedup-with-multiplicity
    * first if that is the actual skew shape. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 buckets: Int = 8): DataFrame = {
    // deterministic content-derived salt — same SPARK-23207 rationale as
    // saltedSum (a retried map task must re-assign the SAME salt)
    val saltedLeft = left.withColumn("__salt", contentSalt(left, buckets))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
