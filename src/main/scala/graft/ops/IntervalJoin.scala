package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range-containment (interval) join: points (key, t) matched to intervals
  * (key, start, end) with start <= t <= end — sessions-to-events, validity
  * windows, slowly-changing dimensions. Spark has no native range join: the
  * declarative form `p JOIN i ON p.key = i.key AND t BETWEEN start AND end`
  * becomes an equi-join on key whose every key-group is a nested loop — fine
  * until one key holds millions of points × thousands of intervals.
  *
  * Bucketized form (the standard scale fix, cf. Databricks' range-join
  * optimization): quantize time into width-`w` buckets, explode each interval
  * over the buckets it covers, equi-join on (key, bucket), then apply the
  * exact range predicate. Work becomes points × (span/w + 1) per key instead
  * of points × intervals; pick `w` near the median interval span so most
  * intervals explode to ≤ 2 buckets. All shuffles are equi-shuffles — AQE
  * skew-split applies if one (key, bucket) is hot.
  */
object IntervalJoin {

  /** `points`: (keyCol, tCol micros-long) · `intervals`: (keyCol, startCol,
    * endCol micros-long). Returns every (point row, interval row) pair with
    * containment, columns prefixed. Bounds inclusive on both ends. */
  def bucketed(points: DataFrame, intervals: DataFrame, keyCol: String,
               tCol: String, startCol: String, endCol: String,
               bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucket width must be positive")
    val p = points.select((Seq(col(keyCol).as("__k"), col(tCol).as("__t")) ++
        points.columns.map(c => col(c).as(s"p_$c"))): _*)
      .withColumn("__bucket", floor(col("__t") / bucketMicros))
    // Clamp interval explosion to the points' observed bucket range — one
    // tiny column-pruned aggregate to the driver buys a PROVABLE bound on
    // the blowup: buckets outside the range cannot contain any point, so
    // the clamp is exact, and an open-ended interval (an SCD2 current row
    // ending 9999-12-31) no longer explodes to ~10^8 bucket rows or past
    // sequence()'s 2.1B element cap (review finding).
    val bounds = p.agg(min(col("__bucket")), max(col("__bucket"))).head()
    val (lo, hi) =
      if (bounds.isNullAt(0)) (0L, 0L) // no points: any clamp yields 0 pairs
      else (bounds.getLong(0), bounds.getLong(1))
    val i = intervals.select((Seq(col(keyCol).as("__k"), col(startCol).as("__s"),
        col(endCol).as("__e")) ++
        intervals.columns.map(c => col(c).as(s"i_$c"))): _*)
      .filter(col("__s") <= col("__e"))
      // drop intervals entirely outside the point range BEFORE clamping —
      // a clamped sequence(start > stop) would count DOWN, not empty out
      .filter(floor(col("__e") / bucketMicros) >= lo &&
        floor(col("__s") / bucketMicros) <= hi)
      .withColumn("__bucket",
        explode(sequence(
          greatest(floor(col("__s") / bucketMicros), lit(lo)),
          least(floor(col("__e") / bucketMicros), lit(hi)))))
    p.join(i, Seq("__k", "__bucket"))
      .filter(col("__t") >= col("__s") && col("__t") <= col("__e"))
      .drop("__k", "__bucket", "__t", "__s", "__e")
  }
}
