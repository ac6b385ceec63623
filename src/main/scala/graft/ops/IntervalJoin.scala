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
    val i = intervals.select((Seq(col(keyCol).as("__k"), col(startCol).as("__s"),
        col(endCol).as("__e")) ++
        intervals.columns.map(c => col(c).as(s"i_$c"))): _*)
      .filter(col("__s") <= col("__e"))
      .withColumn("__bucket",
        explode(sequence(floor(col("__s") / bucketMicros), floor(col("__e") / bucketMicros))))
    p.join(i, Seq("__k", "__bucket"))
      .filter(col("__t") >= col("__s") && col("__t") <= col("__e"))
      .drop("__k", "__bucket", "__t", "__s", "__e")
  }
}
