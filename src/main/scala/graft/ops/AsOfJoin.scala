package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single right row with the greatest
  * `rightTime <= leftTime` in the same key group (the time-series "latest
  * value at or before" join — Spark has no native operator for it).
  *
  * Implemented as union + one keyed window pass rather than a range join:
  * both sides shuffle ONCE on the key, each partition is sorted once by
  * time, and `last(_, ignoreNulls)` carries the most recent right-side
  * values forward onto left rows. A join + per-left-row max-aggregate would
  * shuffle twice and build an O(|L|·|R|) intermediate on hot keys; this form
  * is O(|L| + |R|) per key group and AQE-splittable — the property that
  * matters when both sides are 100 TB event streams.
  *
  * Right rows must be unique per (keys, rightTime) — pre-arbitrate with
  * e.g. Upsert.latestByKey otherwise.
  */
object AsOfJoin {

  /** @param rightVals right-side value columns to carry onto left rows
    *                   (null when no right row is at or before the left row —
    *                   left-outer as-of semantics, matching ASOF LEFT JOIN). */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightVals.toSet.intersect(leftCols.toSet).isEmpty,
      s"rightVals ${rightVals.toSet.intersect(leftCols.toSet)} collide with left columns")
    require(!(leftCols ++ right.columns).exists(Set("__t", "__side")),
      "__t/__side are reserved by asOf")
    // Common shape: keys ++ __t ++ __side ++ leftCols' ++ rightVals
    // (left-only columns null on right rows and vice versa).
    val lPart = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val lAll = lPart.select(
      (keys.map(col) :+ col("__t") :+ col("__side")) ++
        leftCols.filterNot(keys.contains).map(col) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rAll = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(
        (keys.map(col) :+ col("__t") :+ col("__side")) ++
          leftCols.filterNot(keys.contains).map(c =>
            lit(null).cast(left.schema(c).dataType).as(c)) ++
          rightVals.map(col): _*)

    // Right rows sort before left rows at the same timestamp, so an exact
    // tie is visible to the left row (ASOF's <= semantics).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(lAll.unionByName(rAll)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__t", "__side")
  }
}
