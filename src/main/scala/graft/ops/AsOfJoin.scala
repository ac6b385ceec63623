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
    require(!(leftCols ++ right.columns).exists(Set("__t", "__side", "__rv", "__last")),
      "__t/__side/__rv/__last are reserved by asOf")
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
    // ONE struct carry, not one last() per value column: the per-column
    // form picked each column's latest NON-NULL value independently, so a
    // right row carrying a null skipped backward to an older row for that
    // column — returning a stale value instead of the latest row's null,
    // and with several rightVals a franken-row mixing fields of different
    // right rows (review finding). The struct is non-null for every RIGHT
    // row (a struct of null fields is not itself null), null on left rows,
    // so ignoreNulls still skips exactly the left rows and the whole
    // latest right ROW is carried — including its nulls.
    val packed = lAll.unionByName(rAll)
      .withColumn("__rv",
        when(col("__side") === 0, struct(rightVals.map(col): _*)))
      .withColumn("__last", last(col("__rv"), ignoreNulls = true).over(w))
    packed.filter(col("__side") === 1)
      .select(
        (keys.map(col) ++ leftCols.filterNot(keys.contains).map(col) ++
          rightVals.map(c => col(s"__last.$c").as(c))): _*)
  }
}
