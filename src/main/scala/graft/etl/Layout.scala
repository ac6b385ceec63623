package graft.etl

import org.apache.spark.Partitioner
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order data layout — multi-dimensional clustering for parquet data
  * skipping. Sorting files by the interleaved-bit curve keeps BOTH columns'
  * per-file min/max ranges tight, so a scan with a predicate on either (or
  * both) dimensions prunes most files from the footer statistics alone — at
  * 100 TB the difference between reading 100 TB and reading the two row
  * groups a dashboard filter actually touches.
  */
object Layout {

  /** Morton (Z-curve) value: the low `bits` bits of two non-negative int
    * columns, interleaved (x in even positions, y in odd). Pure integer
    * arithmetic, reproducible in any engine.
    *
    * Inputs are widened to long BEFORE the shift loop: `shiftleft` keeps its
    * input's width, so with IntegerType inputs at the default bits=16, y's
    * bit 15 would land in the int sign bit (position 31) and silently yield
    * negative z-values. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    val (xl, yl) = (x.cast("long"), y.cast("long"))
    (0 until bits).map { b =>
      shiftleft(shiftright(xl, b).bitwiseAND(1), 2 * b) +
        shiftleft(shiftright(yl, b).bitwiseAND(1), 2 * b + 1)
    }.reduce(_ + _)
  }

  /** The identical expression as SQL text (for oracles / other engines);
    * the same widen-to-BIGINT-before-shifting as [[zValue]]. */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { b =>
      s"(((CAST($x AS BIGINT) >> $b) & 1) << ${2 * b}) + " +
        s"(((CAST($y AS BIGINT) >> $b) & 1) << ${2 * b + 1})"
    }.mkString("CAST(", " + ", " AS BIGINT)")

  /** Key IS the partition id — buckets are already 0..n-1. */
  private class IdPartitioner(n: Int) extends Partitioner {
    def numPartitions: Int = n
    def getPartition(key: Any): Int = key.asInstanceOf[Int]
  }

  /** Rewrite a table Z-ordered on (xCol, yCol): assign each row's z-value to
    * one of `files` equal-width z-buckets, route bucket i to output file i
    * exactly, sort within each, write. File z-ranges are disjoint BY
    * CONSTRUCTION — hence tight per-file min/max on both source columns and
    * a reproducible layout (same input → byte-identical file boundaries).
    *
    * `repartitionByRange` is deliberately NOT used here: its range bounds
    * come from a reservoir-sampling pass, so file boundaries shift
    * run-to-run — this repo treats layout reproducibility as a contract.
    * The DataFrame API has no exact "partition = this column" partitioner,
    * so the routing drops to an RDD `partitionBy` for the one shuffle of
    * the write job (a rewrite utility, not a query hot path). Buckets are
    * equal-width in z-space, not equal-count: heavily skewed keys give
    * uneven file sizes — pick `files`/`bits` for the key distribution. */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, path: String,
                  files: Int = 8, bits: Int = 16): Unit = {
    require(files > 0 && bits > 0 && bits <= 16)
    val mask = (1 << bits) - 1
    val zSpan = (1L << (2 * bits)).toDouble // z*files < 2^35 — exact in double
    val staged = df
      .withColumn("__z",
        zValue(col(xCol).bitwiseAND(mask), col(yCol).bitwiseAND(mask), bits))
      .withColumn("__b",
        least(lit(files - 1), floor(col("__z") * files / zSpan)).cast("int"))
    val routed = staged.rdd.keyBy(_.getAs[Int]("__b"))
      .partitionBy(new IdPartitioner(files)).values
    staged.sparkSession.createDataFrame(routed, staged.schema)
      .sortWithinPartitions("__z")
      .drop("__z", "__b")
      .write.mode("overwrite").parquet(path)
  }
}
