package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.{IncrementalAgg, Layout}

class LayoutIncAggSpec extends SparkSpec {

  test("incremental state merge equals from-scratch aggregation (any split, any order)") {
    import spark.implicits._
    val rows = (1 to 997).map(i => (i.toLong, s"t${i % 5}", math.sin(i) * 100))
      .toDF("event_id", "event_type", "value")
    val keys = Seq("event_type")
    val scratch = IncrementalAgg.finish(IncrementalAgg.state(rows, keys, "value"))

    // three-way split, merged in two different shapes
    val parts = Seq(0, 1, 2).map(r => rows.filter(col("event_id") % 3 === r))
    val states = parts.map(IncrementalAgg.state(_, keys, "value"))
    val mergedA = IncrementalAgg.finish(IncrementalAgg.merge(keys, states: _*))
    val mergedB = IncrementalAgg.finish(IncrementalAgg.merge(keys,
      IncrementalAgg.merge(keys, states(2), states(0)), states(1)))

    val want = scratch.orderBy("event_type").collect().toSeq
    assert(mergedA.orderBy("event_type").collect().toSeq == want)
    assert(mergedB.orderBy("event_type").collect().toSeq == want)
  }

  test("signed state: delete cancels its insert exactly; emptied keys vanish") {
    import spark.implicits._
    val rows = (1 to 500).map(i => (i.toLong, s"t${i % 4}", math.sin(i) * 100))
      .toDF("event_id", "event_type", "value")
    val keys = Seq("event_type")
    // delete ALL of t0 and half of t1
    val dels = rows.filter(col("event_type") === "t0" ||
      (col("event_type") === "t1" && col("event_id") % 2 === 0))
    val merged = IncrementalAgg.signedFinish(IncrementalAgg.signedMerge(keys,
      IncrementalAgg.signedState(rows.withColumn("op", lit(1)), keys, "value", "op"),
      IncrementalAgg.signedState(dels.withColumn("op", lit(-1)), keys, "value", "op")))
    val survivors = rows.exceptAll(dels)
    val scratch = IncrementalAgg.signedFinish(
      IncrementalAgg.signedState(survivors.withColumn("op", lit(1)), keys, "value", "op"))
    val got = merged.orderBy("event_type").collect().toSeq
    assert(got == scratch.orderBy("event_type").collect().toSeq)
    assert(!got.exists(_.getString(0) == "t0"), "fully-retracted key must vanish")
    assert(got.exists(_.getString(0) == "t1"))
  }

  test("streaming foreachBatch maintenance: state table converges to from-scratch") {
    // The production loop i1 models: per micro-batch, aggregate ONLY the
    // delta, merge with the persisted |keys|-row state table, swap. The
    // 100 TB history is never re-read; this pins that the maintained state
    // equals a from-scratch aggregation over everything seen.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("incagg").toFile.getAbsolutePath
    val keys = Seq("k")
    var statePath: Option[String] = None
    val input = MemoryStream[(String, Double)]
    val q = input.toDF.toDF("k", "v").writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val delta = IncrementalAgg.state(batch, keys, "v")
        val merged = statePath match {
          case Some(p) => IncrementalAgg.merge(keys, spark.read.parquet(p), delta)
          case None    => delta
        }
        val next = s"$dir/state_$id"
        merged.write.mode("overwrite").parquet(next) // then swap the pointer
        statePath = Some(next)
        ()
      }.start()
    val batches = Seq(
      Seq(("a", 1.25), ("b", -2.0), ("a", 3.5)),
      Seq(("b", 10.0), ("c", 0.75)),
      Seq(("a", -0.25), ("c", 99.99), ("b", 0.01)))
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()

    val maintained = IncrementalAgg.finish(spark.read.parquet(statePath.get))
      .orderBy("k").collect().toSeq
    val scratch = IncrementalAgg.finish(
      IncrementalAgg.state(batches.flatten.toDF("k", "v"), keys, "v"))
      .orderBy("k").collect().toSeq
    assert(maintained == scratch)
  }

  test("z-value interleaves bits (known points) and matches its SQL form") {
    import spark.implicits._
    // interleave(x=0b101, y=0b011) = y2 x2 y1 x1 y0 x0 = 0b011011... compute:
    // x bits at even positions: 1,0,1 -> 1 + 0 + 16 = 17
    // y bits at odd positions:  1,1,0 -> 2 + 8 + 0 = 10 -> z = 27
    val df = Seq((5L, 3L)).toDF("x", "y")
    val z = df.select(Layout.zValue(col("x"), col("y"), bits = 4)).head.getLong(0)
    assert(z == 27L)
    val zSql = df.selectExpr(Layout.zValueSql("x", "y", bits = 4)).head.getLong(0)
    assert(zSql == 27L)
  }

  test("zValue widens IntegerType inputs: no sign-bit overflow at bits=16") {
    import spark.implicits._
    // y = 32768 sets bit 15, which interleaves to bit position 31 — the int
    // sign bit. Without the long widen this came back negative.
    val df = Seq((0, 32768), (32768, 0), (65535, 65535))
      .toDF("x", "y") // IntegerType columns
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y")).as("z"))
    val got = df.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (0, 32768, 1L << 31),
      (32768, 0, 1L << 30),
      (65535, 65535, (1L << 32) - 1)))
    assert(got.forall(_._3 >= 0L))
  }

  test("zorderWrite yields disjoint z-ranges and prunes files on BOTH dimensions") {
    import spark.implicits._
    val n = 4096
    val df = (0 until n).map { i => (i.toLong % 64, (i.toLong * 37) % 64, i.toLong) }
      .toDF("x", "y", "payload")
    val dir = Files.createTempDirectory("zorder").toFile
    dir.deleteOnExit()
    Layout.zorderWrite(df, "x", "y", dir.getAbsolutePath, files = 8, bits = 6)

    // Per-file min/max of BOTH source columns, as a parquet reader's footer
    // stats would expose them. Z-ordering must keep both tight: a point
    // predicate on either dimension may only touch a strict subset of files.
    val stats = spark.read.parquet(dir.getAbsolutePath)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("xlo"), max("x").as("xhi"),
        min("y").as("ylo"), max("y").as("yhi"))
      .collect()
    assert(stats.length >= 4, s"expected multiple files, got ${stats.length}")
    def touched(lo: String, hi: String, v: Long) =
      stats.count(r => r.getAs[Long](lo) <= v && v <= r.getAs[Long](hi))
    // With a linear sort on x, y ranges would be full-width in every file.
    // The Z-curve must prune at least half the files for a midpoint probe
    // on each dimension.
    assert(touched("xlo", "xhi", 13L) <= stats.length / 2,
      s"x probe touched ${touched("xlo", "xhi", 13L)} of ${stats.length} files")
    assert(touched("ylo", "yhi", 45L) <= stats.length / 2,
      s"y probe touched ${touched("ylo", "yhi", 45L)} of ${stats.length} files")
    // Round-trip: no rows lost or duplicated by the rewrite.
    assert(spark.read.parquet(dir.getAbsolutePath).count() == n)
  }
}
