package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKSketch

/** Misra-Gries top-k sketch: exactness under capacity, merge correctness,
  * bounded error over capacity. */
class TopKSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact counts when distinct values fit the capacity") {
    TopKSketch.register(spark)
    val df = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c")
    val got = df.toDF("v").repartition(7) // force partial-aggregate merges
      .agg(expr("topk_sketch(v, 16)").as("tk"))
      .select(explode(col("tk"))).as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 50L, "b" -> 30L, "c" -> 20L))
  }

  test("over capacity: heavy hitter survives with bounded undercount") {
    TopKSketch.register(spark)
    val heavy = Seq.fill(500)("HH")
    val noise = (1 to 400).map(i => s"n$i")
    val got = (heavy ++ noise).toDF("v").repartition(5)
      .agg(expr("topk_sketch(v, 8)").as("tk"))
      .select(explode(col("tk"))).as[(String, Long)].collect().toMap
    assert(got.contains("HH"))
    // Misra-Gries undercount bound: true - n/capacity <= est <= true
    assert(got("HH") <= 500L && got("HH") >= 500L - (900L / 8))
    assert(got.size <= 8)
  }

  test("merge keeps a heavy hitter arriving at a full buffer (capacity 1)") {
    // Round-1 bug: with capacity=1, partials {A:400} merge {B:600} dropped B
    // entirely. Weighted MG must keep B with count 600-400=200.
    TopKSketch.register(spark)
    // Two partitions, one value each -> merge of two single-entry buffers.
    val df = (Seq.fill(400)(("A", 0)) ++ Seq.fill(600)(("B", 1)))
      .toDF("v", "p").repartition(2, col("p"))
    val got = df.agg(expr("topk_sketch(v, 1)").as("tk"))
      .select(explode(col("tk"))).as[(String, Long)].collect().toMap
    assert(got.keySet == Set("B"), s"heavy hitter lost: $got")
    assert(got("B") >= 600L - 400L && got("B") <= 600L)
  }

  test("column form survives names the SQL parser cannot round-trip; capacity >= 1") {
    // topkSketch used to string-render the Column through expr(), which
    // breaks for any name needing quoting (review finding) — the bridge
    // form takes the expression directly.
    val df = Seq("a", "a", "b").toDF("event type") // space in the name
    val m = df.agg(graft.functions.TopKSketch
        .topkSketch(col("`event type`"), 4).as("top"))
      .collect().head.getMap[String, Long](0)
    assert(m("a") == 2L && m("b") == 1L)
    intercept[IllegalArgumentException] {
      graft.functions.TopKSketch.topkSketch(col("x"), 0)
    }
  }

  test("null inputs are ignored") {
    TopKSketch.register(spark)
    val got = Seq(Some("x"), None, Some("x"), None).toDF("v")
      .agg(expr("topk_sketch(v, 4)").as("tk"))
      .select(explode(col("tk"))).as[(String, Long)].collect().toMap
    assert(got == Map("x" -> 2L))
  }
}
