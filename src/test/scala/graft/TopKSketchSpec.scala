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

  test("null inputs are ignored") {
    TopKSketch.register(spark)
    val got = Seq(Some("x"), None, Some("x"), None).toDF("v")
      .agg(expr("topk_sketch(v, 4)").as("tk"))
      .select(explode(col("tk"))).as[(String, Long)].collect().toMap
    assert(got == Map("x" -> 2L))
  }
}
