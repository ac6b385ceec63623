package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.LexTopK
import graft.ops.TopK

/** LexTopK — the sort-free grouped top-k aggregate — must be row- and
  * rank-identical to the window form it replaces, across partitionings
  * (the merge path), group sizes below/at/above k, and null ordering
  * keys. */
class LexTopKSpec extends SparkSpec {
  import spark.implicits._

  private def windowForm(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    df.select(col("g"), col("id"), col("v"),
        row_number().over(w).cast("int").as("rn"))
      .filter(col("rn") <= k)
  }

  private def aggForm(df: org.apache.spark.sql.DataFrame, k: Int) =
    TopK.groupedTopK(df, Seq("g"), col("id"), col("v"), -col("id"), k,
      valueName = "id", ordName = "v")

  test("randomized equivalence with the window form across partitionings") {
    val rnd = new scala.util.Random(1702)
    // group sizes straddle k=3: empties (absent), 1, 2, 3, and dense
    val rows = (0 until 400).map { i =>
      (rnd.nextInt(40).toLong, i.toLong, (rnd.nextInt(50) * 7 % 97).toDouble)
    }
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("g", "id", "v").repartition(parts)
      val want = windowForm(df, 3)
        .select("g", "id", "v", "rn").as[(Long, Long, Double, Int)]
        .collect().toSet
      val got = aggForm(df, 3)
        .select("g", "id", "v", "rn").as[(Long, Long, Double, Int)]
        .collect().toSet
      assert(got == want, s"parts=$parts\nmissing=${want -- got}\nextra=${got -- want}")
    }
  }

  test("groups smaller than k yield short arrays; ties break on the id key") {
    val df = Seq(
      (1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 5.0), (1L, 13L, 5.0), // all tied
      (2L, 20L, 1.0),                                                 // singleton
      (3L, 30L, 2.0), (3L, 31L, 9.0)                                  // pair
    ).toDF("g", "id", "v").repartition(3)
    val got = aggForm(df, 3).select("g", "id", "rn").as[(Long, Long, Int)]
      .collect().toSet
    assert(got == Set((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (3L, 31L, 1), (3L, 30L, 2)))
  }

  test("null ordering keys never enter the top-k; all-null group vanishes") {
    val df = Seq(
      (1L, Some(10L), Some(3.0)), (1L, Some(11L), None), (1L, Some(12L), Some(7.0)),
      (9L, Some(90L), None)
    ).toDF("g", "id", "v")
    val got = aggForm(df, 2).select("g", "id", "rn").as[(Long, Long, Int)]
      .collect().toSet
    assert(got == Set((1L, 12L, 1), (1L, 10L, 2)))
  }

  test("bottomKByLex mirrors topKByLex under negation") {
    val df = Seq((1L, 10L, 3.0), (1L, 11L, 1.0), (1L, 12L, 2.0))
      .toDF("g", "id", "v")
    val bottom = df.groupBy("g")
      .agg(LexTopK.bottomKByLex(col("id"), col("v"), col("id"), 2).as("t"))
      .select(posexplode(col("t"))).select(col("col.v").as("id"))
      .as[Long].collect().toSeq
    assert(bottom == Seq(11L, 12L)) // ascending by v
    // k outside [1, 5] is a plan-time error, not silent truncation
    intercept[IllegalArgumentException] {
      df.groupBy("g").agg(LexTopK.topKByLex(col("id"), col("v"), col("id"), 6))
        .collect()
    }
  }
}
