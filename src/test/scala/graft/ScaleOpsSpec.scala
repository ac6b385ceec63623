package graft

import org.apache.spark.sql.functions._
import graft.functions.WeightedMean
import graft.ops.Skew
import graft.sources.Tabular

/** Scale toolkit: typed weighted-mean aggregator, salting, tabular source. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("WeightedMean aggregator matches the expression form and guards /0") {
    val data = Seq((3.5, 3.0), (2.5, 2.0), (4.0, 1.0)).toDS()
    val wm = new WeightedMean().toColumn
    val got = data.select(wm).collect().head
    val expected = (3.5 * 3 + 2.5 * 2 + 4.0 * 1) / 6.0
    assert(math.abs(got - expected) < 1e-12)
    val empty = Seq.empty[(Double, Double)].toDS()
    assert(empty.select(wm).collect().head == 0.0)
  }

  test("saltedSum equals plain groupBy sum/count") {
    val df = (1 to 10000).map(i => (s"k${i % 3}", i.toDouble)).toDF("k", "v")
    val salted = Skew.saltedSum(df, Seq("k"), "v", buckets = 16)
      .select("k", "sum_v", "n").as[(String, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val plain = df.groupBy("k").agg(sum("v"), count(lit(1)))
      .as[(String, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(salted == plain)
  }

  test("saltedJoin equals plain join") {
    val left = (1 to 5000).map(i => (s"k${i % 4}", i)).toDF("k", "lv")
    val right = Seq(("k0", "a"), ("k1", "b"), ("k2", "c"), ("k3", "d")).toDF("k", "rv")
    val a = Skew.saltedJoin(left, right, "k").select("k", "lv", "rv")
      .as[(String, Int, String)].collect().sorted.toSeq
    val b = left.join(right, "k").select("k", "lv", "rv")
      .as[(String, Int, String)].collect().sorted.toSeq
    assert(a == b)
  }

  test("LSH bucket cap bounds pair output on a pathologically duplicated corpus") {
    import graft.ops.Dedup
    import org.apache.spark.sql.functions.{col, lit, concat}
    // 200 near-identical docs (unique trailing token): every band bucket
    // holds ~200 docs. Uncapped this is ~19.9k pairs; the cap must refuse
    // to go quadratic and drop the overflowing buckets instead.
    val docs = spark.range(200).select(col("id").as("doc_id"),
      concat(lit("the quick brown fox jumps over the lazy dog token"),
        col("id")).as("text"))
    val bands = Dedup.lshBands(Dedup.minhashSignatures(docs, "text", 3))
    val capped = Dedup.candidatePairs(bands, maxBucket = 64).count()
    val open = Dedup.candidatePairs(bands, maxBucket = 1000).count()
    assert(open > 10000L, s"expected the uncapped pair explosion, got $open")
    assert(capped == 0L, s"cap failed to drop overflowing buckets: $capped pairs")
    // a small clean group beside the hot one still pairs under the cap
    val mixed = docs.unionByName(
      Seq((900L, "alpha beta gamma delta epsilon"),
          (901L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text"))
    val pairs = Dedup.candidatePairs(
      Dedup.lshBands(Dedup.minhashSignatures(mixed, "text", 3)), maxBucket = 64)
      .filter(col("a") === 900L && col("b") === 901L).count()
    assert(pairs >= 1L, "clean duplicate pair lost to an unrelated hot bucket")
  }

  test("Tabular.scan reads a headered csv, drops blanks, nulls empties") {
    val dir = java.nio.file.Files.createTempDirectory("tab").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/g.csv"),
      "F_MASV,F_MAMH,F_DIEM2\nB2000001,C1,8.5\n,,\nB2000002,,7.0\n")
    val df = Tabular.scan(spark, s"$dir/g.csv")
    assert(df.count() == 2) // all-blank row dropped
    assert(df.filter(col("F_MAMH").isNull).count() == 1) // '' -> null
  }
}
