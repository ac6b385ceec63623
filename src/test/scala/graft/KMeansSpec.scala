package graft

import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means (e6 / the IVF centroid producer): invariants
  * on a small frame with planted clusters, plus the executor/driver traffic
  * contract (only k×dims values cross per iteration — enforced by the API
  * shape, exercised here for correctness). */
class KMeansSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Similarity

  private val dims = 4
  // two tight planted clusters around orthogonal directions
  private def planted = Seq(
    (0L, Seq(1.0f, 0.0f, 0.1f, 0.0f), "a"),
    (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f), "a"),
    (2L, Seq(1.0f, 0.1f, 0.1f, 0.0f), "a"),
    (3L, Seq(0.0f, 0.1f, 0.0f, 1.0f), "b"),
    (4L, Seq(0.1f, 0.0f, 0.0f, 0.9f), "b"),
    (5L, Seq(0.0f, 0.0f, 0.1f, 1.0f), "b")
  ).toDF("vec_id", "embedding", "label")

  test("assignments separate planted clusters") {
    // seeds are the 2 lowest vec_ids (both in cluster a) — after an
    // iteration the centroid means split the clusters by cosine anyway
    val out = Similarity.kmeansAssign(planted, k = 2, iters = 3, dims = dims)
      .orderBy("vec_id").as[(Long, Int)].collect()
    val cellsA = out.take(3).map(_._2).toSet
    val cellsB = out.drop(3).map(_._2).toSet
    assert(cellsA.size == 1 && cellsB.size == 1 && cellsA != cellsB,
      s"clusters not separated: ${out.toSeq}")
  }

  test("centroids are the fixed-point per-cell means of their members") {
    val cents = Similarity.kmeansCentroids(planted, k = 2, iters = 2, dims = dims).toMap
    val assign = Similarity.kmeansAssign(planted, k = 2, iters = 1, dims = dims)
    // recompute by hand from the iter-1 assignment: quantized mean
    val members = assign.join(planted, "vec_id")
      .select(col("cell"), col("embedding").cast("array<double>").as("emb"))
      .as[(Int, Seq[Double])].collect().groupBy(_._1)
    members.foreach { case (cell, rows) =>
      val n = rows.length
      val mean = (0 until dims).map { d =>
        rows.map(r => math.round(r._2(d) * 1e6)).sum.toDouble / (1e6 * n)
      }
      val got = cents(cell).toSeq
      assert(got == mean, s"cell $cell: $got != $mean")
    }
  }

  test("empty cells keep their previous centroid") {
    // k=3 over 3 identical vectors: everything assigns to one cell; the
    // other two centroids must survive unchanged (no NaN, no drop)
    val df = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f), "x"),
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f), "x"),
      (2L, Seq(1.0f, 0.0f, 0.0f, 0.0f), "x")
    ).toDF("vec_id", "embedding", "label")
    val cents = Similarity.kmeansCentroids(df, k = 3, iters = 2, dims = dims)
    assert(cents.size == 3)
    assert(cents.forall(_._2.forall(v => !v.isNaN)))
  }

  test("literal and broadcast-join iteration paths produce identical centroids") {
    // The k>literalArgmaxMaxK branch swaps the shuffle-free literal argmax
    // for assignCells' broadcast join; both must compute bit-identical
    // cosines and therefore identical fixed-point centroids. Force each
    // path explicitly via the literalMaxK knob on the sf0.001 embeddings.
    val emb = graft.model.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val viaLiteral = Similarity.kmeansCentroids(emb, k = 8, iters = 2, dims = 64,
      literalMaxK = 64)
    val viaJoin = Similarity.kmeansCentroids(emb, k = 8, iters = 2, dims = 64,
      literalMaxK = 0)
    assert(viaLiteral.size == 8 && viaJoin.size == 8)
    viaLiteral.zip(viaJoin).foreach { case ((cl, al), (cj, aj)) =>
      assert(cl == cj && al.toSeq == aj.toSeq, s"cell $cl diverged between paths")
    }
  }

  test("kmeans centroid frame feeds ivfTopK") {
    val emb = graft.model.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = Similarity.kmeansCentroidFrame(spark, emb, k = 8, iters = 2, dims = 64)
    val out = Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), cents, k = 3)
    assert(out.count() > 0)
    assert(out.groupBy("query_id").count().agg(max("count")).as[Long].head() <= 3)
  }
}
