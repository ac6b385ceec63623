package graft

import org.apache.spark.sql.Row

/** BM25 semantics (ops/Retrieval.scala): term-frequency saturation, length
  * normalization, idf ordering, and determinism of the fixed-point score. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("more query-term hits rank higher at equal length") {
    val df = frame(
      1L -> "cat dog cat dog cat dog cat dog",
      2L -> "cat cat cat cat dog dog dog dog",
      3L -> "cat fish bird fish bird fish bird fish")
    val out = graft.ops.Retrieval.bm25TopK(df, "text", Seq("cat"), 3).collect()
    // docs 1 and 2 both have tf=4, doc 3 has tf=1; same dl=8 everywhere
    assert(out.map(_.getLong(0)).take(2).toSet == Set(1L, 2L))
    assert(out.last.getLong(0) == 3L)
    assert(out.head.getDouble(2) > out.last.getDouble(2))
  }

  test("length normalization: same tf, shorter doc wins") {
    val df = frame(
      1L -> "cat dog",
      2L -> "cat dog fish bird mouse horse goat sheep")
    val Array(first, second) =
      graft.ops.Retrieval.bm25TopK(df, "text", Seq("cat"), 2).collect()
    assert(first.getLong(0) == 1L && second.getLong(0) == 2L)
    assert(first.getDouble(2) > second.getDouble(2))
  }

  test("rarer term contributes more (idf ordering)") {
    // 'rare' appears in 1 of 4 docs, 'common' in all 4 — equal tf and dl
    val df = frame(
      1L -> "rare pad pad",
      2L -> "common pad pad",
      3L -> "common foo bar",
      4L -> "common baz qux")
    val out = graft.ops.Retrieval
      .bm25TopK(df, "text", Seq("rare", "common"), 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) > out(2L))
  }

  test("tf saturation: score is concave in tf (k1 cap)") {
    val df = frame(
      1L -> "cat x x x x x x x",
      2L -> "cat cat x x x x x x",
      3L -> "cat cat cat cat cat cat cat x")
    val s = graft.ops.Retrieval.bm25TopK(df, "text", Seq("cat"), 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val gain12 = s(2L) - s(1L)
    val gain23 = (s(3L) - s(2L)) / 5.0 // per extra occurrence
    assert(gain12 > 0 && gain23 > 0 && gain23 < gain12)
  }

  test("n_terms counts distinct matched terms; k limits output") {
    val df = frame(
      1L -> "cat dog fish",
      2L -> "cat cat cat",
      3L -> "bird bird bird")
    val out = graft.ops.Retrieval.bm25TopK(df, "text", Seq("cat", "dog"), 2).collect()
    assert(out.length == 2)
    val byId = out.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(byId(1L) == 2 && byId(2L) == 1)
  }

  test("terms are a set: a duplicated query term scores once, like the oracle's IN-list") {
    // The SQL oracle's `term IN (...)` has set semantics; the Spark side
    // computed one contribution per LIST INDEX, doubling the score and
    // n_terms for a duplicated term (review finding) — dedupe on entry.
    val df = frame(1L -> "cat dog fish", 2L -> "dog dog dog")
    val dup = graft.ops.Retrieval.bm25TopK(df, "text", Seq("cat", "cat", "dog"), 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val set = graft.ops.Retrieval.bm25TopK(df, "text", Seq("cat", "dog"), 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(dup.toSeq == set.toSeq, s"dup-term run diverged: ${dup.toSeq} vs ${set.toSeq}")
  }

  test("phrase top-k: counts occurrences incl. back-to-back repeats, orders by count") {
    val df = frame(
      1L -> "the cat sat",                       // 1 hit
      2L -> "cat sat cat sat",                   // back-to-back: 2 hits
      3L -> "sat sat cat cat",                   // words present, phrase absent
      4L -> "Cat SAT!",                          // normalization: 1 hit
      5L -> "dog ran")
    val got = graft.ops.Retrieval.phraseTopK(df, "text", Seq("cat", "sat"), 10)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.head == ((2L, 2)))
    assert(got.toSet == Set((2L, 2), (1L, 1), (4L, 1)))
  }

  test("PRF expansion: feedback vocabulary retrieves docs the seed query cannot") {
    val df = frame(
      1L -> "spark shuffle spark shuffle exchange partition",
      2L -> "spark shuffle exchange stage task spark",
      3L -> "spark shuffle partition spill stage plan",
      4L -> "shuffle exchange partition spill stage task", // no seed term!
      5L -> "cat dog fish bird tree river mountain lake",
      6L -> "cat dog fish bird tree river mountain lake")
    val seedOnly = graft.ops.Retrieval.bm25TopK(df, "text", Seq("spark"), 10)
      .select("doc_id").as[Long].collect().toSet
    assert(!seedOnly.contains(4L), "seed query must miss doc 4")
    val prf = graft.ops.Retrieval.prfTopK(df, "text", Seq("spark"), 10,
      fbDocs = 3, fbTerms = 2)
    val prfIds = prf.select("doc_id").as[Long].collect().toSet
    assert(prfIds.contains(4L),
      s"expansion (feedback vocab of docs 1-3) must retrieve doc 4: $prfIds")
    assert(!prfIds.contains(5L) && !prfIds.contains(6L),
      "unrelated docs must stay unretrieved")
    // determinism across physical layouts
    val again = graft.ops.Retrieval.prfTopK(df.repartition(7), "text",
      Seq("spark"), 10, fbDocs = 3, fbTerms = 2)
    assert(prf.collect().toSeq == again.collect().toSeq)
  }

  test("hybrid RRF: both-leg docs fuse both ranks; single-leg docs keep the other null") {
    val df = frame(
      0L -> "dog dog dog",
      1L -> "cat cat pad",
      2L -> "cat pad pad",
      3L -> "dog ran off",
      4L -> "cat pad")
    val emb = Seq(
      0L -> Array(1f, 0f), // query
      1L -> Array(0.9f, 0.1f),
      2L -> Array(0f, 1f),
      3L -> Array(1f, 0f),
      4L -> Array(-1f, 0f)).toDF("vec_id", "embedding")
    val out = graft.ops.Retrieval
      .hybridRrf(df, "text", emb, queryVecId = 0L, Seq("cat"), kPerLeg = 3, k = 10)
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Int]),
         Option(r.get(2)).map(_.asInstanceOf[Int]),
         r.getDouble(3))).toMap
    // lexical leg only matches cat-docs {1,2,4}; dense top-3 of query 0 is
    // {3 (cos 1), 1 (cos≈0.99), 2 (cos 0)} — doc 1 is in BOTH legs.
    val (l1, d1, rrf1) = out(1L)
    assert(l1.nonEmpty && d1.nonEmpty)
    assert(math.abs(rrf1 - (1.0 / (60 + l1.get) + 1.0 / (60 + d1.get))) < 1e-15)
    val (l3, d3, rrf3) = out(3L) // dense-only
    assert(l3.isEmpty && d3.nonEmpty && math.abs(rrf3 - 1.0 / (60 + d3.get)) < 1e-15)
    val (l4, d4, rrf4) = out(4L) // lexical-only
    assert(l4.nonEmpty && d4.isEmpty && math.abs(rrf4 - 1.0 / (60 + l4.get)) < 1e-15)
    // both-leg doc 1 outranks every single-leg doc
    assert(rrf1 > rrf3 && rrf1 > rrf4)
  }

  test("rerank cascade: only lexical candidates are reranked, order is by cosine") {
    import org.apache.spark.sql.functions.col
    val df = frame(
      1L -> "cat cat cat",   // strong lexical hit
      2L -> "cat pad pad",   // weaker lexical hit
      3L -> "dog dog dog",   // no lexical hit -> must NOT appear even if
      4L -> "cat pad")       //   its embedding matches the query perfectly
    val emb = Seq(
      0L -> Array(1f, 0f),   // query
      1L -> Array(0f, 1f),   // orthogonal: worst rerank among candidates
      2L -> Array(1f, 0.5f),
      3L -> Array(1f, 0f),   // identical to query, but not a candidate
      4L -> Array(1f, 0.1f)).toDF("vec_id", "embedding")
    val got = graft.ops.Retrieval
      .rerankTopK(df, "text", emb, queryVecId = 0L, Seq("cat"),
        candidates = 3, k = 3)
      .collect().map(_.getLong(0))
    // candidates are {1,2,4}; cosine order: 4 (0.995) > 2 (0.894) > 1 (0)
    assert(got.toSeq == Seq(4L, 2L, 1L))
  }

  test("score is stable under repartitioning (fixed-point sum)") {
    val df = frame((1L to 40L).map(i =>
      i -> s"cat dog ${"pad " * (i % 7).toInt}fish"): _*)
    val a = graft.ops.Retrieval.bm25TopK(df, "text", Seq("cat", "fish"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val b = graft.ops.Retrieval
      .bm25TopK(df.repartition(13), "text", Seq("cat", "fish"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(a == b)
  }
}
