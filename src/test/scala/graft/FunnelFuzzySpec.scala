package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.{Funnels, FuzzyJoin, Similarity, TextAnalysis}

/** Round-5 operators: ordered funnel, cohort retention, symmetric-delete
  * fuzzy matching, TF-IDF top terms, Gopher rule gates, int8-quantized
  * cosine top-k. */
class FunnelFuzzySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: strict ordering — later steps only count after earlier ones") {
    val events = Seq(
      // u1 completes the funnel in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:01:00"), "click"),
      (1L, ts("2024-01-01 10:02:00"), "purchase"),
      // u2 purchases BEFORE viewing: purchase must not count
      (2L, ts("2024-01-01 09:00:00"), "purchase"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:30:00"), "click"),
      // u3 only views
      (3L, ts("2024-01-01 11:00:00"), "view"),
      // u4 clicks with no view: nothing counts
      (4L, ts("2024-01-01 11:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnels.funnel(events, Seq("view", "click", "purchase"))
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("funnel: zero matching events reports 0 users per step, not null") {
    val events = Seq((1L, ts("2024-01-01 10:00:00"), "unrelated"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnels.funnel(events, Seq("view", "click"))
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, "view", 0L), (2, "click", 0L)))
  }

  test("funnel: same-timestamp next step does not advance (strict >)") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:00"), "click") // tie with the view
    ).toDF("user_id", "ts", "event_type")
    val got = Funnels.funnel(events, Seq("view", "click"))
      .orderBy("step").collect().map(r => r.getLong(2))
    assert(got.toSeq == Seq(1L, 0L))
  }

  test("retention: cohort is first event date; offsets count distinct users") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-02 11:00:00")), // same user+day twice -> one
      (2L, ts("2024-01-01 12:00:00")),
      (3L, ts("2024-01-02 09:00:00"))
    ).toDF("user_id", "ts")
    val got = Funnels.retention(events, maxDays = 7)
      .orderBy("cohort_date", "day_offset").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L), ("2024-01-02", 0, 1L)))
  }

  test("fuzzy pairs: finds substitution/insert/delete at distance 1, not 2") {
    val names = Seq(
      (1L, "alpha"), (2L, "alphb"),  // substitution: dist 1
      (3L, "alph"),                  // deletion of 1: dist 1 (and of 2)
      (4L, "allpha"),                // insertion into 1: dist 1
      (5L, "omega")                  // unrelated
    ).toDF("id", "name")
    val pairs = FuzzyJoin.editDistancePairs(names, "id", "name")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) &&
      pairs.contains((2L, 3L)) && pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
    // dist(2,4) = 2 ("alphb" vs "allpha"): blocked or verified away
    assert(!pairs.contains((2L, 4L)))
  }

  test("fuzzy pairs: exact-duplicate keys collapse to one candidate and re-expand") {
    // Three identical keys must yield the three dist-0 pairs AND each must
    // still pair with the dist-1 neighbor — while the variant index sees
    // the duplicated key exactly once (the hot-exact-dup scale defense).
    val names = Seq((1L, "dup"), (2L, "dup"), (3L, "dup"), (4L, "dupe"), (5L, "zzz"))
      .toDF("id", "name")
    val got = FuzzyJoin.editDistancePairs(names, "id", "name")
      .select("a_id", "b_id", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got == Set(
      (1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0),
      (1L, 4L, 1), (2L, 4L, 1), (3L, 4L, 1)))
  }

  test("composed fuzzy: content-level pairs with exact multiplicities") {
    // 3×"dup", 2×"dupe", 1×"zzz": the composed output is KEY pairs — one
    // dist-1 row (dup, dupe) weighing 3×2 and one dist-0 row for each
    // duplicated key weighing C(n,2) — never the 9 id-level pairs.
    val names = Seq((1L, "dup"), (2L, "dup"), (3L, "dup"),
      (4L, "dupe"), (5L, "dupe"), (6L, "zzz")).toDF("id", "name")
    val got = FuzzyJoin.composedEditDistancePairs(names, "id", "name")
      .select("k1", "k2", "dist", "n1", "n2", "pair_weight")
      .as[(String, String, Int, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("dup", "dupe", 1, 3L, 2L, 6L),
      ("dup", "dup", 0, 3L, 3L, 3L),
      ("dupe", "dupe", 0, 2L, 2L, 1L)))
  }

  test("composed fuzzy: pair-weight accounting closes against the plain join") {
    // The composition contract (the 256 = 248 + 8 pattern): over ANY
    // corpus, Σ pair_weight of the composed output equals the plain
    // id-level pair count — seeded-random keys over a tiny alphabet with
    // heavy duplication make both regimes (dist-0 groups, dist-1 cross
    // products) carry real weight.
    val rnd = new scala.util.Random(20250814)
    val rows = (1 to 400).map { i =>
      val len = rnd.nextInt(4) + 1
      (i.toLong, (0 until len).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString)
    }.toDF("id", "name")
    val plain = FuzzyJoin.editDistancePairs(rows, "id", "name").count()
    val composedWeight = FuzzyJoin.composedEditDistancePairs(rows, "id", "name")
      .agg(sum("pair_weight")).as[Long].head()
    assert(plain > 0, "fixture produced no pairs — not exercising the contract")
    assert(composedWeight == plain,
      s"composed Σweight $composedWeight != plain pair count $plain")
  }

  test("fuzzy join: null or duplicated ids never produce degenerate pairs") {
    // The ordered-pair contract (a_id < b_id) on dirty input: a NULL id
    // drops (it cannot be ordered), and a duplicated id under two near-dup
    // keys must not emit an a_id == b_id self-pair (review finding).
    val rows = Seq((Option(1L), "abc"), (Option(1L), "abd"),
      (Option.empty[Long], "abe"), (Option(2L), "abc")).toDF("id", "name")
    val out = FuzzyJoin.editDistancePairs(rows, "id", "name")
      .select("a_id", "b_id", "dist").collect()
    assert(out.forall(r => !r.isNullAt(0) && !r.isNullAt(1) &&
      r.getLong(0) < r.getLong(1)))
    // surviving pairs: (1,2) at dist 0 (abc==abc) and (1,2) at dist 1
    // (abd~abc); the id-1 self-match and every null-id pair are gone
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq ==
      Seq((1L, 2L, 0), (1L, 2L, 1)))
  }

  test("composed fuzzy: duplicated NULL keys emit no group and keep the closure") {
    // editDistancePairs drops null keys entirely (no variants, no equi-join
    // match); the composed form must not resurrect them as a (null,null)
    // dist-0 group or the Σ pair_weight closure breaks (review finding).
    val rows = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (3L, Option("abc")), (4L, Option("abd"))).toDF("id", "name")
    val composed = FuzzyJoin.composedEditDistancePairs(rows, "id", "name")
    assert(composed.filter(col("k1").isNull || col("k2").isNull).count() == 0)
    val composedWeight = composed.agg(sum("pair_weight")).as[Long].head()
    val plain = FuzzyJoin.editDistancePairs(rows, "id", "name").count()
    assert(composedWeight == plain && plain == 1L)
  }

  test("fuzzy pairs: oversized variant bucket is cap-and-routed, not quadratic") {
    // 30 distinct keys "Xaa" plus "aa" itself all share deletion variant
    // "aa" — a 31-member bucket. Capped at 8, the bucket must emit ONLY its
    // identity×deletion pairs ("aa" vs each "Xaa": 30 pairs, all exact
    // dist 1) and shed the 435 within-bucket substitution pairs; at the
    // default cap the same corpus must produce the full exact output.
    val prefixes = (('A' to 'Z') ++ ('0' to '9')).take(30)
    val df = (prefixes.map(c => s"${c}aa") :+ "aa").zipWithIndex
      .map { case (k, i) => (i.toLong, k) }.toDF("id", "name")
    val capped = FuzzyJoin.editDistancePairs(df, "id", "name", maxBucket = 8)
      .select("a_key", "b_key", "dist").as[(String, String, Int)].collect()
    assert(capped.length == 30, s"routed pairs: ${capped.length}")
    assert(capped.forall { case (a, b, d) => d == 1 && (a == "aa" || b == "aa") })
    val full = FuzzyJoin.editDistancePairs(df, "id", "name")
    assert(full.count() == 30 + 30 * 29 / 2) // insert/delete + substitution pairs
  }

  test("fuzzy pairs: randomized brute-force equivalence, uncapped") {
    // Post-restructure algorithm guard (the window-census rewrite must
    // preserve semantics on ARBITRARY corpora, not just the oracled one):
    // 300 seeded-random strings over a 2-letter alphabet, lengths 0-5 —
    // dense collisions, many duplicates, hot variant buckets. With the cap
    // effectively off, the blocked join must equal brute-force Levenshtein
    // over all pairs exactly.
    val rnd = new scala.util.Random(42)
    val strs = (1L to 300L).map(i =>
      (i, (0 until rnd.nextInt(6)).map(_ => "ab" (rnd.nextInt(2))).mkString))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j), d(i)(j - 1)) + 1,
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = (for {
      (ia, sa) <- strs; (ib, sb) <- strs
      if ia < ib && lev(sa, sb) <= 1
    } yield (ia, ib)).toSet
    val got = FuzzyJoin.editDistancePairs(
        strs.toDF("id", "key"), "id", "key", maxBucket = 1000000)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("fuzzy pairs: tiny cap is sound and keeps all different-length and dup-key pairs") {
    // Same corpus, cap=2 (nearly every bucket oversized): output must be a
    // SUBSET of the true pairs (verification means never a false positive),
    // and the documented retention guarantees must hold — every distance-1
    // pair of DIFFERENT lengths (identity×deletion in the shorter key's
    // bucket) and every distance-0 dup-key pair survives any cap; only
    // all-oversized-bucket substitution pairs may shed.
    val rnd = new scala.util.Random(7)
    val strs = (1L to 200L).map(i =>
      (i, (0 until rnd.nextInt(6)).map(_ => "ab" (rnd.nextInt(2))).mkString))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j), d(i)(j - 1)) + 1,
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val byId = strs.toMap
    val truePairs = (for {
      (ia, sa) <- strs; (ib, sb) <- strs
      if ia < ib && lev(sa, sb) <= 1
    } yield (ia, ib)).toSet
    val got = FuzzyJoin.editDistancePairs(
        strs.toDF("id", "key"), "id", "key", maxBucket = 2)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert((got -- truePairs).isEmpty, s"false pairs: ${(got -- truePairs).take(5)}")
    val mustKeep = truePairs.filter { case (a, b) =>
      byId(a).length != byId(b).length || byId(a) == byId(b) }
    assert((mustKeep -- got).isEmpty,
      s"shed guaranteed pairs: ${(mustKeep -- got).take(5)}")
  }

  test("fuzzy pairs: fail mode raises loudly on an oversized bucket, is a no-op otherwise") {
    // Same hot-bucket corpus as the cap-and-route test: 31 distinct keys
    // sharing deletion variant "aa". In fail mode the over-cap census row
    // must raise (no silent shed) with the bucket named in the message;
    // with the cap above the bucket size the fail-mode plan must produce
    // exactly the route-mode (= exact) output.
    val prefixes = (('A' to 'Z') ++ ('0' to '9')).take(30)
    val df = (prefixes.map(c => s"${c}aa") :+ "aa").zipWithIndex
      .map { case (k, i) => (i.toLong, k) }.toDF("id", "name")
    val ex = intercept[Exception] {
      FuzzyJoin.editDistancePairs(df, "id", "name", maxBucket = 8,
        failOnOversized = true).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(m =>
      m.contains("variant bucket") && m.contains("'aa'") && m.contains("31")),
      s"unexpected failure chain: ${messages(ex).mkString(" | ")}")
    val strict = FuzzyJoin.editDistancePairs(df, "id", "name", maxBucket = 64,
        failOnOversized = true)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val exact = FuzzyJoin.editDistancePairs(df, "id", "name", maxBucket = 64)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(strict == exact && strict.size == 30 + 30 * 29 / 2)
  }

  test("fuzzy pairs: oversizedBuckets census agrees with the join's cap decision") {
    val prefixes = (('A' to 'Z') ++ ('0' to '9')).take(30)
    val df = (prefixes.map(c => s"${c}aa") :+ "aa").zipWithIndex
      .map { case (k, i) => (i.toLong, k) }.toDF("id", "name")
    // At cap 8 exactly the "aa" bucket (31 distinct keys: itself + 30
    // single-deletion neighbors) is oversized; at the default cap nothing is
    // — the audit must agree with the join bucket-for-bucket, which is what
    // makes it a usable route-mode preflight.
    val over = FuzzyJoin.oversizedBuckets(df, "id", "name", maxBucket = 8)
      .as[(String, Long)].collect().toMap
    assert(over == Map("aa" -> 31L), s"census: $over")
    assert(FuzzyJoin.oversizedBuckets(df, "id", "name").isEmpty)
  }

  test("oversizedBuckets applies the join's row admission: null-id keys don't count") {
    // The join drops rows with a null id BEFORE building its variant index,
    // so a key that appears ONLY under null ids never enters any bucket —
    // the audit must not count it either, or the census disagrees with the
    // join it claims to preflight (review finding). "ab" and "ac" share
    // variant "a"; with "ac" admitted the bucket oversizes at cap 1, with
    // "ac" null-id-only it must not.
    val dirty = Seq((Some(1L), "ab"), (Option.empty[Long], "ac"))
      .toDF("id", "name")
    assert(FuzzyJoin.oversizedBuckets(dirty, "id", "name", maxBucket = 1).isEmpty,
      "a null-id-only key was counted into the census")
    val clean = Seq((Some(1L), "ab"), (Some(2L), "ac")).toDF("id", "name")
    val over = FuzzyJoin.oversizedBuckets(clean, "id", "name", maxBucket = 1)
      .as[(String, Long)].collect().toMap
    assert(over.get("a").contains(2L), s"census: $over")
  }

  test("tfidf top terms: rarer term outranks equally-frequent common term") {
    val docs = Seq(
      (1L, "zebra zebra common common"),
      (2L, "common words only"),
      (3L, "more common words here")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(docs, "text", 2)
      .filter(col("doc_id") === 1L).orderBy("rank").collect()
    // doc 1: zebra tf=2 df=1; common tf=2 df=3 -> zebra first
    assert(top(0).getAs[String]("term") == "zebra")
    assert(top(0).getAs[Long]("tf") == 2L && top(0).getAs[Long]("df") == 1L)
    assert(top(1).getAs[String]("term") == "common")
  }

  test("gopher rules: each gate trips on its own pathology") {
    val filler = ("the quick brown fox and a dog ran to the big old park " * 6).trim
    val docs = Seq(
      (1L, filler),                                  // healthy: all pass
      (2L, "short text"),                            // word count
      (3L, (("a " * 60) + filler).trim),             // 1-char words drag mean length under 3
      (4L, filler + " !!!" * 200),                   // symbol ratio
      (5L, filler.replaceAll("the|and|a |to ", "xx ")), // all stopwords replaced
      (6L, filler + " ..." * 30)                     // ellipsis
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs, "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[Boolean]("keep"))
    assert(!got(2L).getAs[Boolean]("ok_word_count"))
    assert(!got(3L).getAs[Boolean]("ok_mean_word_len"))
    assert(!got(4L).getAs[Boolean]("ok_symbol_ratio"))
    assert(!got(5L).getAs[Boolean]("ok_stopwords"))
    assert(!got(6L).getAs[Boolean]("ok_ellipsis"))
  }

  test("quantized top-k: exact integer dots, ranking matches float cosine on separated data") {
    val vecs = (0L to 20L).map { i =>
      (i, (0 until 64).map(d => ((i * 31 + d * 7) % 13).toFloat / 13f + 0.1f))
    }.toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") < 2)
    val got = Similarity.quantizedTopK(vecs, q, 3).collect()
    assert(got.length == 6)
    // qdot really is an integer (the cast didn't truncate a fraction):
    // recompute from the quantized definition for one pair
    got.foreach { r =>
      assert(r.getAs[Long]("qdot") != 0L)
      assert(r.getAs[Double]("approx_cos") <= 1.0001)
    }
    // self-similar structure: vec 0's top-1 under float cosine survives
    val exact = Similarity.bruteForceTopK(vecs, q, 1)
      .filter(col("query_id") === 0L).collect().head.getAs[Long]("nbr_id")
    val quant = got.filter(r => r.getAs[Long]("query_id") == 0L)
      .minBy(_.getAs[Int]("rank")).getAs[Long]("nbr_id")
    assert(quant == exact)
  }
}
