package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Materialize.DatasetPin

/** Sparse lexical retrieval over the documents table — the mining/eval side
  * of a training-data pipeline (find corpus documents matching a query, rank
  * quality-first before human review or contamination checks).
  *
  * Okapi BM25 (Robertson et al., TREC-3): idf(t) · tf·(k1+1) /
  * (tf + k1·(1−b+b·dl/avgdl)), idf(t) = ln(1 + (N−df+0.5)/(df+0.5)).
  *
  * Scale shape: the query's term list is small and static, so per-term tf is
  * computed COLUMNWISE inside the one tokenization scan
  * (tf_t = |toks| − |toks without t|, all codegen'd array ops — no posting
  * explode, no per-(doc,term) shuffle). The resulting narrow
  * (doc_id, dl, tf…) frame is localCheckpoint'ed once (the corpus is
  * tokenized exactly once), then read twice: a 1-row partial-aggregated
  * stats+df pass broadcast back, and a map-only scoring pass whose global
  * top-k is TakeOrdered (no per-doc groupBy, no single-partition window).
  *
  * Determinism: per-(doc,term) contributions are quantized to 1e-6 fixed
  * point BEFORE the per-doc sum, so the score is an integer sum — identical
  * in any partitioning and in the DuckDB oracle (double sums would drift by
  * merge order).
  */
object Retrieval {

  /** Top-k documents by BM25 over `terms`. Output: (doc_id, n_terms, score)
    * with score = quantized-sum / 1e6; ties broken by doc_id ascending.
    * `terms` is treated as a SET (deduplicated on entry): the SQL oracle's
    * IN-list has set semantics, and a duplicated term would otherwise
    * double its contribution and inflate n_terms on the Spark side only
    * (review finding). */
  def bm25TopK(docs: DataFrame, textCol: String, terms0: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = terms0.distinct
    require(terms.nonEmpty && k > 0)
    // One tokenization pass over the corpus, total. The Generate barrier
    // (explode of a 1-element array) pins the token array to an attribute so
    // CollapseProject cannot re-inline the regex into every consumer; the
    // per-term counts then read that attribute with codegen'd array ops.
    // spread: a few-split scan (small SF, single file) would otherwise pin
    // the regex-heavy tokenization onto one core; no-op on real multi-split
    // scans, which already have >= cores partitions.
    val perDoc = graft.model.Tables
      .spread(docs.select(col("doc_id"), col(textCol)), col("doc_id"))
      .select(col("doc_id"),
        explode(array(TextAnalysis.tokens(col(textCol)))).as("__toks"))
      .select(col("doc_id") +: size(col("__toks")).cast("long").as("dl") +:
        terms.indices.map { i =>
          (size(col("__toks")) - size(array_remove(col("__toks"), terms(i))))
            .cast("long").as(s"__tf$i")
        }: _*)
      .pinned // read twice below; never re-tokenize the corpus
    // Corpus stats + per-term document frequencies in ONE partial-aggregated
    // pass over the narrow frame — a 1-row broadcast.
    val statAggs =
      count(lit(1)).cast("double").as("n_docs") +:
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl") +:
      terms.indices.map(i =>
        sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
    // Map-only scoring: fold the per-term fixed-point contributions
    // columnwise (the same per-(doc,term) 1e-6 quantization as before, now
    // summed in a fixed fold order — integer addition, order-independent).
    val contribs = terms.indices.map { i =>
      val tf = col(s"__tf$i")
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"__df$i") + lit(0.5)) / (col(s"__df$i") + lit(0.5)))
      val tfn = tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
      when(tf > 0, round(idf * tfn * 1e6).cast("long")).otherwise(lit(0L))
    }
    val nTerms = terms.indices
      .map(i => when(col(s"__tf$i") > 0, 1).otherwise(0)).reduce(_ + _)
    perDoc.crossJoin(broadcast(stats))
      .select(col("doc_id"), nTerms.cast("int").as("n_terms"),
        contribs.reduce(_ + _).as("__fp"))
      .filter(col("n_terms") > 0)
      .orderBy(col("__fp").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("n_terms"), (col("__fp") / 1e6).as("score"))
  }

  /** Exact phrase-occurrence retrieval: per-document count of a token
    * phrase's (non-overlapping, left-to-right) occurrences, top-k by count —
    * the exact-match complement to [[bm25TopK]] (quote mining, benchmark
    * decontamination audits, template hunting).
    *
    * Map-only + TakeOrdered: the token stream flattens to one
    * double-space-delimited string and occurrences are counted with
    * substring-replace length arithmetic — fully codegen'd, no explode, no
    * join, nothing but (doc_id, n_hits) past the scan. The double-space
    * delimiter gives every token boundary two chars, so back-to-back phrase
    * repeats each keep a boundary char and are all counted; only
    * SELF-overlapping repeats (phrase "a a" in "a a a") collapse to the
    * standard non-overlapping count — identically in the oracle (same
    * left-to-right `replace` semantics). */
  def phraseTopK(docs: DataFrame, textCol: String, phrase: Seq[String],
                 k: Int): DataFrame = {
    require(phrase.nonEmpty && k > 0)
    val needle = " " + phrase.mkString("  ") + " "
    val hay = concat(lit("  "),
      concat_ws("  ", TextAnalysis.tokens(col(textCol))), lit("  "))
    // Generate barrier: without it the Filter condition and the Project
    // each re-inline the whole tokenize+replace expression (2 regex passes
    // per row); behind the barrier the count is computed once.
    graft.model.Tables
      .spread(docs.select(col("doc_id"), col(textCol)), col("doc_id"))
      .select(col("doc_id"), explode(array(
        ((length(hay) - length(replace(hay, lit(needle), lit("")))) /
          lit(needle.length)).cast("int"))).as("n_hits"))
      .filter(col("n_hits") > 0)
      .orderBy(col("n_hits").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Hybrid retrieval: reciprocal-rank fusion (Cormack et al., SIGIR'09) of
    * the lexical ([[bm25TopK]]) and dense (brute-force cosine top-k) rankings
    * for one query. rrf = Σ_leg 1/(rrfK + rank_leg), missing legs contribute
    * 0 — so a document surfaced by only one modality still scores, and a
    * document in both dominates.
    *
    * Scale shape: each leg is an independently-bounded top-k (the BM25 leg is
    * one single-tokenization corpus scan + TakeOrdered; the dense leg is one
    * broadcast-query corpus scan + per-query window limit), so the fusion
    * join touches ≤ 2·kPerLeg rows regardless of corpus size — the fusion
    * itself is free; the legs set the cost. Ranks are integers and
    * 1/(rrfK+rank) is an exact IEEE division, so the fused score is
    * bit-stable across engines (no float-sum drift to quantize away).
    */
  def hybridRrf(docs: DataFrame, textCol: String, emb: DataFrame,
                queryVecId: Long, terms: Seq[String], kPerLeg: Int, k: Int,
                rrfK: Int = 60): DataFrame = {
    require(kPerLeg > 0 && k > 0)
    import org.apache.spark.sql.expressions.Window
    // The single-partition windows below rank ≤ kPerLeg rows (post-limit
    // top-k output), not the corpus — safe at any scale.
    val wLex = Window.orderBy(col("score").desc, col("doc_id").asc)
    val lex = bm25TopK(docs, textCol, terms, kPerLeg)
      .select(col("doc_id"), row_number().over(wLex).cast("int").as("lex_rank"))
    val dense = Similarity
      .bruteForceTopK(emb, emb.filter(col("vec_id") === queryVecId), kPerLeg)
      .select(col("nbr_id").as("doc_id"), col("rank").cast("int").as("dense_rank"))
    def rr(r: org.apache.spark.sql.Column) =
      coalesce(lit(1.0) / (lit(rrfK.toDouble) + r.cast("double")), lit(0.0))
    lex.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("dense_rank"),
        (rr(col("lex_rank")) + rr(col("dense_rank"))).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Retrieve-then-rerank cascade — the standard production retrieval
    * shape: a cheap lexical pass ([[bm25TopK]]) pre-selects `candidates`
    * documents, then ONLY those are reranked by embedding cosine against
    * the query vector. Complements [[hybridRrf]] (which fuses two full
    * rankings): the cascade never scores the corpus densely at all, so the
    * expensive model (here cosine; in production a cross-encoder) touches
    * `candidates` rows, not billions.
    *
    * Scale: the corpus pays exactly one tokenization scan (the BM25 leg);
    * the rerank joins the ≤`candidates`-row lexical output against the
    * embeddings table on doc_id (broadcast — the candidate list is tiny) and
    * sorts ≤`candidates` rows. Output: (doc_id, bm25, cos), top-k by cos. */
  def rerankTopK(docs: DataFrame, textCol: String, emb: DataFrame,
                 queryVecId: Long, terms: Seq[String], candidates: Int,
                 k: Int): DataFrame = {
    require(candidates >= k && k > 0)
    val lex = bm25TopK(docs, textCol, terms, candidates)
      .select(col("doc_id"), col("score").as("bm25"))
    val q = broadcast(emb.filter(col("vec_id") === queryVecId)
      .select(Similarity.asDouble(col("embedding")).as("q_emb"),
        Similarity.l2norm(col("embedding")).as("q_nrm")))
    val corpus = emb.select(col("vec_id").as("doc_id"),
      Similarity.asDouble(col("embedding")).as("d_emb"),
      Similarity.l2norm(col("embedding")).as("d_nrm"))
    broadcast(lex).join(corpus, Seq("doc_id")).crossJoin(q)
      .select(col("doc_id"), col("bm25"),
        (Similarity.dot(col("q_emb"), col("d_emb")) /
          (col("q_nrm") * col("d_nrm"))).as("cos"))
      .orderBy(col("cos").desc, col("doc_id").asc)
      .limit(k)
  }

  /** [[rerankTopK]] as DuckDB SQL (oracle): the lexical CTE nests
    * [[bm25Sql]]; the rerank mirrors the e1 cosine expression. */
  def rerankSql(tokenRe: String, terms: Seq[String], queryVecId: Long,
                candidates: Int, k: Int): String =
    s"""WITH lex AS (
       |  SELECT doc_id, score AS bm25
       |  FROM (${bm25Sql(tokenRe, terms, candidates)}))
       |SELECT l.doc_id, l.bm25,
       |  list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                         CAST(c.embedding AS DOUBLE[])) AS cos
       |FROM lex l
       |JOIN embeddings c ON c.vec_id = l.doc_id
       |CROSS JOIN (SELECT embedding FROM embeddings
       |            WHERE vec_id = $queryVecId) q
       |ORDER BY cos DESC, l.doc_id LIMIT $k""".stripMargin

  /** [[hybridRrf]] as DuckDB SQL (oracle): the dense leg mirrors the e1
    * cosine oracle, the lexical leg nests [[bm25Sql]], and the fusion uses
    * the same coalesce-to-0 double arithmetic. */
  def rrfSql(tokenRe: String, terms: Seq[String], queryVecId: Long,
             kPerLeg: Int, k: Int, rrfK: Int = 60): String =
    s"""WITH lex AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS lex_rank
       |  FROM (${bm25Sql(tokenRe, terms, kPerLeg)})),
       |dense AS (
       |  SELECT nbr_id AS doc_id, CAST(rn AS INT) AS dense_rank FROM (
       |    SELECT c.vec_id AS nbr_id,
       |      row_number() OVER (ORDER BY
       |        list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                               CAST(c.embedding AS DOUBLE[])) DESC,
       |        c.vec_id) AS rn
       |    FROM embeddings c,
       |      (SELECT embedding FROM embeddings WHERE vec_id = $queryVecId) q
       |    WHERE c.vec_id <> $queryVecId)
       |  WHERE rn <= $kPerLeg)
       |SELECT doc_id, lex_rank, dense_rank,
       |  COALESCE(CAST(1.0 AS DOUBLE) / ($rrfK + lex_rank), CAST(0.0 AS DOUBLE)) +
       |  COALESCE(CAST(1.0 AS DOUBLE) / ($rrfK + dense_rank), CAST(0.0 AS DOUBLE))
       |    AS rrf
       |FROM lex FULL OUTER JOIN dense USING (doc_id)
       |ORDER BY rrf DESC, doc_id LIMIT $k""".stripMargin

  /** [[phraseTopK]] as DuckDB SQL (oracle), sharing the delimiter scheme. */
  def phraseSql(tokenRe: String, phrase: Seq[String], k: Int): String = {
    val needle = " " + phrase.mkString("  ") + " "
    s"""WITH hay AS (
       |  SELECT doc_id, '  ' || array_to_string(
       |    regexp_extract_all(lower(text), '$tokenRe'), '  ') || '  ' AS s
       |  FROM documents)
       |SELECT doc_id,
       |  CAST((len(s) - len(replace(s, '$needle', ''))) // ${needle.length} AS INT)
       |    AS n_hits
       |FROM hay
       |WHERE len(s) - len(replace(s, '$needle', '')) > 0
       |ORDER BY n_hits DESC, doc_id LIMIT $k""".stripMargin
  }

  /** Pseudo-relevance-feedback retrieval (Rocchio-style query expansion):
    * run the seed query, mine the top `fbTerms` characteristic terms from
    * the `fbDocs` best seed hits (tf-in-feedback DESC, corpus df ASC —
    * x12's integer-exact distinctive-term ranking), and re-score with the
    * expanded term set. The classic fix for vocabulary mismatch: the seed
    * query's own best answers teach it the words it was missing.
    *
    * One corpus tokenization, total: the checkpointed (doc, dl, toks) array
    * frame feeds the per-doc stats, the posting frame, and through it both
    * scoring passes and the expansion mining. Term sets ride as broadcast
    * frames (they are query-sized, not corpus-sized), so each scoring pass
    * is posting ⨝ broadcast(terms) → integer fixed-point contributions →
    * one doc-keyed sum → TakeOrdered. The expansion ranking window runs
    * over the feedback docs' vocabulary only (bounded by fbDocs × doc
    * length). Determinism: the same 1e-6 quantization as [[bm25TopK]];
    * every ordering key is an integer or fixed-point long. */
  def prfTopK(docs: DataFrame, textCol: String, seeds0: Seq[String], k: Int,
              fbDocs: Int = 3, fbTerms: Int = 3,
              k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // set semantics, same rationale as bm25TopK (the oracle's IN-list and
    // VALUES rows would otherwise disagree with a duplicated seed)
    val seeds = seeds0.distinct
    require(seeds.nonEmpty && k > 0 && fbDocs > 0 && fbTerms >= 0)
    val spark = docs.sparkSession
    import spark.implicits._

    val arr = graft.model.Tables
      .spread(docs.select(col("doc_id"), col(textCol)), col("doc_id"))
      .select(col("doc_id"),
        explode(array(TextAnalysis.tokens(col(textCol)))).as("__toks"))
      .select(col("doc_id"), size(col("__toks")).cast("long").as("dl"),
        col("__toks"))
      .pinned // the single tokenization everything reads
    val stats = arr.agg(count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val posting = arr
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      .pinned // read by both scoring passes + expansion mining

    def score(termsDf: DataFrame, outK: Int): DataFrame = {
      val tf = posting.join(broadcast(termsDf), Seq("term"))
      val dft = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
      val idf = log(lit(1.0) +
        (col("n_docs") - col("df_t") + lit(0.5)) / (col("df_t") + lit(0.5)))
      val tfn = col("tf") * lit(k1 + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
      tf.join(broadcast(dft), Seq("term")).crossJoin(broadcast(stats))
        .select(col("doc_id"), round(idf * tfn * 1e6).cast("long").as("c_fp"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("int").as("n_terms"), sum(col("c_fp")).as("__fp"))
        .orderBy(col("__fp").desc, col("doc_id").asc)
        .limit(outK)
        .select(col("doc_id"), col("n_terms"), (col("__fp") / 1e6).as("score"))
    }

    val seedsDf = seeds.toDF("term")
    val fb = score(seedsDf, fbDocs).select(col("doc_id"))
    val corpusDf = posting.groupBy("term").agg(count(lit(1)).as("cdf"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("tf_fb").desc, col("cdf").asc, col("term").asc)
    // vocabulary of <= fbDocs docs: the unpartitioned window is bounded
    val expansion = posting.join(broadcast(fb), Seq("doc_id"))
      .groupBy("term").agg(sum(col("tf")).as("tf_fb"))
      .filter(!col("term").isInCollection(seeds))
      .join(corpusDf, Seq("term"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= fbTerms)
      .select(col("term"))
    score(seedsDf.union(expansion), k)
  }

  /** [[prfTopK]] as DuckDB SQL (oracle): same posting frame, quantization,
    * feedback selection, and expansion ranking. */
  def prfSql(tokenRe: String, seeds: Seq[String], k: Int,
             fbDocs: Int = 3, fbTerms: Int = 3,
             k1: Double = 1.2, b: Double = 0.75): String = {
    val seedList = seeds.map(t => s"'$t'").mkString("(", ", ", ")")
    val seedRows = seeds.map(t => s"('$t')").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '$tokenRe') AS t FROM documents),
       |stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
       |    CAST(sum(CAST(len(t) AS BIGINT)) AS DOUBLE) / count(*) AS avgdl
       |  FROM toks),
       |posting AS (
       |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, unnest(t) AS term FROM toks),
       |ptf AS (
       |  SELECT doc_id, dl, term, count(*) AS tf FROM posting
       |  GROUP BY doc_id, dl, term),
       |seed_tf AS (SELECT * FROM ptf WHERE term IN $seedList),
       |seed_df AS (SELECT term, count(*) AS df_t FROM seed_tf GROUP BY term),
       |seed_scored AS (
       |  SELECT tf.doc_id, CAST(sum(CAST(round(
       |      ln(1.0 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5)) *
       |      (tf.tf * ${k1 + 1.0} /
       |        (tf.tf + $k1 * (${1.0 - b} + $b * tf.dl / s.avgdl))) * 1e6)
       |      AS BIGINT)) AS BIGINT) AS fp
       |  FROM seed_tf tf JOIN seed_df d USING (term) CROSS JOIN stats s
       |  GROUP BY tf.doc_id),
       |fb AS (SELECT doc_id FROM seed_scored ORDER BY fp DESC, doc_id LIMIT $fbDocs),
       |cdf AS (SELECT term, count(*) AS cdf FROM ptf GROUP BY term),
       |expansion AS (
       |  SELECT term FROM (
       |    SELECT e.term,
       |      row_number() OVER (ORDER BY e.tf_fb DESC, c.cdf ASC, e.term ASC) AS rn
       |    FROM (SELECT term, CAST(sum(tf) AS BIGINT) AS tf_fb FROM ptf
       |          JOIN fb USING (doc_id)
       |          WHERE term NOT IN $seedList GROUP BY term) e
       |    JOIN cdf c USING (term)) WHERE rn <= $fbTerms),
       |terms AS (SELECT * FROM (VALUES $seedRows) v(term)
       |          UNION ALL SELECT term FROM expansion),
       |ftf AS (SELECT ptf.* FROM ptf JOIN terms USING (term)),
       |fdf AS (SELECT term, count(*) AS df_t FROM ftf GROUP BY term),
       |contrib AS (
       |  SELECT tf.doc_id,
       |    CAST(round(
       |      ln(1.0 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5)) *
       |      (tf.tf * ${k1 + 1.0} /
       |        (tf.tf + $k1 * (${1.0 - b} + $b * tf.dl / s.avgdl))) * 1e6)
       |      AS BIGINT) AS c_fp
       |  FROM ftf tf JOIN fdf d USING (term) CROSS JOIN stats s)
       |SELECT doc_id, CAST(count(*) AS INT) AS n_terms,
       |  sum(c_fp) / 1e6 AS score
       |FROM contrib GROUP BY doc_id
       |ORDER BY sum(c_fp) DESC, doc_id LIMIT $k""".stripMargin
  }

  def bm25Sql(tokenRe: String, terms: Seq[String], k: Int,
              k1: Double = 1.2, b: Double = 0.75): String = {
    val termList = terms.map(t => s"'$t'").mkString("(", ", ", ")")
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '$tokenRe') AS t FROM documents),
       |posting AS (
       |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, unnest(t) AS term FROM toks),
       |tf AS (
       |  SELECT doc_id, dl, term, count(*) AS tf FROM posting
       |  WHERE term IN $termList GROUP BY doc_id, dl, term),
       |dft AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term),
       |stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
       |    CAST(sum(CAST(len(t) AS BIGINT)) AS DOUBLE) / count(*) AS avgdl
       |  FROM toks),
       |contrib AS (
       |  SELECT tf.doc_id,
       |    CAST(round(
       |      ln(1.0 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5)) *
       |      (tf.tf * ${k1 + 1.0} /
       |        (tf.tf + $k1 * (${1.0 - b} + $b * tf.dl / s.avgdl))) * 1e6)
       |      AS BIGINT) AS c_fp
       |  FROM tf JOIN dft d USING (term) CROSS JOIN stats s)
       |SELECT doc_id, CAST(count(*) AS INT) AS n_terms,
       |  sum(c_fp) / 1e6 AS score
       |FROM contrib GROUP BY doc_id
       |ORDER BY sum(c_fp) DESC, doc_id LIMIT $k""".stripMargin
  }
}
