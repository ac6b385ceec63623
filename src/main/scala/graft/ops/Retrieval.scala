package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval over the documents table — the mining/eval side
  * of a training-data pipeline (find corpus documents matching a query, rank
  * quality-first before human review or contamination checks).
  *
  * Okapi BM25 (Robertson et al., TREC-3): idf(t) · tf·(k1+1) /
  * (tf + k1·(1−b+b·dl/avgdl)), idf(t) = ln(1 + (N−df+0.5)/(df+0.5)).
  *
  * Scale shape: tokenize → explode → filter to the query's terms FIRST (the
  * per-term postings are a tiny fraction of the corpus after the filter), one
  * groupBy (doc, term) for tf, a |terms|-row df aggregate broadcast back, and
  * a final groupBy per doc. The corpus is scanned once; nothing wider than
  * (doc_id, term) crosses a shuffle; the global top-k is TakeOrdered (no
  * single-partition window).
  *
  * Determinism: per-(doc,term) contributions are quantized to 1e-6 fixed
  * point BEFORE the per-doc sum, so the score is an integer sum — identical
  * in any partitioning and in the DuckDB oracle (double sums would drift by
  * merge order).
  */
object Retrieval {

  /** Top-k documents by BM25 over `terms`. Output: (doc_id, n_terms, score)
    * with score = quantized-sum / 1e6; ties broken by doc_id ascending. */
  def bm25TopK(docs: DataFrame, textCol: String, terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && k > 0)
    val toks = docs.select(col("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
    val posting = toks.filter(col("term").isin(terms: _*))
    // dl is functionally dependent on doc_id; riding in the grouping key
    // keeps the aggregate list numeric-only -> HashAggregate, and the hash
    // partitioning on (doc_id, dl, term) still clusters by (doc_id, term).
    val tf = posting.groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    val stats = docs.select(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(size(TextAnalysis.tokens(col(textCol))).cast("long")).cast("double") /
        count(lit(1))).as("avgdl"))
    val contrib = tf
      .join(broadcast(dft), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("n_docs") - col("df_t") + lit(0.5)) / (col("df_t") + lit(0.5))))
      .withColumn("__tfn",
        col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .select(col("doc_id"),
        round(col("__idf") * col("__tfn") * 1e6).cast("long").as("__c_fp"))
    contrib.groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_terms"), sum(col("__c_fp")).as("__fp"))
      .orderBy(col("__fp").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("n_terms"), (col("__fp") / 1e6).as("score"))
  }

  /** The identical computation as DuckDB SQL (oracle), sharing the token
    * regex and constants. */
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
