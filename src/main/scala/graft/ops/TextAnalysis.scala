package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (north star,
  * BASELINE.json): tokenization, quality scoring, language ID, document
  * fingerprinting. All pure Catalyst expressions (no UDFs) so every operator
  * stays inside whole-stage codegen and scales as a map-only pass — the only
  * shuffle in this file is the language-ID vote aggregation.
  */
object TextAnalysis {

  /** Word tokens: lowercased maximal [a-z0-9] runs. Defined via
    * `regexp_extract_all` so the DuckDB oracle can use the identical regex. */
  def tokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  /** Token / char counting: whitespace tokens, regex word tokens, and a
    * BPE-ish subword estimate (word-or-punctuation pieces + length/4 for
    * long words — a deterministic stand-in for a real tokenizer's piece
    * count). */
  def tokenStats(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col("doc_id"),
      length(t).as("n_chars"),
      size(split(t, " ")).as("ws_tokens"),
      size(tokens(t)).as("word_tokens"),
      (size(tokens(t)) + (length(t) - length(regexp_replace(t, "[^a-z0-9 ]", ""))) +
        (length(t) / lit(16)).cast("int")).as("bpe_estimate"))
  }

  /** Small built-in stopword lexicon per language — the n-gram/stopword-vote
    * language-ID heuristic. Deliberately tiny and deterministic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "for", "on"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "es" -> Seq("el", "la", "los", "de", "que", "y", "en", "un", "es", "por"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "est", "que", "pour", "dans"),
    "vi" -> Seq("va", "la", "cua", "cho", "trong", "mot", "nguoi", "khong", "duoc", "den")
  )

  /** Language ID: explode tokens, count hits against each language's stopword
    * list (broadcast), pick the argmax language (ties -> lexicographically
    * first; no hits -> 'und'). One shuffle on doc_id. */
  def languageId(spark: SparkSession, df: DataFrame, textCol: String): DataFrame = {
    import spark.implicits._
    val lexicon = broadcast(
      stopwords.toSeq.flatMap { case (lang, ws) => ws.map(w => (lang, w)) }
        .toDF("cand_lang", "token"))

    val hits = graft.model.Tables.spread(df.select(col("doc_id"), col(textCol)), col("doc_id"))
      .select(col("doc_id"), explode(tokens(col(textCol))).as("token"))
      .join(lexicon, Seq("token"), "inner")
      .groupBy("doc_id", "cand_lang")
      .agg(count(lit(1)).as("hits"))

    val w = Window.partitionBy("doc_id")
      .orderBy(col("hits").desc, col("cand_lang").asc)
    val best = hits.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("cand_lang").as("pred_lang"), col("hits"))

    df.select("doc_id").join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
        coalesce(col("hits"), lit(0L)).as("hits"))
  }

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean word
    * length, and a banded composite score — the heuristics a pretraining
    * pipeline filters on. Map-only. */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTok = size(toks)
    val allStop = typedLit(stopwords.values.flatten.toSeq.distinct.sorted)
    val stopHits = size(filter(toks, tk => array_contains(allStop, tk)))
    val alnumSpace = length(regexp_replace(lower(t), "[^a-z0-9 ]", ""))

    val scored = df.select(
      col("doc_id"),
      length(t).as("n_chars"),
      nTok.as("n_tokens"),
      when(nTok > 0, length(concat_ws("", toks)).cast("double") / nTok)
        .otherwise(0.0).as("mean_word_len"),
      when(length(t) > 0, (length(t) - alnumSpace).cast("double") / length(t))
        .otherwise(0.0).as("punct_ratio"),
      when(nTok > 0, stopHits.cast("double") / nTok).otherwise(0.0).as("stopword_ratio"))

    scored.withColumn("quality",
      when(col("n_tokens") < 5, 0.0)
        .when(col("punct_ratio") > 0.3, 0.2)
        .when(col("mean_word_len") < 2.0 || col("mean_word_len") > 12.0, 0.4)
        .when(col("stopword_ratio") >= 0.05, 1.0)
        .otherwise(0.7))
  }

  /** Document fingerprint: minimum md5 over all `k`-char shingles of the
    * text (a min-hash-style content fingerprint; robust to local edits in a
    * way whole-document md5 is not). Map-only; the per-row shingle array is
    * never materialized to the shuffle. */
  def fingerprint(df: DataFrame, textCol: String, k: Int = 8): DataFrame = {
    val t = col(textCol)
    val nShingles = greatest(length(t) - (k - 1), lit(1))
    graft.model.Tables.spread(df.select(col("doc_id"), t), col("doc_id")).select(
      col("doc_id"),
      array_min(transform(sequence(lit(1), nShingles),
        i => md5(t.substr(i, lit(k))))).as("fingerprint"))
  }
}
