package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-dependent per partitioning and irreproducible across
  * engines; these operators derive membership from a content/id HASH, so the
  * same row lands in the same split on any cluster, any partitioning, any
  * engine (the DuckDB oracle reproduces the md5 arithmetic exactly) — the
  * property that keeps train/test splits stable across pipeline re-runs, and
  * lets a 100 TB corpus be split map-only with no shuffle at all.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from a key column + salt. Changing the
    * salt re-rolls every assignment (a fresh independent split). */
  def hashBucket(key: Column, buckets: Int, salt: String): Column =
    Dedup.strHash31(concat(key.cast("string"), lit("_" + salt))) % buckets

  /** Train/valid/test split by cumulative percentage. `splits` maps name ->
    * percent, summing to 100; assignment is map-only and shuffle-free. */
  def deterministicSplit(df: DataFrame, keyCol: String, salt: String,
                         splits: Seq[(String, Int)]): DataFrame = {
    require(splits.map(_._2).sum == 100, "split percents must sum to 100")
    val bucket = hashBucket(col(keyCol), 100, salt)
    val split = splits.tail.scanLeft((splits.head._1, splits.head._2)) {
      case ((_, cum), (name, pct)) => (name, cum + pct)
    }.foldRight(lit(splits.last._1): Column) { case ((name, cum), acc) =>
      when(bucket < cum, name).otherwise(acc)
    }
    df.withColumn("bucket", bucket).withColumn("split", split)
  }

  /** Mixture sampling: downsample each source toward a target token mixture —
    * the pass that turns a raw multi-source corpus into a training mix with
    * chosen proportions (w_s of a total token `budget` per source).
    *
    * rate_s = min(1, budget·w_s / (W·tokens_s)) with W = Σw_s; a document is
    * kept iff its salted id-hash (uniform on [0, P)) falls below rate_s·P, so
    * E[kept tokens per source] ≈ budget·w_s/W, capped at what the source has.
    * Membership is pure hash arithmetic: reproducible across engines, and
    * re-runs keep the SAME documents (stable mixes across pipeline versions).
    *
    * One shuffle total: the per-source token totals are a |S|-row aggregate
    * broadcast back onto the corpus; the keep decision itself is map-only.
    * rate_s arithmetic stays in exact integers until a single final double
    * division, so both engines compute bit-identical rates.
    *
    * Sources absent from `weights` are EXCLUDED from the output (weight 0 in
    * the target mix — the mix definition is the contract; emitting them with
    * a null rate would silently smuggle unweighted data into the mix).
    */
  def mixtureSample(df: DataFrame, sourceCol: String, tokenCount: Column,
                    weights: Seq[(String, Int)], budget: Long, salt: String): DataFrame = {
    require(weights.forall(_._2 > 0), "weights must be positive")
    val w = weights.map(_._2).sum
    val wCol = weights.foldRight(lit(null).cast("int"): Column) {
      case ((s, wt), acc) => when(col(sourceCol) === s, lit(wt)).otherwise(acc)
    }
    val base = df.select(col("doc_id"), col(sourceCol).as("source"),
        tokenCount.cast("long").as("n_tokens"), wCol.as("__w"))
      .filter(col("__w").isNotNull)
    val totals = base.groupBy("source").agg(sum(col("n_tokens")).as("__total"))
    base.join(broadcast(totals), Seq("source"))
      .withColumn("rate", least(lit(1.0),
        (lit(budget) * col("__w")).cast("double") / (lit(w) * col("__total")).cast("double")))
      .withColumn("keep",
        Dedup.strHash31(concat(col("doc_id").cast("string"), lit("_" + salt))) <
          col("rate") * lit(Dedup.P.toDouble))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("rate"), col("keep"))
  }

  /** Epoch upsampling: replicate each document per its source's repeat
    * factor num_s/`denom` — the data-constrained-scaling recipe (repeat
    * high-quality sources a fractional number of times) that pairs with
    * [[mixtureSample]]'s downsampling. Every doc emits ⌊num/denom⌋ copies
    * plus one more iff its salted hash falls in the fractional remainder, so
    * E[copies] = num/denom exactly and the decision is reproducible (same
    * docs upsampled on every engine/re-run — no seed drift between pipeline
    * versions). Integer-only arithmetic; ⌊num/denom⌋ and the remainder are
    * folded per-source at PLAN TIME, so no in-engine division at all.
    * Map-only + Generate; output (doc_id, source, epoch 1..copies).
    */
  def epochUpsample(df: DataFrame, sourceCol: String, factors: Seq[(String, Int)],
                    denom: Int, salt: String): DataFrame = {
    require(denom > 0 && factors.forall(_._2 >= 0), "need denom > 0, factors >= 0")
    def perSource(f: Int => Int): Column = factors.foldRight(lit(null).cast("int"): Column) {
      case ((s, n), acc) => when(col(sourceCol) === s, lit(f(n))).otherwise(acc)
    }
    val base = perSource(_ / denom)
    val rem = perSource(_ % denom)
    val hv = Dedup.strHash31(concat(col("doc_id").cast("string"), lit("_" + salt)))
    val copies = base + when(hv * denom < rem * Dedup.P, 1).otherwise(0)
    df.select(col("doc_id"), col(sourceCol).as("source"), copies.as("__c"))
      .filter(col("__c") > 0)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1), col("__c"))).as("epoch"))
  }

  /** Stratified fixed-size sample: the `k` rows with the smallest salted
    * hash per stratum — deterministic, uniform within each stratum, one
    * shuffle on the stratum key. */
  def stratifiedTake(df: DataFrame, strataCol: String, keyCol: String,
                     k: Int, salt: String): DataFrame = {
    val h = hashBucket(col(keyCol), Int.MaxValue, salt)
    val w = Window.partitionBy(strataCol).orderBy(h.asc, col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** DSIR-style importance-resampling weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score each
    * document by how much more likely its hashed word-n-gram features are
    * under a TARGET slice's distribution than under the RAW corpus — the
    * log-likelihood ratio whose softmax drives importance resampling when a
    * pipeline wants web-scale data re-weighted toward a high-quality or
    * in-domain subset. `targetPred` marks the target slice (e.g.
    * `col("lang") === "en"`); features are n-gram instances hashed into
    * `buckets` cells (hashing caps the model at `buckets` parameters no
    * matter the corpus — DSIR's core trick), add-one smoothed on both sides.
    *
    * Determinism (the d15/x22 ln contract): per-bucket log-ratio is 2¹⁶
    * fixed-point — floor(ln((ct+1)·K₁ / ((cr+1)·K₂))·2¹⁶+0.5) BIGINT with
    * K₁ = Tr+buckets, K₂ = Tt+buckets. Each factor converts to double
    * FIRST (one correctly-rounded conversion each — a BIGINT product
    * (ct+1)·K₁ would wrap past 2⁶³ on ~10¹⁰-token corpora, silently in
    * Spark non-ANSI, loudly in DuckDB), then two double multiplies, ONE
    * divide, one ln — the same IEEE-754 op sequence in both engines, so
    * still bit-deterministic cross-engine; per-doc scores accumulate as
    * exact integer sums. Tr/Tt reach the driver as one 2-cell scalar row
    * (bounded-sketch contract) and re-enter as literals.
    *
    * Scale: one tokenization scan into the pinned (doc_id, is_target,
    * bucket) instance frame; ONE aggregate produces both sides' counts
    * (buckets rows — broadcast by construction); the scoring join is the
    * instance frame against that broadcast, then a map-side-combined
    * groupBy(doc_id). No corpus-sized shuffle except the doc_id rollup.
    * Documents shorter than `n` tokens emit one truncated shingle (the
    * established [[Dedup.wordShingles]] max(1,·) fallback), so every doc
    * scores — in both engines. */
  def dsirWeights(df: DataFrame, textCol: String, targetPred: Column,
                  buckets: Int = 4096, n: Int = 2): DataFrame = {
    require(buckets >= 2 && n >= 1)
    val feats0 = graft.model.Tables
      .spread(df.select(col("doc_id"), targetPred.as("is_target"), col(textCol)), col("doc_id"))
      .select(col("doc_id"), col("is_target"),
        explode(Dedup.wordShingles(col(textCol), n)).as("__g"))
      .select(col("doc_id"), col("is_target"),
        (Dedup.strHash31(col("__g")) % buckets).as("b"))
    val feats = graft.Materialize.pin(feats0)
    val counts = feats.groupBy("b").agg(
      count(lit(1)).as("cr"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"))
    // coalesce: sums over an EMPTY feature frame are null and getLong
    // throws — an empty corpus must return an empty weights frame, not a
    // driver NPE (review finding)
    val totals = counts.agg(coalesce(sum(col("cr")), lit(0L)),
      coalesce(sum(col("ct")), lit(0L))).head()
    val k1 = totals.getLong(0) + buckets // Tr + B
    val k2 = totals.getLong(1) + buckets // Tt + B
    val wFx = floor(log(
        ((col("ct") + 1L).cast("double") * lit(k1.toDouble)) /
        ((col("cr") + 1L).cast("double") * lit(k2.toDouble))) * lit(65536.0) + lit(0.5))
      .cast("long")
    feats.join(broadcast(counts.select(col("b"), wFx.as("w_fx"))), "b")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_feats"),
        sum(col("w_fx")).as("logw_fp"))
      .withColumn("avg_logw",
        col("logw_fp").cast("double") / (col("n_feats") * lit(65536.0)))
  }

  /** [[dsirWeights]] as DuckDB SQL (oracle) for `targetPred` = (lang =
    * 'target'), sharing the token regex, md5 bucket hash, and fixed-point
    * log-ratio arithmetic. */
  def dsirWeightsSql(tokenRe: String, target: String,
                     buckets: Int = 4096, n: Int = 2): String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang = '$target' AS is_target,
       |    regexp_extract_all(lower(text), '$tokenRe') AS t FROM documents),
       |grams AS (
       |  SELECT doc_id, is_target,
       |    CAST('0x' || substr(md5(array_to_string(t[u.i : u.i + $n - 1], ' ')), 1, 8)
       |      AS BIGINT) % ${Dedup.P} % $buckets AS b
       |  FROM toks,
       |    unnest(generate_series(1,
       |      greatest(1, CAST(len(t) AS BIGINT) - ${n - 1}))) AS u(i)),
       |counts AS (
       |  SELECT b, CAST(count(*) AS BIGINT) AS cr,
       |    CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS ct
       |  FROM grams GROUP BY 1),
       |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS tr,
       |  CAST(sum(ct) AS BIGINT) AS tt FROM counts),
       |w AS (SELECT b,
       |  CAST(floor(ln((CAST(ct + 1 AS DOUBLE) * CAST(tr + $buckets AS DOUBLE))
       |      / (CAST(cr + 1 AS DOUBLE) * CAST(tt + $buckets AS DOUBLE))) * 65536.0 + 0.5)
       |    AS BIGINT) AS w_fx
       |  FROM counts, tot)
       |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
       |  CAST(sum(w.w_fx) AS BIGINT) AS logw_fp,
       |  CAST(sum(w.w_fx) AS DOUBLE) / (count(*) * 65536.0) AS avg_logw
       |FROM grams g JOIN w USING (b)
       |GROUP BY 1""".stripMargin
}
