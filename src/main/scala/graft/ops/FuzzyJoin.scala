package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity-resolution fuzzy matching: all pairs of rows whose string key is
  * within edit distance 1, WITHOUT an all-pairs comparison.
  *
  * Blocking is symmetric-delete (FastSS): two strings are within edit
  * distance 1 only if deleting at most one character from each yields a
  * common variant, so emitting each DISTINCT key once per {identity + every
  * 1-deletion} turns the candidate search into a plain equi-join on the
  * variant string — O(n·len) rows shuffled instead of O(n²) comparisons.
  * Candidates are deduped and then VERIFIED with a real `levenshtein` call,
  * so blocking only affects cost, never the result.
  *
  * Scale shape, in order of defense:
  *  1. The candidate search runs over DISTINCT keys — a hot exact-duplicate
  *     key (millions of equal strings) contributes ONE row to the variant
  *     index instead of a quadratic bucket; its id pairs are re-expanded
  *     from the verified key pairs afterwards.
  *  2. Variant buckets larger than `maxBucket` DISTINCT keys are
  *     cap-and-routed (the same skew guard as `Dedup.candidatePairs`):
  *     instead of the quadratic within-bucket self-join, an oversized
  *     bucket emits only its identity×deletion pairs — linear in bucket
  *     size, and provably exhaustive for INSERT/DELETE pairs, because a
  *     pair at distance 1 with different lengths shares exactly one
  *     variant (the shorter key itself) and is always identity×deletion
  *     in it. What the cap sheds is SUBSTITUTION pairs all of whose
  *     shared buckets are oversized — a region where >maxBucket distinct
  *     keys sit within distance 2 of each other, i.e. where the true
  *     output itself is quadratic and no exact algorithm stays linear.
  *
  * Shuffle discipline (the first cut of this guard ran ~5× slower than the
  * unguarded join at sf0.1 by paying ~8 exchanges for the two defenses):
  *   - the bucket census is a window count over the variant-partitioned
  *     index, so ONE exchange both computes per-bucket sizes and leaves the
  *     index hash-partitioned and sorted on `v` — the under-cap/oversized
  *     split is then a pair of filters and the within-bucket self-joins
  *     reuse that exchange with no further shuffle;
  *   - the id rows are hash-partitioned ONCE on the key, and all three
  *     id-level joins (the two re-expansion joins and the distance-0
  *     self-join) reuse that single exchange.
  */
object FuzzyJoin {

  /** (a_id, b_id, a_key, b_key, dist) for every unordered pair with
    * levenshtein(a_key, b_key) <= 1 and a_id < b_id, subject to the
    * oversized-bucket routing documented above.
    *
    * Input contract: rows with a NULL id or NULL key are dropped (a null
    * id cannot participate in an ordered a_id < b_id pair, and a null key
    * matches nothing — the same rows any all-pairs SQL oracle drops), and
    * ids are expected UNIQUE per row (entity resolution's premise; with
    * duplicated id values the id ordering cannot distinguish rows, so
    * same-id pairs are excluded rather than emitted as degenerate
    * a_id == b_id rows).
    *
    * `failOnOversized = true` turns the cap from route-and-shed into a
    * loud guardrail: any variant bucket over `maxBucket` raises at
    * execution time (a lazy `raise_error` inside the bucket census — zero
    * cost unless a bucket actually oversizes), so a caller relying on the
    * exact all-pairs-within-distance-1 contract can never get a silently
    * incomplete result. The oracled `join_fuzzy` stage runs in this mode:
    * if a larger corpus ever crosses the cap, the gate goes red instead of
    * quietly diverging from the all-pairs oracle ("no silent caps").
    * Route mode remains the scale default; use [[oversizedBuckets]] to
    * count what it would shed. */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        maxBucket: Int = 64,
                        failOnOversized: Boolean = false): DataFrame = {
    // One key-partitioned exchange feeds the distinct-key index AND all
    // three id-level joins below (also breaks the single-file parquet scan
    // out of its single task, which `spread` did in the first cut).
    val rows = df.select(col(idCol).as("id"), col(strCol).as("key"))
      .filter(col("id").isNotNull && col("key").isNotNull)
      .repartition(col("key"))

    // Defense 1: variant index over DISTINCT keys only (the distinct
    // reuses the key partitioning — no extra exchange).
    val keyPairs = distinctKeyPairs(rows.select("key").distinct(),
      maxBucket, failOnOversized)

    // Re-expand verified key pairs to id pairs (cross product of the two
    // keys' id sets), keys riding along with their ids. Both joins probe
    // the one key-partitioned `rows` exchange; the keyPairs side is the
    // small one (bounded by true near-dup key pairs) — AQE picks broadcast
    // when it fits.
    val crossPairs = keyPairs
      .join(rows.select(col("id").as("id1"), col("key").as("k1")), Seq("k1"))
      .join(rows.select(col("id").as("id2"), col("key").as("k2")), Seq("k2"))
      // id1 =!= id2 upholds the ordered-pair contract even on dirty input
      // (a duplicated id under two near-dup keys would otherwise emit a
      // degenerate a_id == b_id row — review finding).
      .filter(col("id1") =!= col("id2"))
      .select(
        least(col("id1"), col("id2")).as("a_id"),
        greatest(col("id1"), col("id2")).as("b_id"),
        when(col("id1") < col("id2"), col("k1")).otherwise(col("k2")).as("a_key"),
        when(col("id1") < col("id2"), col("k2")).otherwise(col("k1")).as("b_key"),
        col("dist"))
    // Distance-0 pairs (same key, different ids) never enter the variant
    // index; they come straight from a key self-join on the id rows —
    // another reuse of the same exchange.
    val samePairs = rows.as("a")
      .join(rows.as("b"),
        col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.key").as("a_key"), col("b.key").as("b_key"),
        lit(0).cast("int").as("dist"))

    // dist rides from the core's one verification pass (crossPairs) or is
    // 0 by construction (samePairs) — no per-id-pair levenshtein on the
    // output path, which at the x100 probe's 2.7B pairs was 2.7B redundant
    // O(len^2) evaluations (review finding).
    crossPairs.union(samePairs)
  }

  /** The FastSS core over a frame of DISTINCT keys (column `key`): every
    * (k1, k2, dist) with levenshtein <= 1 and k1 < k2 — dist computed ONCE
    * here, in the same pass that verifies the pair, and carried by both
    * callers — subject to the bucket cap/fail semantics documented on
    * [[editDistancePairs]]. Factored so [[composedEditDistancePairs]]
    * feeds its (already distinct) multiplicity frame straight in — no
    * second distinct pass, no key repartition of the full id rows, and no
    * always-empty distance-0 self-join. */
  private[graft] def distinctKeyPairs(keys: DataFrame, maxBucket: Int,
                                      failOnOversized: Boolean): DataFrame = {
    val variants = withVariants(keys)

    // Defense 2: per-variant distinct-key census as a window count — the
    // one variant-partitioned exchange whose partitioning (and sort) the
    // self-joins below inherit. The Window + __n filters are the
    // plan-pinned signature of the cap (PlanChecksSpec).
    val census = variants.withColumn("__n",
      count(lit(1)).over(Window.partitionBy("v")))
    // In fail mode the oversized branch is unreachable by construction:
    // the CaseWhen below raises on the first over-cap row it evaluates
    // (lazily — under-cap rows never touch raise_error, so the happy path
    // costs one extra codegen'd comparison and nothing else).
    val counted =
      if (!failOnOversized) census
      else census.withColumn("__n",
        when(col("__n") > maxBucket,
          raise_error(format_string(
            "FuzzyJoin: variant bucket '%s' holds %s " +
              "distinct keys (maxBucket=%s); route mode would shed " +
              "substitution pairs confined to oversized buckets — raise " +
              "maxBucket or accept route mode",
            col("v"), col("__n"), lit(maxBucket))).cast("long"))
          .otherwise(col("__n")))
    val small = counted.filter(col("__n") <= maxBucket).drop("__n")
    val big = counted.filter(col("__n") > maxBucket).drop("__n")

    // Under-cap buckets: the full within-bucket key self-join.
    val smallPairs = small.as("a")
      .join(small.as("b"),
        col("a.v") === col("b.v") && col("a.key") < col("b.key"))
      .select(col("a.key").as("k1"), col("b.key").as("k2"))
    // Oversized buckets: identity×deletion only. The identity member is the
    // key equal to the variant itself (a deletion always shortens, so
    // key = v identifies it unambiguously); every such pair is distance 1.
    val bigPairs = big.filter(col("key") === col("v"))
      .select(col("v"), col("key").as("ka"))
      .join(big.filter(col("key") =!= col("v"))
        .select(col("v"), col("key").as("kb")), Seq("v"))
      .select(least(col("ka"), col("kb")).as("k1"),
        greatest(col("ka"), col("kb")).as("k2"))

    // Verify once per DISTINCT key pair (cheaper than per id pair); the
    // verifying distance IS the output dist column.
    smallPairs.union(bigPairs).distinct()
      .withColumn("dist", levenshtein(col("k1"), col("k2")).cast("int"))
      .filter(col("dist") <= 1)
  }

  /** {identity + every 1-deletion} variant expansion — ONE definition for
    * the join core and the route-mode audit, so the census can never
    * desynchronize from the join it audits (review finding). */
  private def withVariants(keys: DataFrame): DataFrame =
    keys.select(col("key"), explode(array_union(
      array(col("key")),
      array_distinct(transform(sequence(lit(1), length(col("key"))),
        i => concat(col("key").substr(lit(1), i - 1),
          col("key").substr(i + 1, length(col("key")))))))).as("v"))

  /** Composed exact→fuzzy join — the d19 rep-set pattern
    * ([[Dedup.composedNearDup]]) applied to entity resolution: at high
    * replica density the ×100 scale probe measured [[editDistancePairs]]
    * emitting 2.70B id pairs in 62.5 s — the blocking stayed linear, but
    * the OUTPUT is quadratic by corpus construction (C(100,2) id pairs per
    * duplicated key plus n_a×n_b per dist-1 key pair), and cost tracks the
    * output. The fix is structural: collapse exact-duplicate keys to one
    * representative with multiplicity FIRST (hash groupBy — replica
    * density is absorbed where duplication is exact), run the FastSS
    * machinery over the distinct-key set, and emit CONTENT-level pairs
    * carrying each side's multiplicity, so the id-level pair count is
    * reconstructable without materializing it:
    *
    *   Σ pair_weight over this output  ==  |editDistancePairs output|
    *
    * (dist-1 rows weigh n1×n2; each duplicated key contributes one dist-0
    * row weighing C(n,2)). FunnelFuzzySpec certifies that closure, which
    * holds under [[editDistancePairs]]'s input contract (unique non-null
    * ids). Multiplicities are countDistinct(id) with null ids and null
    * keys dropped — the same ROW admission as the plain join — but the
    * closure itself is only exact for unique ids: an id duplicated under
    * two near-dup KEYS is excluded from the plain join's cross pairs
    * (id1 =!= id2) while composed still weighs it (knowing which
    * candidate pairs share ids would require materializing per-key id
    * sets, the machinery composing exists to avoid). Unique ids are
    * entity resolution's premise; dedupe ids upstream if violated.
    *
    * Scale shape: one groupBy(key) + the FastSS join over distinct keys
    * (which [[editDistancePairs]] already runs internally — composing adds
    * NO new shuffle class) minus the two id re-expansion joins and their
    * quadratic output. At replica density k the output is ~k² smaller. */
  def composedEditDistancePairs(df: DataFrame, idCol: String, strCol: String,
                                maxBucket: Int = 64,
                                failOnOversized: Boolean = false): DataFrame = {
    // Pinned: the multiplicity frame feeds the FastSS core AND both
    // weight joins — one groupBy, not three (the d19 file convention).
    // The groupBy IS the distinct pass, so the core gets its distinct-key
    // input for free (no second distinct, no id-row repartition, no empty
    // distance-0 self-join — the wrapper's id-level machinery is exactly
    // what composing exists to avoid). NULL keys and NULL ids are dropped
    // BEFORE the groupBy — the plain join admits neither (a null key
    // explodes to no variants; a null id cannot form an ordered pair) —
    // so no phantom dist-0 group can break the Σ pair_weight closure
    // (review finding).
    val groups = graft.Materialize.pin(
      df.filter(col(strCol).isNotNull && col(idCol).isNotNull)
        .groupBy(col(strCol).as("key"))
        .agg(countDistinct(col(idCol)).as("n")))
    val cross = distinctKeyPairs(groups.select("key"), maxBucket, failOnOversized)
      .join(groups.select(col("key").as("k1"), col("n").as("n1")), Seq("k1"))
      .join(groups.select(col("key").as("k2"), col("n").as("n2")), Seq("k2"))
      .select(col("k1"), col("k2"), col("dist"), col("n1"), col("n2"),
        (col("n1") * col("n2")).as("pair_weight"))
    // Each duplicated key is one dist-0 row weighing C(n,2) — shiftright
    // keeps the arithmetic integer-exact (n·(n−1) is always even).
    val within = groups.filter(col("n") > 1)
      .select(col("key").as("k1"), col("key").as("k2"),
        lit(0).as("dist"), col("n").as("n1"), col("n").as("n2"),
        shiftright(col("n") * (col("n") - 1), 1).as("pair_weight"))
    cross.union(within)
  }

  /** Audit for route mode: the variant buckets `editDistancePairs` would
    * treat as oversized at this cap — `(v, n)` with n = distinct keys in
    * the bucket. Empty ⇒ route mode is exact (nothing shed). Same ROW
    * admission (null ids and null keys dropped — a key that appears only
    * under null ids never enters the join's variant index, so it must not
    * count here either; review finding), same distinct + variant expansion
    * as the join, so the census agrees with it bucket-for-bucket; cost is
    * one scan + one shuffle over distinct keys, cheap to run ahead of a
    * large route-mode job ("no silent caps"). */
  def oversizedBuckets(df: DataFrame, idCol: String, strCol: String,
                       maxBucket: Int = 64): DataFrame =
    withVariants(df.filter(col(idCol).isNotNull && col(strCol).isNotNull)
        .select(col(strCol).as("key")).distinct())
      .groupBy("v").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucket)
}
