package graft.ops

import org.apache.spark.sql.DataFrame
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
  * Everything after blocking is equi-joins on key strings (shuffle on
  * bounded-size keys), a distinct, and a verify filter.
  */
object FuzzyJoin {

  /** (a_id, b_id, a_key, b_key, dist) for every unordered pair with
    * levenshtein(a_key, b_key) <= 1 and a_id < b_id, subject to the
    * oversized-bucket routing documented above. */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        maxBucket: Int = 64): DataFrame = {
    // spread(): a single-file parquet scan is one task, which would
    // serialize the explode + join + levenshtein pipeline onto one core.
    val rows = graft.model.Tables.spread(
      df.select(col(idCol).as("id"), col(strCol).as("key")), col("id"))

    // Defense 1: variant index over DISTINCT keys only.
    val variants = rows.select("key").distinct()
      .select(col("key"), explode(array_union(
        array(col("key")),
        array_distinct(transform(sequence(lit(1), length(col("key"))),
          i => concat(col("key").substr(lit(1), i - 1),
            col("key").substr(i + 1, length(col("key")))))))).as("v"))

    // Defense 2: census of distinct keys per variant; left-semi prune the
    // index into under-cap and oversized halves (the LeftSemi is the
    // plan-pinned signature of the cap, as in Dedup.candidatePairs).
    val census = variants.groupBy("v").agg(count(lit(1)).as("__n"))
    val small = variants.join(
      census.filter(col("__n") <= maxBucket).select("v"), Seq("v"), "left_semi")
    val big = variants.join(
      census.filter(col("__n") > maxBucket).select("v"), Seq("v"), "left_semi")

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

    // Verify once per DISTINCT key pair (cheaper than per id pair).
    val keyPairs = smallPairs.union(bigPairs).distinct()
      .filter(levenshtein(col("k1"), col("k2")) <= 1)

    // Re-expand verified key pairs to id pairs (cross product of the two
    // keys' id sets), keys riding along with their ids.
    val crossPairs = keyPairs
      .join(rows.select(col("id").as("id1"), col("key").as("k1")), Seq("k1"))
      .join(rows.select(col("id").as("id2"), col("key").as("k2")), Seq("k2"))
      .select(
        least(col("id1"), col("id2")).as("a_id"),
        greatest(col("id1"), col("id2")).as("b_id"),
        when(col("id1") < col("id2"), col("k1")).otherwise(col("k2")).as("a_key"),
        when(col("id1") < col("id2"), col("k2")).otherwise(col("k1")).as("b_key"))
    // Distance-0 pairs (same key, different ids) never enter the variant
    // index; they come straight from a key self-join on the id rows.
    val samePairs = rows.as("a")
      .join(rows.as("b"),
        col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.key").as("a_key"), col("b.key").as("b_key"))

    crossPairs.union(samePairs)
      .withColumn("dist", levenshtein(col("a_key"), col("b_key")).cast("int"))
  }
}
