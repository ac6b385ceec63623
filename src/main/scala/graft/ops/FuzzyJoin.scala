package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity-resolution fuzzy matching: all pairs of rows whose string key is
  * within edit distance 1, WITHOUT an all-pairs comparison.
  *
  * Blocking is symmetric-delete (FastSS): two strings are within edit
  * distance 1 only if deleting at most one character from each yields a
  * common variant, so emitting each row once per {identity + every
  * 1-deletion} turns the candidate search into a plain equi-join on the
  * variant string — O(n·len) rows shuffled instead of O(n²) comparisons.
  * Candidates are deduped and then VERIFIED with a real `levenshtein` call,
  * so blocking only affects cost, never the result.
  *
  * Scale shape: one explode (map-side), one equi-join on the variant (the
  * only shuffle), distinct on the pair key, then a verify filter. Variant
  * buckets are ~alphabet-sized; a pathological hot variant (e.g. millions
  * of equal keys) is exact-duplicate territory — route those through
  * exact dedup first, as the pipeline's `t1` stage does.
  */
object FuzzyJoin {

  /** (a_id, b_id, a_key, b_key, dist) for every unordered pair with
    * levenshtein(a_key, b_key) <= 1 and a_id < b_id. */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    // identity + every single-character deletion of the key. spread():
    // a single-file parquet scan is one task, which would serialize the
    // explode + join + levenshtein pipeline onto one core.
    val variants = graft.model.Tables.spread(
        df.select(col(idCol).as("id"), col(strCol).as("key")), col("id"))
      .select(col("id"), col("key"), explode(array_union(
        array(col("key")),
        array_distinct(transform(sequence(lit(1), length(col("key"))),
          i => concat(col("key").substr(lit(1), i - 1),
            col("key").substr(i + 1, length(col("key")))))))).as("v"))
    val a = variants.select(col("id").as("a_id"), col("key").as("a_key"), col("v"))
    val b = variants.select(col("id").as("b_id"), col("key").as("b_key"), col("v"))
    a.join(b, Seq("v"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_key", "b_key").distinct()
      .withColumn("dist", levenshtein(col("a_key"), col("b_key")).cast("int"))
      .filter(col("dist") <= 1)
  }
}
