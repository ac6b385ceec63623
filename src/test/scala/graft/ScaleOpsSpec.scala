package graft

import org.apache.spark.sql.functions._
import graft.functions.WeightedMean
import graft.ops.Skew
import graft.sources.Tabular

/** Scale toolkit: typed weighted-mean aggregator, salting, tabular source. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("WeightedMean aggregator matches the expression form and guards /0") {
    val data = Seq((3.5, 3.0), (2.5, 2.0), (4.0, 1.0)).toDS()
    val wm = new WeightedMean().toColumn
    val got = data.select(wm).collect().head
    val expected = (3.5 * 3 + 2.5 * 2 + 4.0 * 1) / 6.0
    assert(math.abs(got - expected) < 1e-12)
    val empty = Seq.empty[(Double, Double)].toDS()
    assert(empty.select(wm).collect().head == 0.0)
  }

  test("saltedSum equals plain groupBy sum/count") {
    val df = (1 to 10000).map(i => (s"k${i % 3}", i.toDouble)).toDF("k", "v")
    val salted = Skew.saltedSum(df, Seq("k"), "v", buckets = 16)
      .select("k", "sum_v", "n").as[(String, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val plain = df.groupBy("k").agg(sum("v"), count(lit(1)))
      .as[(String, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(salted == plain)
  }

  test("salts are deterministic expressions (no mono-id feeding a shuffle)") {
    // monotonically_increasing_id in a shuffle key is the SPARK-23207
    // hazard: a partial stage retry re-assigns different salts and rows
    // are double-counted or dropped (review finding). Pin structurally:
    // the analyzed plans carry no nondeterministic id expression.
    val df = Seq(("k", 1.0)).toDF("k", "v")
    val agg = Skew.saltedSum(df, Seq("k"), "v").queryExecution.analyzed.toString
    assert(!agg.contains("monotonically_increasing_id"), agg)
    val j = Skew.saltedJoin(df, Seq(("k", "r")).toDF("k", "rv"), "k")
      .queryExecution.analyzed.toString
    assert(!j.contains("monotonically_increasing_id"), j)
  }

  test("salted ops accept MapType columns (hash-unsafe columns skipped)") {
    // Spark's hash() rejects maps at analysis — hashing every column made
    // saltedSum/saltedJoin fail on any frame carrying a MapType, where the
    // pre-fix mono-id salt accepted all schemas (review finding). The salt
    // now hashes only hash-safe columns; results stay exact (the salt only
    // partitions work).
    val df = (1 to 1000).map(i => (s"k${i % 3}", i.toDouble, Map("m" -> i)))
      .toDF("k", "v", "meta")
    val salted = Skew.saltedSum(df, Seq("k"), "v", buckets = 8)
      .select("k", "sum_v", "n").as[(String, Double, Long)].collect().toSet
    val plain = df.groupBy("k").agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().toSet
    assert(salted == plain)
    val right = Seq(("k0", "a"), ("k1", "b"), ("k2", "c")).toDF("k", "rv")
    assert(Skew.saltedJoin(df, right, "k").count() == 1000)
    // global (keyless) aggregation with a map column present stays exact
    val withMap = Seq((Map("a" -> 1), 1.0), (Map("a" -> 1), 2.0))
      .toDF("mk", "v")
    assert(Skew.saltedSum(withMap, Seq.empty, "v").select("sum_v")
      .as[Double].head() == 3.0)
  }

  test("saltedJoin equals plain join") {
    val left = (1 to 5000).map(i => (s"k${i % 4}", i)).toDF("k", "lv")
    val right = Seq(("k0", "a"), ("k1", "b"), ("k2", "c"), ("k3", "d")).toDF("k", "rv")
    val a = Skew.saltedJoin(left, right, "k").select("k", "lv", "rv")
      .as[(String, Int, String)].collect().sorted.toSeq
    val b = left.join(right, "k").select("k", "lv", "rv")
      .as[(String, Int, String)].collect().sorted.toSeq
    assert(a == b)
  }

  test("LSH bucket cap bounds pair output on a pathologically duplicated corpus") {
    import graft.ops.Dedup
    import org.apache.spark.sql.functions.{col, lit, concat}
    // 200 near-identical docs (unique trailing token): every band bucket
    // holds ~200 docs. Uncapped this is ~19.9k pairs; the cap must refuse
    // to go quadratic and drop the overflowing buckets instead.
    val docs = spark.range(200).select(col("id").as("doc_id"),
      concat(lit("the quick brown fox jumps over the lazy dog token"),
        col("id")).as("text"))
    val bands = Dedup.lshBands(Dedup.minhashSignatures(docs, "text", 3))
    val capped = Dedup.candidatePairs(bands, maxBucket = 64).count()
    val open = Dedup.candidatePairs(bands, maxBucket = 1000).count()
    assert(open > 10000L, s"expected the uncapped pair explosion, got $open")
    assert(capped == 0L, s"cap failed to drop overflowing buckets: $capped pairs")
    // a small clean group beside the hot one still pairs under the cap
    val mixed = docs.unionByName(
      Seq((900L, "alpha beta gamma delta epsilon"),
          (901L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text"))
    val pairs = Dedup.candidatePairs(
      Dedup.lshBands(Dedup.minhashSignatures(mixed, "text", 3)), maxBucket = 64)
      .filter(col("a") === 900L && col("b") === 901L).count()
    assert(pairs >= 1L, "clean duplicate pair lost to an unrelated hot bucket")
  }

  test("Tabular.scan reads a headered csv, drops blanks, nulls empties") {
    val dir = java.nio.file.Files.createTempDirectory("tab").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/g.csv"),
      "F_MASV,F_MAMH,F_DIEM2\nB2000001,C1,8.5\n,,\nB2000002,,7.0\n")
    val df = Tabular.scan(spark, s"$dir/g.csv")
    assert(df.count() == 2) // all-blank row dropped
    assert(df.filter(col("F_MAMH").isNull).count() == 1) // '' -> null
  }

  test("jsonl round trip survives hostile escaping byte-exactly") {
    // The s9 gate runs on the generator corpus, which contains no hard
    // cases — THIS is where the escaping contract is certified: embedded
    // quotes, newlines, tabs, backslashes, unicode (incl. astral plane),
    // and JSON-looking text must all survive write→read unchanged.
    val hostile = Seq(
      (1L, "plain text"),
      (2L, "line one\nline two\r\nline three"),
      (3L, "\"quoted\" and \\back\\slashed\\"),
      (4L, "tab\there, ctrl\u0001char, null-ish \u00002"),
      (5L, "tiếng Việt — đúng tiến độ 🎓📚"),
      (6L, """{"looks":"like json","n":[1,2,3]}"""),
      (7L, " leading and trailing spaces ")
    ).toDF("doc_id", "text")
    val back = Tabular.jsonlRoundtrip(spark, hostile)
      .as[(Long, String)].collect().toMap
    val want = Seq(1L -> "plain text",
      2L -> "line one\nline two\r\nline three",
      3L -> "\"quoted\" and \\back\\slashed\\",
      4L -> "tab\there, ctrl\u0001char, null-ish \u00002",
      5L -> "tiếng Việt — đúng tiến độ 🎓📚",
      6L -> """{"looks":"like json","n":[1,2,3]}""",
      7L -> " leading and trailing spaces ").toMap
    assert(back == want, s"diff: ${back.toSet.diff(want.toSet)}")
  }

  test("corrupt-JSON audit: junk lines counted and retained, parsed rows intact") {
    // doc_id % 10 == 3 rows become the non-JSON line "JUNK <id>"; the
    // PERMISSIVE read must keep them as all-null rows with the raw payload
    // in corrupt_payload, and must parse every other row's fields.
    val docs = (0L until 25L).map(i => (i, s"text $i", 7L + i))
      .toDF("doc_id", "text", "n_chars")
    val audit = Tabular.jsonCorruptAudit(spark, docs)
    assert(audit.count() == 25) // every input line yields a row
    val corrupt = audit.filter(col("corrupt_payload").isNotNull)
      .select("corrupt_payload").as[String].collect().toSet
    assert(corrupt == Set("JUNK 3", "JUNK 13", "JUNK 23"))
    assert(audit.filter(col("corrupt_payload").isNotNull &&
      (col("doc_id").isNotNull || col("n_chars").isNotNull)).count() == 0)
    val parsed = audit.filter(col("corrupt_payload").isNull)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toSet
    assert(parsed == (0L until 25L).filter(_ % 10 != 3).map(i => (i, 7L + i)).toSet)
  }

  test("corruptParsed routes the null-struct family to the corrupt path") {
    // from_json returns a NULL STRUCT for the JSON literal `null`, an empty
    // line, or bare whitespace — PERMISSIVE fills _corrupt_record only for
    // junk it can tokenize, so without the null-struct arm these lines
    // were all-null PARSED rows: phantom data in the store table, invisible
    // to the dead-letter split (review finding; kafkaValueParse was fixed
    // for the same family in r14 — this pins the batch leg to the same
    // posture, the "one definition for both corrupt legs" contract).
    val lines = Seq("""{"doc_id":7,"n_chars":42}""", "JUNK 3", "null", "", "  ")
      .toDF("value")
    val out = graft.sources.Tabular.corruptParsed(lines)
      .as[(Option[Long], Option[Long], Option[String])].collect().toSet
    assert(out == Set(
      (Some(7L), Some(42L), None),          // parsed
      (None, None, Some("JUNK 3")),         // tokenizable junk
      (None, None, Some("null")),           // JSON literal null
      (None, None, Some("")),               // empty line
      (None, None, Some("  "))), out)       // whitespace line
  }

  test("Tabular.scan survives dotted and backticked csv headers") {
    // normalize() feeds raw header names to normalizeEmpty; an unquoted
    // col("user.name") parses as nested-field access and crashes the scan
    // (review finding — dropBlankRows was already hardened with qcol, but
    // normalizeEmpty runs first).
    val dir = java.nio.file.Files.createTempDirectory("tabdot").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/h.csv"),
      "user.name,sc`ore\nalice,8.5\n,\nbob,\n")
    val df = Tabular.scan(spark, s"$dir/h.csv")
    assert(df.columns.toSeq == Seq("user.name", "sc`ore"))
    assert(df.count() == 2) // all-blank row dropped
    assert(df.filter(col("`sc``ore`").isNull).count() == 1) // '' -> null
  }
}
