package graft

import org.scalatest.funsuite.AnyFunSuite

/** Spark-parsed-literal lint (r9 verdict item #6). Spark SQL types a bare
  * fractional literal (`10000.0`) as DECIMAL while DuckDB types it DOUBLE;
  * in shared-text queries (one string, two engines) that drifts the result
  * type — `BIGINT / 10000.0` is DECIMAL(28,7) in Spark, DOUBLE in DuckDB:
  * same value, different hash, exactly r9's `sql_pricing_summary` red row.
  *
  * Rule: every SQL text fed through Spark's parser must spell non-integer
  * literals in exponent notation (`1e4`, `5e1`) or inside an explicit CAST
  * to a non-decimal type. Oracle-only SQL (DuckDB-parsed) is immune and out
  * of scope. No Spark session needed — pure text checks, plus a source scan
  * that keeps [[SparkEntry.sparkParsedSql]] honest.
  */
class SqlLintSpec extends AnyFunSuite {

  private val bareFractional = "[0-9]\\.[0-9]".r

  test("Spark-parsed SQL texts carry no bare fractional literals") {
    val offenders = SparkEntry.sparkParsedSql.collect {
      case (name, sql) if bareFractional.findFirstIn(sql).isDefined =>
        s"$name: '${bareFractional.findFirstIn(sql).get}…'"
    }
    assert(offenders.isEmpty,
      s"bare fractional literal in Spark-parsed SQL (Spark types it DECIMAL, " +
        s"DuckDB DOUBLE — use 1eN or CAST): ${offenders.mkString("; ")}")
  }

  test("registry names are unique and every registered query is oracled") {
    // Both public maps derive from `registry` via .toMap, which would
    // silently COLLAPSE a duplicate name (losing a query from the gate with
    // no error anywhere); and a `None` oracle would silently demote a query
    // to the weaker rows-only check. Keep both failure modes loud.
    val names = SparkEntry.registry.map(_._1)
    val dupes = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dupes.isEmpty, s"duplicate registry names (toMap collapses them): ${dupes.mkString(", ")}")
    val unoracled = SparkEntry.registry.collect { case (n, _, None) => n }
    assert(unoracled.isEmpty,
      s"registered queries without DuckDB oracle SQL: ${unoracled.mkString(", ")}")
  }

  test("README's advertised query count matches the registry") {
    // r13 verdict #6: the README count drifted (147 vs 148) because nothing
    // pinned it. The doc line is machine-checked here: exactly one
    // "driver contract: N queries" phrase, N == registry size.
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), java.nio.charset.StandardCharsets.UTF_8)
    val counts = "driver contract: (\\d+) queries".r
      .findAllMatchIn(readme).map(_.group(1).toInt).toSeq
    assert(counts.size == 1, s"expected one 'driver contract: N queries' line, got $counts")
    assert(counts.head == SparkEntry.registry.size,
      s"README says ${counts.head} queries, registry has ${SparkEntry.registry.size} — update README.md")
  }

  test("the sparkParsedSql registry cannot be bypassed with inline SQL text") {
    // Inline texts escape the lint above, so force extraction into vals:
    // (a) no triple-quoted string may be passed straight to .sql(;
    // (b) every single-line inline .sql("…")/expr("…") argument must itself
    //     be free of bare fractional literals.
    val src = java.nio.file.Files.readString(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala"))
    assert(!src.contains(".sql(\"\"\""),
      "inline triple-quoted SQL passed to .sql( in SparkEntry — extract to a " +
        "val and register it in sparkParsedSql so SqlLintSpec covers it")
    val inline = "(?:\\.sql|expr)\\(\\s*\"([^\"]*)\"".r
    val offenders = inline.findAllMatchIn(src).map(_.group(1))
      .filter(t => bareFractional.findFirstIn(t).isDefined).toSeq
    assert(offenders.isEmpty,
      s"inline Spark-parsed SQL with bare fractional literal: ${offenders.mkString("; ")}")
  }
}
