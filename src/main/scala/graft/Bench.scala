package graft
import org.apache.spark.sql.SparkSession

/** Driver bench contract: run every registered query on SPARK_GRAFT_SF_DIR,
  * print ONE JSON line {"metric":"total",...} on stdout.
  *
  * Queries run in sorted name order (deterministic attribution) after a
  * warmup pass that pays the one-time session costs (codegen compiler,
  * parquet footer reads, shuffle service spin-up) so per-query numbers
  * measure the query, not JVM warmup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: a tiny shuffle + parquet reads via the Tables loader (which
    // also pre-sets the session confs — nanos timestamps, ICU opt-out — so
    // the first timed query doesn't pay first-touch costs).
    try {
      spark.range(1000).selectExpr("id % 7 AS k").groupBy("k").count().count()
      graft.model.Tables(spark, sfDir, "events").limit(10).count()
      graft.model.Tables(spark, sfDir, "documents").limit(10).count()
    } catch { case _: Throwable => () }
    // This host shows heavy cross-tenant CPU contention: identical queries
    // vary 5-30x run-to-run in BOTH directions (measured r5: e6 29.8s vs
    // 4.8s, join_semi 15.4s vs 0.95s). A single timing therefore measures
    // the host, not the query. Adaptive stabilization: re-run anything
    // slower than 1.0s and report the min; one extra run if both timings
    // stayed above 1.5s AND disagree by >2x (a stall hit one of them).
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
    // Loud failures (VERDICT r11 #3): a throwing query must NOT have its
    // exception's wall time reported as if it were the query's cost (r11
    // silently "improved" ssjoin 9s->0.6s by timing an analysis error).
    // Failed queries are excluded from the timing map and surfaced in a
    // "failed" list on the JSON line; failures here are deterministic
    // (analysis/plan errors), so no retry.
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name FAILED: " +
          Option(e.getMessage).getOrElse(e.getClass.getName))
        None
      }
    }
    val pass1 = named.flatMap { case (name, fn) => once(name, fn).map(name -> _) }.toMap
    // Stalls are often SUSTAINED (minutes), so an immediate retry re-measures
    // the same stall. Re-run the affected queries as a second pass AFTER the
    // whole suite (temporal separation), then once more for any query whose
    // two timings still disagree by >2x.
    val slow = named.filter { case (n, _) => pass1.get(n).exists(_ > 1.0) }
    val pass2 = slow.flatMap { case (name, fn) => once(name, fn).map(name -> _) }.toMap
    val pass3 = slow.filter { case (n, _) =>
      (pass1.get(n), pass2.get(n)) match {
        case (Some(a), Some(b)) => math.min(a, b) > 1.5 && math.max(a, b) > 2 * math.min(a, b)
        case _ => false
      }
    }.flatMap { case (name, fn) => once(name, fn).map(name -> _) }.toMap
    val results = named.flatMap { case (name, _) =>
      val timings = List(pass1.get(name), pass2.get(name), pass3.get(name)).flatten
      if (timings.isEmpty) None else Some(name -> timings.min)
    }
    // Compact number format (≤2 decimals, no trailing zeros): the driver
    // stores only a bounded tail of stdout, so the WHOLE line must stay
    // well under 2000 chars even as the query count grows. If 2-decimal
    // precision would overflow that budget, degrade to 1 decimal.
    def fmt(v: Double, dec: Int): String = {
      val s = if (dec == 1) f"$v%.1f" else f"$v%.2f"
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse else s
    }
    // Failed-query marker, present in every line variant. A query counts as
    // failed only if it has NO successful timing — a pass1 success whose
    // pass2 retry hiccuped keeps its timing and is NOT failed (the marker
    // means "no timing exists", so failed_count + queries-with-timings
    // partitions the registry). Cap the name list so a mass failure can't
    // blow the 1900-char stdout budget.
    val timed = results.map(_._1).toSet
    val failedFinal = failed.toSeq.filterNot(timed)
    val failJson = {
      val names = failedFinal.take(8).map("\"" + _ + "\"")
      val more = if (failedFinal.size > 8) Seq("\"+" + (failedFinal.size - 8) + " more\"") else Nil
      s""""failed_count":${failedFinal.size},"failed":${(names ++ more).mkString("[", ",", "]")}"""
    }
    // Headline guard (ADVICE r12): when any query failed, the sum over
    // SURVIVING queries is not comparable round-over-round — a consumer
    // diffing "value" totals would read a failure as a speedup. Null the
    // headline and park the shrunken sum under "partial_total" so the
    // comparison breaks loudly instead of lying quietly.
    def totalJson: String = {
      val total = fmt(results.map(_._2).sum, 2)
      if (failedFinal.isEmpty) s""""value":$total"""
      else s""""value":null,"partial_total":$total"""
    }
    def line(dec: Int, sf: String): String = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v, dec) }
        .mkString("{", ",", "}")
      s"""{"metric":"total",$totalJson,"unit":"sec",$failJson,"queries":$qs,"sf":"$sf"}"""
    }
    // Slowest-N fallback once the full map can't fit: per-query timings are
    // only informative where time is actually spent, so keep the slowest
    // `top` queries verbatim and fold the fast tail into one "_other_sum"
    // entry (total stays exact).
    def lineTop(dec: Int, sf: String, top: Int): String = {
      val sorted = results.toSeq.sortBy { case (n, v) => (-v, n) }
      val kept = sorted.take(top)
      val rest = sorted.drop(top).map(_._2).sum
      val qs = (kept.map { case (k, v) => "\"" + k + "\":" + fmt(v, dec) } :+
        ("\"_other_sum\":" + fmt(rest, dec))).mkString("{", ",", "}")
      s"""{"metric":"total",$totalJson,"unit":"sec",$failJson,"queries":$qs,"sf":"$sf"}"""
    }
    // Degrade ladder: 2-decimal → 1-decimal → 1-decimal with sf basename →
    // slowest-N maps. The driver keeps a 2000-char stdout tail; a line over
    // budget loses its HEAD — the "metric"/"value" fields — so fitting
    // under it is a hard requirement, not cosmetics.
    val base = new java.io.File(sfDir).getName
    val out = (Seq(line(2, sfDir), line(1, sfDir), line(1, base)) ++
      Seq(70, 50, 35, 20).map(n => lineTop(1, base, n)))
      .find(_.length <= 1900)
      .getOrElse(lineTop(1, base, 10))
    spark.stop()
    // Print AFTER spark.stop() so no late executor/driver log line can land
    // between the JSON and process exit.
    println(out)
    System.out.flush()
  }
}
