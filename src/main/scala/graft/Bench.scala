package graft
import org.apache.spark.sql.SparkSession

/** Driver bench contract: run every registered query on SPARK_GRAFT_SF_DIR,
  * print ONE JSON line {"metric":"total",...} on stdout.
  *
  * Queries run in sorted name order (deterministic attribution) after a
  * warmup pass that pays the one-time session costs (codegen compiler,
  * parquet footer reads, shuffle service spin-up) so per-query numbers
  * measure the query, not JVM warmup.
  *
  * SELF-ADJUDICATION (VERDICT r17 #1): two consecutive rounds needed a
  * manual session-band re-run to decide whether an elevated BENCH_r{N} was
  * contention or code. The artifact now carries its own evidence:
  *   - "load": host 1-min loadavg at run start/end — a loadavg far above
  *     SPARK_GRAFT_CPUS means other tenants held the cores;
  *   - "steal_pct"/"iowait_pct": the /proc/stat steal+iowait share of all
  *     jiffies across the run — direct hypervisor/IO pressure;
  *   - "unstable": how many queries' OWN passes disagreed >2x (min>1.5s) —
  *     code is deterministic, so intra-run spread IS the contention signal;
  *   - "spread": the per-pass timing arrays of the most-discrepant queries.
  * Full per-pass arrays for every query go to a sidecar JSON (stdout keeps
  * a hard ~1900-char budget; path on stderr, default tools/bench_telemetry
  * .json, overridable via SPARK_GRAFT_TELEMETRY).
  */
object Bench {
  private def loadavg1(): Double = scala.util.Try {
    val src = scala.io.Source.fromFile("/proc/loadavg")
    try src.mkString.trim.split("\\s+")(0).toDouble finally src.close()
  }.getOrElse(-1.0)

  /** First /proc/stat line: cpu user nice system idle iowait irq softirq steal … */
  private def cpuJiffies(): Array[Long] = scala.util.Try {
    val src = scala.io.Source.fromFile("/proc/stat")
    try src.getLines().next().split("\\s+").drop(1).map(_.toLong) finally src.close()
  }.getOrElse(Array.empty[Long])

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val load0 = loadavg1()
    val jif0 = cpuJiffies()
    val wall0 = System.nanoTime()
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
    // ---- host telemetry over the full run (read BEFORE spark.stop so the
    // teardown isn't in the window; the passes themselves are).
    val load1 = loadavg1()
    val jif1 = cpuJiffies()
    val wallSec = (System.nanoTime() - wall0) / 1e9
    val (stealPct, iowaitPct) =
      if (jif0.length >= 8 && jif1.length >= 8) {
        val d = jif1.zip(jif0).map { case (a, b) => math.max(a - b, 0L) }
        val tot = math.max(d.sum.toDouble, 1.0)
        (d(7) / tot * 100.0, d(4) / tot * 100.0)
      } else (-1.0, -1.0)
    // Per-query pass arrays, in pass order (pass1, pass2, pass3 where run).
    val passArrays: Seq[(String, List[Double])] = named.flatMap { case (n, _) =>
      val ts = List(pass1.get(n), pass2.get(n), pass3.get(n)).flatten
      if (ts.isEmpty) None else Some(n -> ts)
    }
    // A query is "unstable" when its own passes disagree >2x above the
    // 1.5s noise floor — the same rule that triggers pass3. These are the
    // queries whose min may STILL be a stall (every pass ran inside it).
    val unstable = passArrays.filter { case (_, ts) =>
      ts.size >= 2 && ts.min > 1.5 && ts.max > 2 * ts.min }
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
    // Telemetry fragment: present in EVERY ladder rung (it is the whole
    // point of the artifact); ~90 chars. -1 marks an unreadable /proc.
    val teleJson =
      s""""load":[${fmt(load0, 1)},${fmt(load1, 1)}],"steal_pct":${fmt(stealPct, 2)},""" +
      s""""iowait_pct":${fmt(iowaitPct, 2)},"wall":${fmt(wallSec, 1)},"unstable":${unstable.size}"""
    // Spread fragment: per-pass arrays for the most-discrepant queries
    // (ratio-ranked), so the line itself shows WHICH timings disagreed.
    // Dropped first by the degrade ladder.
    def spreadJson(top: Int): String = {
      val ranked = unstable.sortBy { case (_, ts) => -(ts.max / ts.min) }.take(top)
      if (ranked.isEmpty) "" else ranked.map { case (n, ts) =>
        "\"" + n + "\":[" + ts.map(fmt(_, 1)).mkString(",") + "]"
      }.mkString(""""spread":{""", ",", "},")
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
    def line(dec: Int, sf: String, spreadTop: Int): String = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v, dec) }
        .mkString("{", ",", "}")
      s"""{"metric":"total",$totalJson,"unit":"sec",$teleJson,$failJson,${spreadJson(spreadTop)}"queries":$qs,"sf":"$sf"}"""
    }
    // Slowest-N fallback once the full map can't fit: per-query timings are
    // only informative where time is actually spent, so keep the slowest
    // `top` queries verbatim and fold the fast tail into one "_other_sum"
    // entry (total stays exact).
    def lineTop(dec: Int, sf: String, top: Int, spreadTop: Int = 3): String = {
      val sorted = results.toSeq.sortBy { case (n, v) => (-v, n) }
      val kept = sorted.take(top)
      val rest = sorted.drop(top).map(_._2).sum
      val qs = (kept.map { case (k, v) => "\"" + k + "\":" + fmt(v, dec) } :+
        ("\"_other_sum\":" + fmt(rest, dec))).mkString("{", ",", "}")
      s"""{"metric":"total",$totalJson,"unit":"sec",$teleJson,$failJson,${spreadJson(spreadTop)}"queries":$qs,"sf":"$sf"}"""
    }
    // Sidecar: FULL per-pass arrays + telemetry, no stdout budget. Written
    // best-effort (a read-only cwd must not fail the bench); path announced
    // on stderr so an adjudicator can find it from the driver log.
    val base = new java.io.File(sfDir).getName
    scala.util.Try {
      val path = sys.env.getOrElse("SPARK_GRAFT_TELEMETRY", "tools/bench_telemetry.json")
      val passes = passArrays.map { case (n, ts) =>
        "\"" + n + "\":[" + ts.map(t => f"$t%.3f").mkString(",") + "]"
      }.mkString("{", ",", "}")
      val fj = failedFinal.map("\"" + _ + "\"").mkString("[", ",", "]")
      val json =
        s"""{"sf":"$base","cpus":$cpus,"wall_sec":${f"$wallSec%.1f"},""" +
        s""""load":[${f"$load0%.2f"},${f"$load1%.2f"}],"steal_pct":${f"$stealPct%.3f"},""" +
        s""""iowait_pct":${f"$iowaitPct%.3f"},"unstable":${unstable.size},""" +
        s""""failed":$fj,"passes":$passes}""" + "\n"
      val p = java.nio.file.Paths.get(path)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, json.getBytes("UTF-8"))
      System.err.println(s"[bench] telemetry sidecar: ${p.toAbsolutePath}")
    }.failed.foreach(e => System.err.println(s"[bench] telemetry sidecar skipped: $e"))
    // Degrade ladder: 2-decimal → 1-decimal → 1-decimal with sf basename →
    // slowest-N maps. The driver keeps a 2000-char stdout tail; a line over
    // budget loses its HEAD — the "metric"/"value" fields — so fitting
    // under it is a hard requirement, not cosmetics. Spread arrays ride the
    // top rungs only; host telemetry rides every rung.
    // The slowest-N rungs keep a SMALL spread map (top-3 most-discrepant
    // per-pass arrays): the driver stores only this stdout line, so the
    // burst evidence must ride the artifact itself, not just the sidecar.
    val out = (Seq(line(2, sfDir, 6), line(1, sfDir, 4), line(1, base, 2)) ++
      Seq(70, 50, 35, 20).map(n => lineTop(1, base, n)) ++
      Seq(20, 10).map(n => lineTop(1, base, n, spreadTop = 0)))
      .find(_.length <= 1900)
      .getOrElse(lineTop(1, base, 10, spreadTop = 0))
    spark.stop()
    // Print AFTER spark.stop() so no late executor/driver log line can land
    // between the JSON and process exit.
    println(out)
    System.out.flush()
  }
}
