package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A5: the Kibana dashboard layer (reference `README.md:25-27,43-44`,
  * `detail.png`) — score distributions, trends, per-class stats. No code in
  * the reference (config lives inside Kibana); semantics reconstructed as the
  * standard OLAP aggregates those dashboards are built from.
  *
  * All single-shuffle groupBy aggregates with map-side partial aggregation;
  * the distinct-count variants offer both exact and sketch
  * (`approx_count_distinct`, constant memory) forms — at 100 TB the sketch is
  * the default and the exact form is the audit path.
  */
object Dashboards {

  /** Score histogram: distribution of a numeric column in fixed-width bins. */
  def histogram(df: DataFrame, valueCol: String, binWidth: Double): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy((floor(col(valueCol) / binWidth) * binWidth).as("bin_lo"))
      .agg(count(lit(1)).as("n"))

  /** Date histogram: daily counts + basic stats of a value column.
    *
    * `scale` is the decimal scale of the value column (2 = cents): sum and
    * mean are computed as scaled-integer long sums de-scaled afterwards, so
    * the panel numbers are independent of partitioning / summation order —
    * a raw double sum drifts in its last bits with every repartition, which
    * both breaks cross-engine certification and makes dashboards flicker
    * between refreshes of identical data. */
  def dateHistogram(df: DataFrame, tsCol: String, valueCol: String,
                    scale: Int = 2): DataFrame = {
    val f = math.pow(10, scale)
    val units = sum(round(col(valueCol) * f).cast("long"))
    df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(
        count(lit(1)).as("n"),
        (units / f).as("total"),
        (units / f / count(lit(1))).as("mean"),
        min(col(valueCol)).as("lo"),
        max(col(valueCol)).as("hi"))
  }

  /** Per-group stats: mean/count/distinct-entity, exact. Mean is a
    * scaled-integer sum de-scaled after (see [[dateHistogram]]) so it is
    * summation-order-independent. */
  def groupStats(df: DataFrame, groupCols: Seq[String], valueCol: String,
                 entityCol: String, scale: Int = 2): DataFrame = {
    val f = math.pow(10, scale)
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        (sum(round(col(valueCol) * f).cast("long")) / f / count(lit(1)))
          .as("mean"),
        countDistinct(col(entityCol)).as("n_entities"))
  }

  /** Winsorization: clip a value column to its per-group [lo, hi] exact
    * percentiles — the robust-statistics guard dashboards apply before
    * means/trends so a single fat-finger value can't swamp a panel.
    *
    * Scale shape: the bounds frame is |groups| rows (one exact-percentile
    * aggregate) and comes back as a broadcast; the clip itself is map-only.
    * At 100 TB swap `percentile` for `approx_percentile` (mergeable GK
    * sketch, same plan shape) — the exact form is the audit path, mirroring
    * the a5 percentile pair. */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
                lo: Double, hi: Double): DataFrame = {
    require(0 <= lo && lo < hi && hi <= 1, "need 0 <= lo < hi <= 1")
    val bounds = df.groupBy(groupCols.map(col): _*).agg(
      percentile(col(valueCol), lit(lo)).as("__lo"),
      percentile(col(valueCol), lit(hi)).as("__hi"))
    // Null-safe re-join (the percentilesApproxGated pattern): a plain
    // using-column join drops every row whose group key is null — a
    // CLIPPING transform that silently loses data (review finding). The
    // bounds side's keys are renamed so <=> can't collapse ambiguously.
    val renamed = groupCols.foldLeft(bounds)(
      (b, c) => b.withColumnRenamed(c, s"__g_$c"))
    val cond = groupCols.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _)
    df.join(broadcast(renamed), cond)
      .withColumn(valueCol + "_w",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .drop(groupCols.map(c => s"__g_$c"): _*)
      .drop("__lo", "__hi")
  }

  /** Trailing-window z-score anomaly flags over a daily count series — the
    * alerting panel on every ops dashboard (traffic drop / spike detection).
    *
    * Each day's count is scored against the mean/stddev of the `window`-day
    * trailing window ENDING at that day (itself included, so the first days
    * warm up instead of emitting nulls). Determinism: the window sums
    * (n, Σc, Σc²) are exact BIGINT sums; mean, sample variance
    * ((Σc² − (Σc)²/n)/(n−1)), and z are then single fixed double expressions
    * over those integers — bit-identical in any engine, no float-sum drift.
    *
    * Scale shape: the daily rollup is the one real shuffle (map-side partial
    * agg); the windowing then runs over |days| rows — thousands of rows for
    * years of data — so the unpartitioned window is deliberate, not a
    * bottleneck (partition by a series key when scoring many metrics). */
  def anomalyDays(df: DataFrame, tsCol: String, window: Int = 7,
                  zThreshold: Double = 2.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(window >= 2)
    // asc_nulls_last: Spark's default window ordering is NULLS FIRST while
    // DuckDB's ORDER BY defaults NULLS LAST — one null day (a null ts in
    // the source) would otherwise sit inside the FIRST trailing windows on
    // the Spark side and the LAST on the oracle side, shifting every
    // nearby z-score between engines (review finding).
    val w = Window.orderBy(col("day").asc_nulls_last).rowsBetween(-(window - 1), 0)
    val daily = df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val c = col("n_events")
    val scored = daily
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__s", sum(c).over(w))
      .withColumn("__ss", sum(c * c).over(w))
    val mean = col("__s").cast("double") / col("__n")
    val variance = (col("__ss").cast("double") -
      col("__s").cast("double") * col("__s") / col("__n")) / (col("__n") - 1)
    val sd = sqrt(variance)
    val z = when(col("__n") >= 2 && sd > 0, (c.cast("double") - mean) / sd)
    scored.select(col("day"), c, mean.as("mean_w"), z.as("z"),
      coalesce(abs(z) > zThreshold, lit(false)).as("is_anomaly"))
  }

  /** [[anomalyDays]] as DuckDB SQL (oracle), sharing the exact-integer
    * window sums and the fixed double expression tree. */
  def anomalyDaysSql(table: String, tsCol: String, window: Int = 7,
                     zThreshold: Double = 2.0): String =
    s"""WITH daily AS (
       |  SELECT CAST($tsCol AS DATE) AS day, count(*) AS n_events
       |  FROM $table GROUP BY 1),
       |win AS (
       |  SELECT day, n_events,
       |    count(*) OVER w AS n,
       |    sum(n_events) OVER w AS s,
       |    sum(n_events * n_events) OVER w AS ss
       |  FROM daily
       |  WINDOW w AS (ORDER BY day ROWS BETWEEN ${window - 1} PRECEDING
       |               AND CURRENT ROW)),
       |scored AS (
       |  SELECT day, n_events,
       |    CAST(s AS DOUBLE) / n AS mean_w,
       |    CASE WHEN n >= 2 AND
       |        sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)) > 0
       |      THEN (CAST(n_events AS DOUBLE) -  CAST(s AS DOUBLE) / n) /
       |        sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1))
       |      END AS z
       |  FROM win)
       |SELECT day, n_events, mean_w, z,
       |  COALESCE(abs(z) > $zThreshold, false) AS is_anomaly
       |FROM scored""".stripMargin

  /** Sketch form: HLL++ distinct entities — constant memory per group,
    * mergeable across partitions; the 100 TB default. */
  def groupStatsApprox(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       entityCol: String, rsd: Double = 0.01,
                       scale: Int = 2): DataFrame = {
    val f = math.pow(10, scale)
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        (sum(round(col(valueCol) * f).cast("long")) / f / count(lit(1)))
          .as("mean"),
        approx_count_distinct(col(entityCol), rsd).as("n_entities_approx"))
  }

  /** ORACLE-GATED sketch form: the HLL++ estimate runs inside the query and
    * is emitted as a bound-check BOOLEAN next to the exact count — the
    * cross-engine oracle computes the exact side plus `true`, so a sketch
    * drifting past its published error bound flips the hash and fails the
    * gate. The bound is 5·rsd relative (HLL++'s rsd is one standard
    * deviation; 5σ never trips on a healthy sketch) with an absolute floor
    * of 1 for tiny groups. HLL register merges are max()-based, so the
    * estimate itself is partition-order independent — only its accuracy,
    * never the output hash, depends on the sketch. */
  def groupStatsApproxGated(df: DataFrame, groupCols: Seq[String],
                            valueCol: String, entityCol: String,
                            rsd: Double = 0.01, scale: Int = 2): DataFrame = {
    val f = math.pow(10, scale)
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        (sum(round(col(valueCol) * f).cast("long")) / f / count(lit(1)))
          .as("mean"),
        countDistinct(col(entityCol)).as("n_entities"),
        approx_count_distinct(col(entityCol), rsd).as("__approx"))
      .withColumn("approx_ok",
        abs(col("__approx") - col("n_entities")).cast("double") <=
          greatest(lit(1.0), col("n_entities") * (5 * rsd)))
      .drop("__approx")
  }

  /** ORACLE-GATED quantile sketch: Greenwald-Khanna `approx_percentile`
    * guarantees rank error ≤ n/accuracy per group. Each approximate
    * quantile's TRUE rank interval [#(v < q̂), #(v ≤ q̂)] is recomputed
    * exactly in the same pass (one broadcast join of the |groups|-row
    * sketch frame back onto the data) and checked against the target rank
    * with that bound (+1 absolute slack for interpolation edges). Emits the
    * EXACT percentiles plus the check boolean, so the output hash is
    * deterministic even though GK merge order varies with partitioning —
    * the sketch's accuracy is under the gate, its internals are not. */
  def percentilesApproxGated(df: DataFrame, groupCol: String, valueCol: String,
                             qs: Seq[Double], accuracy: Int = 1000): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q < 1))
    val appxAggs = qs.zipWithIndex.map { case (q, i) =>
      approx_percentile(col(valueCol), lit(q), lit(accuracy)).as(s"__a$i")
    }
    val appx = df.groupBy(groupCol).agg(appxAggs.head, appxAggs.tail: _*)
    // Null-safe re-join: a plain using-column join would silently drop a
    // null-keyed group (null never equals null), while the exact path and
    // any GROUP BY oracle both keep it. The appx side's key is renamed so
    // the <=> condition can't collapse into an ambiguous self-join.
    val joined = df.join(
        broadcast(appx.withColumnRenamed(groupCol, "__g")),
        col(groupCol) <=> col("__g"))
      .drop("__g")
    val aggs =
      qs.map { q =>
        percentile(col(valueCol), lit(q)).as(s"p${(q * 100).round}")
      } ++
      qs.zipWithIndex.map { case (_, i) =>
        sum(when(col(valueCol) < col(s"__a$i"), 1L).otherwise(0L)).as(s"__lt$i")
      } ++
      qs.zipWithIndex.map { case (_, i) =>
        sum(when(col(valueCol) <= col(s"__a$i"), 1L).otherwise(0L)).as(s"__le$i")
      // count(valueCol), not count(*): percentile/approx_percentile and the
      // __lt/__le rank counts all ignore null VALUES, so the rank target
      // must be calibrated on the non-null count — a half-null group would
      // otherwise flip approx_ok on a perfectly healthy sketch (review
      // finding)
      } :+ count(col(valueCol)).as("__n")
    val eps = 1.0 / accuracy
    val ok = qs.zipWithIndex.map { case (q, i) =>
      val target = col("__n") * q
      val slack = col("__n") * eps + 1.0
      (col(s"__lt$i") - target <= slack) && (target - col(s"__le$i") <= slack)
    }.reduce(_ && _)
    joined.groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
      .withColumn("approx_ok", ok)
      .select(col(groupCol) +:
        qs.map(q => col(s"p${(q * 100).round}")) :+ col("approx_ok"): _*)
  }
}
