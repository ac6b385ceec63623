package graft

import org.apache.spark.sql.functions._

/** Error-bound gate for the sketch aggregates: the HLL++ distinct count has
  * no DuckDB oracle (register layouts differ per engine — the driver records
  * it rows-only), so this spec IS its correctness check: every group's
  * approximation must sit within the advertised relative-error envelope of
  * the exact count computed by the audit-path aggregate. */
class ApproxBoundSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct stays within 3*rsd of the exact per-group count") {
    val rsd = 0.01
    val ev = graft.model.Tables(spark, sf, "events").withColumn("day", to_date(col("ts")))
    val exact = graft.query.Dashboards.groupStats(ev, Seq("event_type", "day"), "value", "user_id")
      .select(col("event_type"), col("day"), col("n_entities"))
    val approx = graft.query.Dashboards.groupStatsApprox(
        ev, Seq("event_type", "day"), "value", "user_id", rsd)
      .select(col("event_type"), col("day"), col("n_entities_approx"))
    val joined = exact.join(approx, Seq("event_type", "day")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val e = r.getAs[Long]("n_entities").toDouble
      val a = r.getAs[Long]("n_entities_approx").toDouble
      assert(math.abs(a - e) <= 3 * rsd * e + 1e-9,
        s"group (${r.get(0)}, ${r.get(1)}): approx $a vs exact $e exceeds 3*rsd")
    }
  }

  test("approx_percentile rank error stays within the GK accuracy bound") {
    // approx_percentile(accuracy=N) guarantees rank error <= n/N per group:
    // the returned value's rank must fall within [target - n/N, target + n/N].
    val accuracy = 1000
    val ev = graft.model.Tables(spark, sf, "events")
    val approx = graft.SparkEntry.queries("a5_percentiles_approx")(spark, sf).collect()
    val byType = ev.select("event_type", "value").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val vals = byType(r.getString(0))
      val n = vals.length.toDouble
      for ((q, i) <- Seq(0.5, 0.9, 0.99).zipWithIndex) {
        val v = r.getDouble(i + 1)
        // rank range of v in the sorted sample (ties included)
        val lo = vals.count(_ < v)
        val hi = vals.count(_ <= v)
        val target = q * n
        // +1: rank conventions (floor/ceil, 0/1-based) differ by one position
        assert(target >= lo - n / accuracy - 1 && target <= hi + n / accuracy + 1,
          s"${r.getString(0)} p$q: value $v rank [$lo,$hi] vs target $target (n=$n)")
      }
    }
  }

  test("approx row set matches the exact group key set") {
    val ev = graft.model.Tables(spark, sf, "events").withColumn("day", to_date(col("ts")))
    val exactKeys = graft.query.Dashboards.groupStats(ev, Seq("event_type", "day"), "value", "user_id")
      .select("event_type", "day")
    val approxKeys = graft.query.Dashboards.groupStatsApprox(
        ev, Seq("event_type", "day"), "value", "user_id")
      .select("event_type", "day")
    assert(exactKeys.exceptAll(approxKeys).isEmpty && approxKeys.exceptAll(exactKeys).isEmpty)
  }

  test("winsorize clips to exact per-group interpolated percentile bounds") {
    import spark.implicits._
    // 1..100 in group g, one far outlier group kept separate
    val df = ((1 to 100).map(i => ("g", i.toDouble)) :+ (("h", 1e9)))
      .toDF("k", "value")
    val got = graft.query.Dashboards.winsorize(df, Seq("k"), "value", 0.05, 0.95)
      .select("k", "value", "value_w").as[(String, Double, Double)].collect()
    val g = got.filter(_._1 == "g")
    // quantile_cont interpolation on 1..100: p05 = 1 + 0.05*99, p95 = 1 + 0.95*99
    assert(g.filter(_._2 == 1.0).head._3 == 5.95)
    assert(g.filter(_._2 == 100.0).head._3 == 95.05)
    assert(g.filter(_._2 == 50.0).head._3 == 50.0)   // interior untouched
    assert(got.filter(_._1 == "h").head._3 == 1e9)   // other group's bounds unused
  }

  test("winsorize keeps null-keyed groups: clipping must not lose rows") {
    import spark.implicits._
    // A transform that drops rows is data loss (review finding: the plain
    // using-column re-join silently discarded every null-keyed row —
    // percentilesApproxGated's null-safe join pattern applies here too).
    val df = ((1 to 10).map(i => (Option("g"), i.toDouble)) ++
      (1 to 10).map(i => (Option.empty[String], i * 100.0)))
      .toDF("k", "value")
    val got = graft.query.Dashboards.winsorize(df, Seq("k"), "value", 0.1, 0.9)
    assert(got.count() == 20, "null-keyed rows vanished from the winsorize output")
    // the null group clips against ITS OWN bounds, not g's
    val nulls = got.filter(col("k").isNull)
      .select("value_w").as[Double].collect()
    assert(nulls.max <= 1000.0 && nulls.min >= 100.0)
  }

  test("anomalyDays flags a spike against its trailing window, warms up quietly") {
    import spark.implicits._
    // 10 days of 4 events, then one day with 40
    val rows = (for {
      d <- 1 to 10; i <- 1 to 4
    } yield (s"2024-01-${"%02d".format(d)} 00:0$i:00")) ++
      (1 to 40).map(i => s"2024-01-11 00:${"%02d".format(i)}:00")
    val ev = rows.map(java.sql.Timestamp.valueOf).toDF("ts")
    val got = graft.query.Dashboards.anomalyDays(ev, "ts", window = 7, zThreshold = 2.0)
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getBoolean(4)))).toMap
    // constant prefix: zero variance -> z null -> not anomalous
    assert(got("2024-01-05") == ((4L, None, false)))
    // day 1: window of one row -> n<2 -> null z, quiet warm-up
    assert(got("2024-01-01")._2.isEmpty && !got("2024-01-01")._3)
    // the spike: mean of (4*6 + 40)/7, large positive z
    val (n11, z11, flag11) = got("2024-01-11")
    assert(n11 == 40L && z11.exists(_ > 2.0) && flag11)
  }
}
