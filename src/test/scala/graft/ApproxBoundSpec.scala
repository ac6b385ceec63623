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

  test("approx row set matches the exact group key set") {
    val ev = graft.model.Tables(spark, sf, "events").withColumn("day", to_date(col("ts")))
    val exactKeys = graft.query.Dashboards.groupStats(ev, Seq("event_type", "day"), "value", "user_id")
      .select("event_type", "day")
    val approxKeys = graft.query.Dashboards.groupStatsApprox(
        ev, Seq("event_type", "day"), "value", "user_id")
      .select("event_type", "day")
    assert(exactKeys.exceptAll(approxKeys).isEmpty && approxKeys.exceptAll(exactKeys).isEmpty)
  }
}
