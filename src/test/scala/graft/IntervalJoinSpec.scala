package graft

import org.apache.spark.sql.functions._

/** Bucketized interval join: exact equivalence with the naive range
  * theta-join, inclusive bounds, and the plan property that motivates it —
  * the join runs as an EQUI-join on (key, bucket), never a nested loop. */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.IntervalJoin

  private val points = Seq(
    (1L, 1L, 100L), (2L, 1L, 250L), (3L, 1L, 300L), (4L, 1L, 999L),
    (5L, 2L, 100L), (6L, 2L, 5000L), (7L, 3L, 42L)
  ).toDF("pid", "k", "t")

  private val intervals = Seq(
    (10L, 1L, 100L, 300L),   // catches 1,2,3 (inclusive both ends)
    (11L, 1L, 301L, 400L),   // catches none
    (12L, 2L, 0L, 10000L),   // catches 5,6
    (13L, 9L, 0L, 10000L),   // no points for key 9
    (14L, 3L, 50L, 40L)      // inverted: dropped
  ).toDF("iid", "k", "s", "e")

  test("matches the naive range join exactly, bounds inclusive") {
    for (w <- Seq(1L, 7L, 100L, 1000L, 100000L)) {
      val got = IntervalJoin.bucketed(points, intervals, "k", "t", "s", "e", w)
        .select(col("p_pid").as("pid"), col("i_iid").as("iid"))
        .as[(Long, Long)].collect().toSet
      val naive = points.join(intervals, Seq("k"))
        .filter(col("t") >= col("s") && col("t") <= col("e"))
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == naive, s"bucket width $w: $got != $naive")
      assert(got == Set((1L, 10L), (2L, 10L), (3L, 10L), (5L, 12L), (6L, 12L)))
    }
  }

  test("open-ended intervals are clamped to the points' bucket range, exactly") {
    // An SCD2-style 'current' interval ending at a sentinel far future
    // would explode to ~10^14 bucket rows at w=1 (or exceed sequence()'s
    // element cap outright) — the clamp bounds the explosion to the
    // points' observed range, which is exact: buckets with no points
    // cannot produce pairs (review finding).
    val open = Seq(
      (20L, 1L, 200L, Long.MaxValue / 2),  // catches points 2,3,4
      (21L, 2L, 0L, 9_999_999_999_999L))   // catches 5,6
      .toDF("iid", "k", "s", "e")
    val got = IntervalJoin.bucketed(points, open, "k", "t", "s", "e", 1L)
      .select(col("p_pid").as("pid"), col("i_iid").as("iid"))
      .as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 20L), (3L, 20L), (4L, 20L), (5L, 21L), (6L, 21L)))
    // no points at all: empty result, no explosion
    val noPts = points.filter(col("k") === 99L)
    assert(IntervalJoin.bucketed(noPts, open, "k", "t", "s", "e", 1L).isEmpty)
  }

  test("carries all prefixed point and interval columns") {
    val out = IntervalJoin.bucketed(points, intervals, "k", "t", "s", "e", 100L)
    assert(out.columns.toSet ==
      Set("p_pid", "p_k", "p_t", "i_iid", "i_k", "i_s", "i_e"))
  }

  test("plan is an equi-join on (key, bucket), not a nested loop") {
    val out = IntervalJoin.bucketed(points, intervals, "k", "t", "s", "e", 100L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"nested loop in:\n$plan")
    assert(plan.contains("Join") || plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
  }

  test("derived width matches the naive range join exactly") {
    // The no-knob overload must be a pure performance decision: identical
    // output to every hand-picked width, including under the SCD2 sentinel
    // shape (where the CLAMPED median keeps the width finite and sane).
    val naive = points.join(intervals, Seq("k"))
      .filter(col("t") >= col("s") && col("t") <= col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val got = IntervalJoin.bucketed(points, intervals, "k", "t", "s", "e")
      .select(col("p_pid").as("pid"), col("i_iid").as("iid"))
      .as[(Long, Long)].collect().toSet
    assert(got == naive)
    val open = Seq(
      (20L, 1L, 200L, Long.MaxValue / 2),
      (21L, 2L, 0L, 9_999_999_999_999L)).toDF("iid", "k", "s", "e")
    val gotOpen = IntervalJoin.bucketed(points, open, "k", "t", "s", "e")
      .select(col("p_pid").as("pid"), col("i_iid").as("iid"))
      .as[(Long, Long)].collect().toSet
    assert(gotOpen == Set((2L, 20L), (3L, 20L), (4L, 20L), (5L, 21L), (6L, 21L)))
    // degenerate inputs: no intervals / no points — empty, no width blowup
    assert(IntervalJoin.bucketed(points, intervals.filter(col("k") === 99L),
      "k", "t", "s", "e").isEmpty)
    assert(IntervalJoin.bucketed(points.filter(col("k") === 99L), open,
      "k", "t", "s", "e").isEmpty)
  }

  test("derived width survives a bimodal distribution (tiny median, one huge span)") {
    // Median-of-lengths alone is a trap: three 1-µs intervals drag the
    // derived width to 1 µs, and the one range-spanning interval then
    // explodes sequence() over a >2^31-element bucket range — the exact
    // blowup class the r15 clamp fixed for sentinels. The derived width
    // must be floored so no interval can explode past the bucket budget.
    val p = Seq((1L, 1L, 0L), (2L, 1L, 2500000000L), (3L, 1L, 5000000000L))
      .toDF("pid", "k", "t")
    val ivs = Seq(
      (10L, 1L, 100L, 100L), (11L, 1L, 200L, 200L), (12L, 1L, 300L, 300L),
      (13L, 1L, 0L, 5000000000L)).toDF("iid", "k", "s", "e")
    val got = IntervalJoin.bucketed(p, ivs, "k", "t", "s", "e")
      .select(col("p_pid").as("pid"), col("i_iid").as("iid"))
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 13L), (2L, 13L), (3L, 13L)))
  }

  test("a point on a bucket boundary matches intervals in both buckets") {
    val p = Seq((1L, 1L, 200L)).toDF("pid", "k", "t")
    val ivs = Seq((10L, 1L, 150L, 200L), (11L, 1L, 200L, 280L)).toDF("iid", "k", "s", "e")
    val got = IntervalJoin.bucketed(p, ivs, "k", "t", "s", "e", 100L)
      .select("i_iid").as[Long].collect().toSet
    assert(got == Set(10L, 11L))
  }
}
