package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics: ordered funnels and cohort retention — the two
  * dashboard shapes the reference's Streamlit layer points at (per-student
  * progress over time, app.py's date-bucketed views) generalized to the
  * events table.
  *
  * Scale shape: both operators shuffle the events table ONCE on `user_id`;
  * every later step is either a per-group fold (funnel) or an aggregation
  * whose input is already clustered on the join key (retention's
  * first-touch join), so Catalyst plans no second exchange of the big side.
  */
object Funnels {

  /** Strict ordered funnel: for each user, walk events in time order and
    * advance one step each time the NEXT wanted event type appears (the
    * greedy walk equals the min-timestamp chain: t1 = min ts of step 1,
    * t2 = min ts of step 2 after t1, ...). Returns one row per funnel step:
    * (step 1-based, step_name, users reached).
    *
    * One shuffle: groupBy user collects that user's (ts, type) pairs —
    * bounded by events-per-user, the usual funnel-engine contract (cap
    * upstream if a tracker bug floods one user). The fold over the sorted
    * array is a small per-row loop; counting users per step is a metrics-
    * sized second aggregation.
    */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty)
    val stepArr = array(steps.map(lit): _*)
    val reached = events
      .filter(col(typeCol).isin(steps: _*))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col(tsCol).as("ts"),
        col(typeCol).as("et")))).as("evs"))
      .select(aggregate(col("evs"),
        struct(lit(0).as("step"), lit(null).cast("timestamp").as("t")),
        (acc, e) => when(acc.getField("step") < steps.size &&
            e.getField("et") === get(stepArr, acc.getField("step")) &&
            (acc.getField("t").isNull || e.getField("ts") > acc.getField("t")),
          struct((acc.getField("step") + 1).as("step"), e.getField("ts").as("t")))
          .otherwise(acc),
        acc => acc.getField("step")).as("step"))
    // users-reached-step-k is monotone: one tiny aggregate, then explode the
    // cumulative counts back out to one row per step.
    // coalesce: a global sum over ZERO users (no event matched any step) is
    // null; the funnel must report 0 users per step, as count(*) would.
    val aggs = steps.indices.map(i =>
      coalesce(sum(when(col("step") >= i + 1, 1L).otherwise(0L)), lit(0L)).as(s"c$i"))
    reached.agg(aggs.head, aggs.tail: _*)
      .select(posexplode(array(steps.indices.map(i => col(s"c$i")): _*))
        .as(Seq("i", "users")))
      .select((col("i") + 1).cast("int").as("step"),
        get(stepArr, col("i")).as("step_name"),
        col("users"))
  }

  /** Cohort retention: cohort = each user's first event date; a user counts
    * as retained at `day_offset` d if they have any event exactly d days
    * after their cohort date. Returns (cohort_date, day_offset, users),
    * day offsets limited to `maxDays`.
    *
    * Plan: first-touch aggregate shuffles events once on user; the join
    * back to events is on the SAME key, so the big side reuses that
    * clustering; the final (cohort, offset) aggregate is over distinct
    * (user, day) pairs — pre-deduped map-side by the distinct aggregate.
    */
  def retention(events: DataFrame, maxDays: Int = 30,
                userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val day = to_date(col(tsCol))
    val firstTouch = events.groupBy(col(userCol))
      .agg(min(day).as("cohort_date"))
    events.select(col(userCol), day.as("d"))
      .join(firstTouch, userCol)
      .select(col("cohort_date"),
        datediff(col("d"), col("cohort_date")).as("day_offset"),
        col(userCol))
      .filter(col("day_offset").between(0, maxDays))
      .groupBy("cohort_date", "day_offset")
      .agg(countDistinct(col(userCol)).as("users"))
  }
}
