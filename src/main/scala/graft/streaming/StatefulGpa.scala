package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.GradeScale

/** Per-student cumulative GPA as keyed streaming state — the flagship A1
  * aggregate (`app.py:137-144`) maintained continuously instead of
  * recomputed per query.
  *
  * `mapGroupsWithState` keeps one tiny (points, credits) accumulator per
  * student; each micro-batch folds its new eligible enrollments into the
  * state and emits the updated cumulative GPA. This is the custom-state
  * extension surface (SURVEY.md §2.5): per-key state is bounded (two
  * doubles + a count), shuffles carry only (masv, pts, cr) partial rows,
  * and state lives in the checkpointed state store — a restart resumes
  * exactly (unlike the reference's in-memory producer state, pro.py:18).
  */
object StatefulGpa {

  /** (cumulative quality points, cumulative eligible credits, rows seen). */
  case class GpaState(points: Double, credits: Double, n: Long)

  /** Emitted once per student per micro-batch that touched the student. */
  case class GpaUpdate(masv: String, dtbctl: Double, credits: Double, n: Long)

  /** Rows already reduced to per-student per-batch partials. (Public: the
    * encoder's generated projections cannot access private members.) */
  case class Partial(masv: String, pts: Double, cr: Double, n: Long)

  /** Eligible-course projection: passed (>= 4.0), GPA-counted (no '*' in the
    * course name), not the excluded in-progress semester — identical
    * predicate to the batch flagship query. */
  def eligiblePartials(enrollments: DataFrame, excludedSemester: Int): DataFrame = {
    val eligible = col("F_DIEM2") >= 4.0 &&
      !col("F_TENMHVN").contains("*") && col("NHHK") =!= excludedSemester
    enrollments.filter(eligible && col("F_MASV").isNotNull)
      .select(col("F_MASV").as("masv"),
        (GradeScale.grade4(col("F_DIEM2")) * col("F_DVHT")).as("pts"),
        col("F_DVHT").as("cr"))
  }

  /** The stateful leg. Input: any (streaming) frame with masv/pts/cr. */
  def runningGpa(partials: DataFrame): Dataset[GpaUpdate] = {
    val spark = partials.sparkSession
    import spark.implicits._
    partials.select(col("masv"), col("pts"), col("cr"), lit(1L).as("n"))
      .as[Partial]
      .groupByKey(_.masv)
      .mapGroupsWithState[GpaState, GpaUpdate](GroupStateTimeout.NoTimeout) {
        (masv, rows, state: GroupState[GpaState]) =>
          val prev = state.getOption.getOrElse(GpaState(0.0, 0.0, 0L))
          val next = rows.foldLeft(prev) { (s, r) =>
            GpaState(s.points + r.pts, s.credits + r.cr, s.n + r.n)
          }
          state.update(next)
          GpaUpdate(masv,
            if (next.credits > 0) next.points / next.credits else 0.0,
            next.credits, next.n)
      }
  }

  /** Convenience: full streaming leg from raw enrollments; `Update` output
    * mode (one row per touched student per batch). */
  def stream(enrollments: DataFrame, excludedSemester: Int = 20251): Dataset[GpaUpdate] =
    runningGpa(eligiblePartials(enrollments, excludedSemester))

  val outputMode: OutputMode = OutputMode.Update()

  /** The same accumulator on the `transformWithState` arbitrary-state API
    * (Spark 4's successor to mapGroupsWithState): typed named state via a
    * [[org.apache.spark.sql.streaming.StatefulProcessor]], per-state TTL,
    * timers, and composable multi-state — the operator the old API grows
    * into on a shared cluster. Requires the RocksDB state store provider
    * (changelog-checkpointed, memory-bounded — the 100 TB state backend;
    * the HDFS-backed default keeps every key on-heap). Values are
    * IDENTICAL to [[runningGpa]] — same partials, same fold. */
  class GpaProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, Partial, GpaUpdate] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, ValueState}
    @transient private var st: ValueState[GpaState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[GpaState]("gpa",
        org.apache.spark.sql.Encoders.product[GpaState], TTLConfig.NONE)

    override def handleInputRows(masv: String, rows: Iterator[Partial],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[GpaUpdate] = {
      val prev = if (st.exists()) st.get() else GpaState(0.0, 0.0, 0L)
      val next = rows.foldLeft(prev) { (s, r) =>
        GpaState(s.points + r.pts, s.credits + r.cr, s.n + r.n)
      }
      st.update(next)
      Iterator.single(GpaUpdate(masv,
        if (next.credits > 0) next.points / next.credits else 0.0,
        next.credits, next.n))
    }
  }

  /** [[runningGpa]] on transformWithState. */
  def runningGpaV2(partials: DataFrame): Dataset[GpaUpdate] = {
    import org.apache.spark.sql.streaming.TimeMode
    val spark = partials.sparkSession
    import spark.implicits._
    partials.select(col("masv"), col("pts"), col("cr"), lit(1L).as("n"))
      .as[Partial]
      .groupByKey(_.masv)
      .transformWithState(new GpaProcessor, TimeMode.None(), OutputMode.Update())
  }
}
