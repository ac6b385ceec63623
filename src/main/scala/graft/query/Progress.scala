package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GradeScale
import graft.model.Dims

/** The flagship analytical query: per-student degree progress + cumulative
  * GPA (ĐTBCTL) on the 4.0 scale — reference `app.py:58-191` (SURVEY.md §3.3,
  * operators T10-T21, A1-A4).
  *
  * The reference runs it one student at a time (ES point lookup -> pandas).
  * Here it is set-at-a-time: one pass over the whole enrollment table computes
  * every student's report — the shape that actually works on a cluster. A
  * single-student report is the same plan plus a pushed-down point filter.
  *
  * Parameterized where the reference hardcodes wall-clock facts
  * (`current_year=2024` app.py:102, excluded semester 20251 app.py:131) so
  * goldens stay reproducible (SURVEY.md §7.4).
  */
object Progress {

  case class Params(currentYear: Int = 2024, excludedSemester: Int = 20251,
                    maxCreditsPerSemester: Int = 20)

  /** All-students progress report over an enriched enrollment table.
    *
    * Input columns: F_MASV, F_MAMH, F_TENMHVN, F_TENLOP, F_KHOAHOC, NHHK,
    * F_DIEM2 (double), F_DVHT, F_TCDTTL.
    */
  def report(spark: SparkSession, enrollment: DataFrame,
             params: Params = Params()): DataFrame = {
    val p = params

    // T18: cohort from student-id prefix, via broadcast dim (app.py:86).
    val withKhoa = enrollment
      .withColumn("masv_prefix", substring(col("F_MASV"), 1, 3))
      .join(Dims.cohort(spark), Seq("masv_prefix"), "inner") // app.py drops unknown prefixes

    // T13: query-side coercing casts (app.py:124-125).
    val typed = withKhoa
      .withColumn("F_DIEM2", col("F_DIEM2").try_cast("double"))
      .withColumn("F_DVHT", col("F_DVHT").try_cast("double"))

    // T14/T15: GPA-eligible rows: passed, not '*'-marked, not current semester.
    val gpaEligible = col("F_DIEM2") >= 4.0 &&
      !coalesce(col("F_TENMHVN").contains("*"), lit(false)) &&
      (col("NHHK").isNull || col("NHHK") =!= p.excludedSemester)

    // T16: banding; A1 numerator/denominator as conditional partial aggregates
    // (map-side combine — one shuffle on F_MASV for the whole report).
    val grade4 = GradeScale.grade4(col("F_DIEM2"))

    // A2: major from ANY class prefix, DI checked before FL (app.py:90-98).
    val perStudent = typed.groupBy("F_MASV", "khoa").agg(
      max(when(col("F_TENLOP").startsWith("DI"), 1).otherwise(0)).as("any_di"),
      max(when(col("F_TENLOP").startsWith("FL"), 1).otherwise(0)).as("any_fl"),
      sum(when(gpaEligible, grade4 * col("F_DVHT")).otherwise(0.0)).as("total_points"),
      sum(when(gpaEligible, col("F_DVHT")).otherwise(0.0)).as("credits_earned"),
      // A3: registrar cumulative credits — reference takes iloc[0] from
      // unstable ES order; we pin "value at the latest semester" (max_by with
      // a NHHK/tiebreak total order). Documented deviation, SURVEY.md §7.4.
      max_by(col("F_TCDTTL"), struct(col("NHHK"), col("F_MAMH"))).as("completed_credits"),
      count(lit(1)).as("n_records") // A4
    )

    val withMajor = perStudent.withColumn("major",
      when(col("any_di") === 1, "MMT")
        .when(col("any_fl") === 1, "NNA")
        .otherwise("Chưa xác định"))

    // T18: (major, cohort) dims — broadcast joins.
    val withDims = withMajor
      .join(Dims.creditReq(spark), Seq("major", "khoa"), "left")
      .join(Dims.duration(spark), Seq("major", "khoa"), "left")

    // T19: progress arithmetic (app.py:102-121).
    val arith = withDims
      .withColumn("start_year", lit(2020) + (col("khoa") - 46))
      .withColumn("years_elapsed", lit(p.currentYear) - col("start_year"))
      .withColumn("semesters_elapsed", col("years_elapsed") * 3)
      .withColumn("remaining_credits", col("total_credits") - col("completed_credits"))
      .withColumn("remaining_semesters", col("total_semesters") - col("semesters_elapsed"))
      .withColumn("max_credits_remaining_in_time",
        col("remaining_semesters") * p.maxCreditsPerSemester)
      .withColumn("progress_pct", col("completed_credits") / col("total_credits") * 100)
      // A1: weighted GPA with zero-denominator guard (app.py:137-144).
      .withColumn("dtbctl",
        when(col("credits_earned") > 0, col("total_points") / col("credits_earned"))
          .otherwise(0.0))

    // T20: tri-state status (app.py:154-178). A student whose requirement
    // dims are UNKNOWN (major 'Chưa xác định' — no creditReq/duration row)
    // gets a NULL status, not a verdict: the null remaining_credits made
    // both when() arms null-false and the otherwise asserted a definite
    // 'Chậm tiến độ' over unknown requirements (review finding). The
    // reference raises KeyError here; a null verdict is the documented
    // sane deviation (same class as the left-join deviation itself).
    arith.withColumn("status",
      when(col("remaining_credits").isNull, lit(null).cast("string"))
        .when(col("remaining_credits") <= 0, "Hoàn thành")
        .when(col("remaining_credits") <= col("max_credits_remaining_in_time"), "Đúng tiến độ")
        .otherwise("Chậm tiến độ"))
      .drop("any_di", "any_fl")
  }

  /** Registrar cross-check (SURVEY.md §5, the reference's one implicit
    * correctness oracle): the registrar-computed cumulative credits
    * (`F_TCDTTL`, app.py:108) ride along in the data and can be audited
    * against OUR sum of passed credits per student. Output one row per
    * student: the A3-pinned registrar figure, the computed sum (passed =
    * grade ≥ 4.0, the `app.py:137` passing bar; '*'-marked courses are
    * credit-bearing here — only the GPA excludes them), and the delta.
    * A nonzero delta flags registrar/transcript drift — bad feed rows,
    * transfer credits outside the transcript, or a broken upstream join.
    * One shuffle on the student key; metrics-sized output. */
  def creditsAudit(enrollment: DataFrame): DataFrame = {
    val typed = enrollment
      .withColumn("F_DIEM2", col("F_DIEM2").try_cast("double"))
      .withColumn("F_DVHT", col("F_DVHT").try_cast("double"))
      // F_TCDTTL typed like the others BEFORE the max_by pick: delta below
      // is then double − double — a junk registrar value audits as a null
      // delta under the same lenient-cast posture, instead of relying on
      // implicit string−double coercion (silent null in legacy mode, a
      // throw under ANSI) (review finding).
      .withColumn("F_TCDTTL", col("F_TCDTTL").try_cast("double"))
    typed.groupBy("F_MASV").agg(
      max_by(col("F_TCDTTL"), struct(col("NHHK"), col("F_MAMH")))
        .as("registrar_credits"),
      sum(when(col("F_DIEM2") >= 4.0, col("F_DVHT")).otherwise(0.0))
        .as("computed_credits"))
      .withColumn("delta", col("registrar_credits") - col("computed_credits"))
  }

  /** Single-student transcript view (the table the reference renders):
    * T10 point filter, T12 projection, T17 year/semester split, sort, T21. */
  def transcript(enrollment: DataFrame, masv: String): DataFrame =
    enrollment
      .filter(col("F_MASV") === masv)                                      // T10
      .select("F_MAMH", "F_TENMHVN", "F_DVHT", "F_MASV", "F_TENLOP",
        "NHHK", "F_DIEM2", "F_TCDTTL")                                     // T12
      .withColumn("nam_hoc", substring(col("NHHK").cast("string"), 1, 4).cast("int")) // T17
      .withColumn("hoc_ky", substring(col("NHHK").cast("string"), 5, 1).cast("int"))
      // T11 cap applied ON the sort order, ties broken by course code for
      // a total order: the reference's ES size=1000 cap returns an
      // arbitrary subset, and a limit BEFORE any sort reproduces that
      // nondeterminism in Spark — a >1000-record student's transcript
      // would differ run to run (review finding). Deterministic-cap is the
      // same documented pinning T2/A3 apply to the reference's other
      // arbitrary orders.
      .orderBy(col("NHHK"), col("F_MAMH"))                                 // sort
      .limit(1000)                                                         // T11
      .drop("nam_hoc", "hoc_ky")                                           // T21
}
