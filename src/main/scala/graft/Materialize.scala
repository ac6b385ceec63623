package graft

import org.apache.spark.sql.{Column, DataFrame}

/** The one materialization seam for "compute this frame once, then fan out".
  *
  * Iterative and multi-consumer pipelines (label-propagation rounds, shared
  * tokenization scans, LSH band indexes) must pin an intermediate frame so
  * Spark neither re-executes the upstream plan per consumer nor grows an
  * unbounded lineage across iterations. HOW the pin happens is an
  * environment decision, not an operator decision, so every operator calls
  * [[pin]] and the mode comes from session config:
  *
  *   - `graft.materialize.mode = local` (default): `localCheckpoint(eager)`.
  *     Right for local[k] and for short-lived interactive clusters: blocks
  *     are executor-memory/disk resident, zero extra I/O, but NOT
  *     fault-tolerant — a lost executor kills the query.
  *   - `graft.materialize.mode = reliable`: `checkpoint(eager)` to the
  *     reliable checkpoint directory (`spark.sparkContext.setCheckpointDir`,
  *     or set `graft.materialize.dir` and [[pin]] installs it on first use).
  *     The 100 TB posture: blocks live on the cluster FS and survive
  *     executor loss; costs one write+read of the pinned frame.
  *     RETENTION: Spark never deletes reliable checkpoint data on its own,
  *     and iterative callers (connected-components pins every round)
  *     accumulate one directory per pin for the session lifetime. Build the
  *     session with `spark.cleaner.referenceTracking.cleanCheckpoints=true`
  *     so the ContextCleaner deletes a checkpoint once its frame is
  *     garbage-collected — the flag is captured when the SparkContext
  *     starts, so it CANNOT be enabled from inside [[pin]]; [[pin]] warns
  *     once per JVM when a reliable-mode session lacks it. Cleanup is
  *     GC-driven (best-effort within a session); long-lived sessions should
  *     still TTL the checkpoint directory externally.
  *   - `graft.materialize.mode = none`: pass-through (no pin). For plan
  *     debugging only — iterative callers grow unbounded lineage.
  *
  * Streaming frames are returned untouched in every mode (micro-batch
  * re-execution is governed by the streaming checkpoint, not this seam).
  * Both checkpoint flavors truncate lineage and materialize eagerly, so
  * downstream PLANS are identical across `local`/`reliable` — PlanChecksSpec
  * pins stay valid in either mode.
  */
object Materialize {

  val ModeKey = "graft.materialize.mode"
  val DirKey = "graft.materialize.dir"

  private val retentionWarned = new java.util.concurrent.atomic.AtomicBoolean(false)

  def pin(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val spark = df.sparkSession
    spark.conf.get(ModeKey, "local") match {
      case "reliable" =>
        val sc = spark.sparkContext
        if (sc.getCheckpointDir.isEmpty) {
          val dir = spark.conf.get(DirKey, "")
          require(dir.nonEmpty,
            s"$ModeKey=reliable needs sparkContext.setCheckpointDir or $DirKey")
          sc.setCheckpointDir(dir)
        }
        // See RETENTION above: the cleaner flag is start-time-only, so the
        // best pin can do for a mis-built session is refuse to be silent.
        // Conf check FIRST: a well-built session must not consume the
        // once-per-JVM sentinel, or a later mis-built session in the same
        // JVM never gets the leak warning (r10 advice).
        if (!sc.getConf.getBoolean(
              "spark.cleaner.referenceTracking.cleanCheckpoints", false) &&
            !retentionWarned.getAndSet(true)) {
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"$ModeKey=reliable without " +
              "spark.cleaner.referenceTracking.cleanCheckpoints=true (start-" +
              "time conf): every pin leaks a checkpoint dir for the session " +
              "lifetime — enable the cleaner flag or TTL the checkpoint dir")
        }
        df.checkpoint(eager = true)
      case "none" => df
      case "local" => df.localCheckpoint(eager = true)
      // A typo ('relaible') on a 100 TB cluster must not silently drop the
      // fault-tolerance posture the mode was set for.
      case other => throw new IllegalArgumentException(
        s"unknown $ModeKey: '$other' (expected local | reliable | none)")
    }
  }

  /** [[pin]] plus named row-level aggregate metrics computed in the SAME
    * action (`Dataset.observe`): the checkpoint job already touches every
    * row, so a scalar the caller needs next (a convergence count, a pinned
    * frame's row count) rides it instead of being its own driver
    * round-trip — the r19/r20 job profiles show each such round-trip costs
    * 0.1–0.5 s of schedule/plan latency regardless of data size.
    * Constraints are observe's: aggregates only, no DISTINCT forms.
    * Metric names come from the columns' aliases.
    *
    * Mode `none` has no eager action to ride (and `Observation.get` would
    * block forever), so the metrics run as their own aggregate job there —
    * the debug mode pays one extra job, the pinning modes save one.
    * Exactness note: observed metrics are accumulator-backed; a
    * re-attempted task could in principle double-count, so callers must
    * use these for CONTROL decisions (loop convergence, width sizing)
    * whose correctness tolerates that, never for query RESULTS. */
  def pinWithMetrics(df: DataFrame, first: Column,
                     rest: Column*): (DataFrame, Map[String, Any]) = {
    require(!df.isStreaming, "pinWithMetrics is a batch seam")
    if (df.sparkSession.conf.get(ModeKey, "local") == "none") {
      val row = df.agg(first, rest: _*).head()
      (df, row.schema.fieldNames.zip(row.toSeq).toMap)
    } else {
      val obs = org.apache.spark.sql.Observation()
      val out = pin(df.observe(obs, first, rest: _*))
      (out, obs.get)
    }
  }

  /** Chainable form: `frame.groupBy(...).agg(...).pinned`. */
  implicit class DatasetPin(private val df: DataFrame) extends AnyVal {
    def pinned: DataFrame = Materialize.pin(df)
  }
}
