package graft

import org.apache.spark.sql.DataFrame

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
        df.checkpoint(eager = true)
      case "none" => df
      case _ => df.localCheckpoint(eager = true)
    }
  }

  /** Chainable form: `frame.groupBy(...).agg(...).pinned`. */
  implicit class DatasetPin(private val df: DataFrame) extends AnyVal {
    def pinned: DataFrame = Materialize.pin(df)
  }
}
