package graft

import org.apache.spark.sql.functions.unix_micros
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader contract: `Tables.apply` is the SINGLE timestamp normalization
  * point (VERDICT r11 #2). The driver has regenerated `/root/testdata` under
  * the repo twice — first TIMESTAMP(NANOS) (read as Long without the
  * `nanosAsLong` shim), then TIMESTAMP_MICROS `isAdjustedToUTC=0` (read as
  * TIMESTAMP_NTZ unless NTZ inference is off). Either raw type breaks every
  * `unix_millis`/`unix_micros` consumer at analysis. This spec turns the next
  * storage change from 7 red registry queries into 1 pointed failure.
  */
class LoaderContractSpec extends SparkSpec {
  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("every table loads and no ts column resolves to NTZ or raw Long") {
    for (dir <- dirs; name <- tables) {
      val df = graft.model.Tables(spark, dir, name)
      df.schema.fields.filter(_.name == "ts").foreach { f =>
        assert(f.dataType == TimestampType,
          s"$dir/$name: ts is ${f.dataType}, expected TimestampType " +
            "(loader must normalize NTZ/nanos — see Tables.apply)")
        assert(f.dataType != TimestampNTZType && f.dataType != LongType)
      }
    }
  }

  test("unix_micros(ts) analyzes on events — the exact r11 failure mode") {
    for (dir <- dirs) {
      val ev = graft.model.Tables(spark, dir, "events")
      // .queryExecution.analyzed forces analysis; the r11 break threw
      // DATATYPE_MISMATCH here before a single row moved.
      val analyzed = ev.select(unix_micros(ev.col("ts")).as("us"))
      assert(analyzed.queryExecution.analyzed != null)
      assert(analyzed.limit(1).collect().nonEmpty, s"$dir/events is empty")
    }
  }
}
