package graft

import org.apache.spark.sql.functions.unix_micros
import org.apache.spark.sql.types.TimestampType

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
      }
    }
  }

  // Full as-read schema pin: the loader conf (NTZ inference off, nanos shim)
  // affects EVERY timestamp column, not just `ts` — orders.o_orderdate and
  // lineitem.l_shipdate are likewise stored naive and would read NTZ without
  // it. Pinning name:type for all ten tables turns any future regeneration's
  // type drift into one diff-shaped failure naming the exact columns.
  private val expectedSchemas = Map(
    "region" -> "r_regionkey:int,r_name:string",
    "nation" -> "n_nationkey:int,n_name:string,n_regionkey:int",
    "customer" -> ("c_custkey:bigint,c_name:string,c_nationkey:int," +
      "c_acctbal:double,c_mktsegment:string"),
    "supplier" -> "s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double",
    "part" -> ("p_partkey:bigint,p_name:string,p_brand:string,p_type:string," +
      "p_size:int,p_retailprice:double"),
    "orders" -> ("o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string," +
      "o_totalprice:double,o_orderdate:timestamp,o_orderpriority:string"),
    "lineitem" -> ("l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint," +
      "l_linenumber:int,l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_tax:double,l_returnflag:string,l_linestatus:string," +
      "l_shipdate:timestamp"),
    "events" -> ("event_id:bigint,ts:timestamp,user_id:bigint," +
      "event_type:string,value:double,props:string"),
    "documents" -> "doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint",
    "embeddings" -> "vec_id:bigint,embedding:array<float>,label:int"
  )

  test("every table's as-read schema matches the pinned name:type contract") {
    val drift = for {
      dir <- dirs
      name <- tables
      got = graft.model.Tables(spark, dir, name).schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
      if got != expectedSchemas(name)
    } yield s"$dir/$name:\n  expected ${expectedSchemas(name)}\n  got      $got"
    assert(drift.isEmpty,
      s"as-read schema drift (testdata regenerated with new types?):\n${drift.mkString("\n")}")
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
