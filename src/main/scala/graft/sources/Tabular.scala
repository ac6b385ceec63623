package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.etl.Ingest

/** S1: the reference's Excel scan semantics (`pro.py:34-44`) as a general
  * headered tabular source: row 1 = schema (csv header inference / declared
  * StructType), data rows streamed, all-blank rows dropped, '' treated as
  * absent.
  *
  * The reference's openpyxl dependency is replaced by Spark's native
  * DataSourceV2 file formats — an .xlsx reader would be a thin V2 wrapper
  * with identical downstream semantics; fixtures here are csv/json/parquet
  * (TESTDATA.md). File listing, split planning, predicate pushdown, and
  * column pruning all come from the format, so the same call scales from one
  * gradebook to a 100 TB lake.
  */
object Tabular {

  /** Batch scan with header-first semantics + blank-row filter. */
  def scan(spark: SparkSession, path: String, format: String = "csv",
           schema: Option[StructType] = None): DataFrame = {
    var reader = spark.read.format(format)
    if (format == "csv") reader = reader.option("header", "true")
    schema.foreach(s => reader = reader.schema(s))
    if (format == "csv" && schema.isEmpty) reader = reader.option("inferSchema", "true")
    val df = reader.load(path)
    normalize(df)
  }

  /** Streaming scan of a watched directory (S2) with the same semantics.
    * Spark's file source discovers new files; modified-file re-processing is
    * recovered by the downstream T1 content dedup (SURVEY.md §7.4). */
  def scanStream(spark: SparkSession, path: String, schema: StructType,
                 format: String = "csv"): DataFrame = {
    var reader = spark.readStream.format(format).schema(schema)
    if (format == "csv") reader = reader.option("header", "true")
    normalize(reader.load(path))
  }

  /** JSONL file round trip: write the frame as newline-delimited JSON and
    * read it back through the REAL json file source with the declared
    * schema and the S1 normalize semantics. JSONL is the standard corpus
    * interchange format of LLM data pipelines (and the file twin of the
    * reference's Kafka JSON lines, `con.py:30-40`); this certifies the
    * escaping round trip — embedded quotes/newlines/unicode in document
    * text must survive write→read byte-exactly. Scale: the write is one
    * map-only pass, the read is a planned file scan with pruning, same as
    * any lake format. */
  def jsonlRoundtrip(spark: SparkSession, df: DataFrame): DataFrame = {
    // Registered for exit-time deletion (review finding: a driver looping
    // the gate/bench rewrites the corpus as JSON per pass; un-registered
    // dirs accreted unboundedly under /tmp).
    val dir = graft.util.TempRoots.create("graft_jsonl_").toString
    df.write.mode("overwrite").json(dir)
    scan(spark, dir, format = "json", schema = Some(df.schema))
  }

  /** Blank-row filter + ''->null for string columns (pro.py:42,76). */
  private def normalize(df: DataFrame): DataFrame = {
    val stringCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(_.name).toSeq
    Ingest.dropBlankRows(Ingest.normalizeEmpty(df, stringCols))
  }
}
