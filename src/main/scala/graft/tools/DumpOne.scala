package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump one named SparkEntry query to parquet for ad-hoc oracle diffing:
  * `runMain graft.tools.DumpOne <sfDir> <name> <outDir>` */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name, outDir) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    graft.SparkEntry.oracleSql.get(name).foreach { sql =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name.sql"), sql)
    }
    spark.stop()
  }
}
