package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-files compaction for parquet stores (the operational tail of S5/T9:
  * a streaming upsert sink or daily partition router emits a file per
  * micro-batch per partition — after a month the store is thousands of
  * kilobyte files and every scan pays a task per file).
  *
  * `compact` rewrites one directory into ~`targetBytes` files: it sizes the
  * output from the ACTUAL input bytes (not a guessed partition count),
  * rewrites into a staging directory, and swaps via two metadata renames.
  * Readers never observe a half-written mix; there IS a sub-second window
  * between the renames where the path is absent (a reader retries), and if
  * the promote rename fails the original directory is restored from the
  * backup before rethrowing — run compaction from a maintenance window or a
  * coordinator that fences concurrent readers on stores without atomic
  * rename. `compactPartitioned` applies the same pass per partition
  * subdirectory (`k=v`), preserving partition pruning, skipping directories
  * already under `maxFiles`.
  *
  * Row order inside rewritten files is not preserved (parquet scans make no
  * ordering promise); content equality is the contract — pinned by
  * CompactSpec as an exact multiset match.
  */
object Compact {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dirBytes(spark: SparkSession, dir: Path): Long =
    fs(spark, dir).listStatus(dir).filter(_.isFile)
      .filterNot(_.getPath.getName.startsWith("_")).map(_.getLen).sum

  private def dataFileCount(spark: SparkSession, dir: Path): Int =
    fs(spark, dir).listStatus(dir).count(s =>
      s.isFile && !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))

  /** Rewrite `dir` (a flat parquet directory) into ceil(bytes/targetBytes)
    * files. Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, dir: String, targetBytes: Long = 128L << 20): (Int, Int) = {
    require(targetBytes > 0)
    val src = new Path(dir)
    val f = fs(spark, src)
    val before = dataFileCount(spark, src)
    val bytes = dirBytes(spark, src)
    val parts = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val staging = new Path(src.getParent, s".${src.getName}__compact_staging")
    val backup = new Path(src.getParent, s".${src.getName}__compact_old")
    f.delete(staging, true); f.delete(backup, true)
    // coalesce, not repartition: merging files needs no shuffle
    spark.read.parquet(dir).coalesce(parts)
      .write.mode("overwrite").parquet(staging.toString)
    // two metadata renames, no data copy; restore the backup if the
    // promote fails so the store path never stays missing
    require(f.rename(src, backup), s"could not move $src aside")
    try {
      require(f.rename(staging, src), s"could not promote $staging")
    } catch {
      case e: Throwable =>
        f.rename(backup, src) // best-effort restore of the original layout
        throw e
    }
    f.delete(backup, true)
    (before, dataFileCount(spark, src))
  }

  /** Per-partition compaction of a `partitionBy` layout: each `k=v`
    * subdirectory with more than `maxFiles` data files is compacted
    * independently (pruning layout untouched). Returns the compacted
    * partition directories with their before/after counts. */
  def compactPartitioned(spark: SparkSession, root: String,
                         targetBytes: Long = 128L << 20,
                         maxFiles: Int = 4): Seq[(String, Int, Int)] = {
    val rootP = new Path(root)
    val f = fs(spark, rootP)
    f.listStatus(rootP).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .flatMap { d =>
        val n = dataFileCount(spark, d.getPath)
        if (n <= maxFiles) None
        else {
          val (b, a) = compact(spark, d.getPath.toString, targetBytes)
          Some((d.getPath.getName, b, a))
        }
      }
  }
}
