package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Scale probe for the xlsx streaming source's seen-file offset (PLANS.md
  * r16): the offset is the full set of `path#mtime#length` versions, so a
  * long-lived watch accumulates one entry per workbook ever seen — the
  * growth axis the r15 verdict asked to measure at ~1k workbooks, with the
  * opt-in `pruneRemovedFiles` compaction on and off.
  *
  * Lifecycle per mode: stage `nFiles` real workbooks from the customer
  * table → AvailableNow drain (timed) → delete half the staged workbooks,
  * stage `nLate` late arrivals → second drain over the SAME checkpoint
  * (timed; this is where pruning fires, at admission) → report final
  * offset entry count, last-offset JSON bytes, total offset-log bytes
  * (the Σ over batches — the quadratic signal), and the settled row count
  * (must be identical across modes: pruning may only shrink the OFFSET,
  * never the data).
  *
  * `runMain graft.tools.ProbeXlsx <sfDir> [nFiles] [nLate] [filesPerTrigger]`
  */
object ProbeXlsx {

  private def stage(spark: SparkSession, sfDir: String, dir: String,
                    nFiles: Int, prefix: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    val header: Seq[Any] = Seq("c_custkey", "c_name", "c_mktsegment")
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    graft.model.Tables(spark, sfDir, "customer")
      .select(col("c_custkey").cast("string").as("c_custkey"),
        col("c_name"), col("c_mktsegment"))
      .repartitionByRange(nFiles, col("c_custkey"))
      .foreachPartition { (it: Iterator[Row]) =>
        val rows = it.map(r =>
          Seq[Any](r.getString(0), r.getString(1), r.getString(2))).toSeq
        if (rows.nonEmpty) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val p = new org.apache.hadoop.fs.Path(f"$dir/$prefix-$pid%05d.xlsx")
          val out = p.getFileSystem(hconf.value).create(p, true)
          try graft.sources.xlsx.XlsxWriter.writeTo(out, header +: rows)
          finally out.close()
        }
      }
  }

  private def drain(spark: SparkSession, src: String, ckpt: String,
                    store: String, prune: Boolean, perTrigger: Int): Double = {
    val schema = org.apache.spark.sql.types.StructType(
      Seq("c_custkey", "c_name", "c_mktsegment").map(n =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.StringType, nullable = true)))
    val t0 = System.nanoTime()
    val q = spark.readStream.format("xlsx").schema(schema)
      .option("maxFilesPerTrigger", perTrigger.toString)
      .option("pruneRemovedFiles", prune.toString)
      .load(src)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$store/batch=$id")
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    (System.nanoTime() - t0) / 1e9
  }

  private def offsetStats(ckpt: String): (Int, Long, Long) = {
    val dir = Paths.get(ckpt, "offsets")
    val files = Files.list(dir).iterator().asScala
      .filterNot(_.getFileName.toString.startsWith(".")).toSeq
    val totalBytes = files.map(Files.size).sum
    val last = files.maxBy(_.getFileName.toString.toLong)
    // last line of the offset file is the serialized XlsxOffset JSON array
    val lastJson = Files.readAllLines(last).asScala.last
    val entries = org.json4s.jackson.JsonMethods.parse(lastJson)
      .asInstanceOf[org.json4s.JArray].arr.size
    (entries, Files.size(last), totalBytes)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(1000)
    val nLate = args.lift(2).map(_.toInt).getOrElse(100)
    val perTrigger = args.lift(3).map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (prune <- Seq(false, true)) {
      val root = Files.createTempDirectory("graft_probe_xlsx_").toString
      val src = s"$root/src"; val ckpt = s"$root/ckpt"; val store = s"$root/store"
      Files.createDirectories(Paths.get(store))
      stage(spark, sfDir, src, nFiles, "part")
      def workbooks(): Seq[Path] = Files.list(Paths.get(src))
        .iterator().asScala.toSeq
        .filter(_.getFileName.toString.endsWith(".xlsx"))
        .sortBy(_.getFileName.toString)
      val staged = workbooks().size
      val s1 = drain(spark, src, ckpt, store, prune, perTrigger)
      val (e1, lastB1, totB1) = offsetStats(ckpt)
      // delete every even-numbered workbook (and its LocalFS .crc twin so
      // the checksum layer can't reject a future same-name restage), then
      // stage the late arrivals
      val victims = workbooks().zipWithIndex
        .collect { case (p, i) if i % 2 == 0 => p }
      victims.foreach { p =>
        Files.delete(p)
        val crc = p.resolveSibling("." + p.getFileName.toString + ".crc")
        Files.deleteIfExists(crc)
      }
      stage(spark, "/root/testdata/sf0.1", src, nLate, "late")
      val s2 = drain(spark, src, ckpt, store, prune, perTrigger)
      val (e2, lastB2, totB2) = offsetStats(ckpt)
      val settled = spark.read.parquet(store).count()
      println(f"""{"probe":"xlsx_offsets","prune":$prune,"staged":$staged,"deleted":${victims.size},"late":$nLate,"drain1_sec":$s1%.1f,"drain2_sec":$s2%.1f,"offset_entries_after1":$e1,"offset_entries_after2":$e2,"last_offset_bytes":$lastB2,"offset_log_bytes_total":$totB2,"post1_last_bytes":$lastB1,"post1_total":$totB1,"settled_rows":$settled}""")
    }
    spark.stop()
  }
}
