package graft.tools

import org.apache.spark.sql.SparkSession
import graft.etl.Compact

/** Throwaway repro for the CompactSpec reader-hammer flake: loops the
  * adopt → hammer → compact sequence until a reader-thread failure, then
  * prints java.io.File existence vs Hadoop-FS existence from both threads. */
object ReproCompact {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    var round = 0
    while (round < 12) {
      round += 1
      val root = java.nio.file.Files.createTempDirectory("rcpt").toString + "/t"
      val df = (1L to 20000L).map(i => (i, s"v$i", i * 1.5)).toDF("id", "s", "x")
      df.repartition(32).write.parquet(root)
      Compact.adopt(spark, root)
      Compact.readCurrent(spark, root).count()
      val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      val fail = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val firstRead = new java.util.concurrent.CountDownLatch(1)
      val reader = new Thread(() => {
        while (!done.get()) {
          try {
            Compact.readCurrent(spark, root).count()
            firstRead.countDown()
          } catch { case t: Throwable =>
            if (fail.compareAndSet(null, t)) {
              val f = new java.io.File(s"$root/_current")
              System.err.println(s"[repro] round=$round READER FAIL: $t")
              System.err.println(s"[repro]   java.io.File.exists=${f.exists()} len=${f.length()}")
              val hfs = new org.apache.hadoop.fs.Path(root)
                .getFileSystem(spark.sparkContext.hadoopConfiguration)
              System.err.println(s"[repro]   hadoopFs.exists=${hfs.exists(new org.apache.hadoop.fs.Path(root, "_current"))}")
              System.err.println(s"[repro]   dir listing=${Option(f.getParentFile.list()).map(_.toSeq).getOrElse(Nil)}")
            }
            firstRead.countDown()
          }
        }
      })
      reader.start()
      firstRead.await(120, java.util.concurrent.TimeUnit.SECONDS)
      for (_ <- 1 to 3)
        Compact.compactVersioned(spark, root, targetBytes = 512L << 20, keepVersions = 4)
      done.set(true); reader.join(60000)
      System.err.println(s"[repro] round=$round done, failed=${fail.get() != null}")
      if (fail.get() != null) { spark.stop(); sys.exit(2) }
    }
    spark.stop()
    System.err.println("[repro] no failure in 12 rounds")
  }
}
