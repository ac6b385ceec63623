package graft

import org.apache.spark.sql.functions._

/** Small-files compaction: content is an exact multiset match, file counts
  * actually drop, the swap leaves no staging debris, and partition-pruning
  * layouts survive per-partition compaction. */
class CompactSpec extends SparkSpec {
  import spark.implicits._
  import graft.etl.Compact

  private def fileCount(dir: String): Int =
    new java.io.File(dir).listFiles().count(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))

  test("flat compaction merges many small files, content unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("cpt").toString + "/t"
    val df = (1L to 10000L).map(i => (i, s"v$i", i * 1.5)).toDF("id", "s", "x")
    df.repartition(40).write.parquet(dir)
    assert(fileCount(dir) == 40)
    val before = spark.read.parquet(dir).orderBy("id").collect().toSeq

    val (b, a) = Compact.compact(spark, dir, targetBytes = 512L << 20)
    assert(b == 40 && a == 1, s"$b -> $a")
    val after = spark.read.parquet(dir).orderBy("id").collect().toSeq
    assert(after == before)
    // no staging/backup debris
    val parent = new java.io.File(dir).getParentFile
    assert(!parent.listFiles().exists(_.getName.contains("__compact")))
  }

  test("partitioned compaction preserves pruning and skips small partitions") {
    val root = java.nio.file.Files.createTempDirectory("cptp").toString + "/t"
    val df = (1L to 6000L).map(i => (i, s"2024-01-0${i % 3 + 1}", i * 1.0))
      .toDF("id", "day", "x")
    // day=...1 gets 20 files, the others 2 — only the first should compact
    df.filter($"day" === "2024-01-01").repartition(20)
      .write.partitionBy("day").mode("append").parquet(root)
    df.filter($"day" =!= "2024-01-01").repartition(2)
      .write.partitionBy("day").mode("append").parquet(root)
    val before = spark.read.parquet(root).orderBy("id").collect().toSeq

    val compacted = Compact.compactPartitioned(spark, root,
      targetBytes = 512L << 20, maxFiles = 4)
    assert(compacted.map(_._1) == Seq("day=2024-01-01"), s"$compacted")
    assert(compacted.head._2 == 20 && compacted.head._3 == 1)

    val after = spark.read.parquet(root)
    assert(after.orderBy("id").collect().toSeq == before)
    // pruning still works: the day filter must become a PartitionFilter
    val q = after.filter($"day" === "2024-01-02")
    val plan = q.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*day[^\\]]*\\]".r.findFirstIn(plan).isDefined,
      s"no partition pruning after compaction:\n$plan")
    assert(q.count() == 2000)
  }

  test("compaction plan is shuffle-free: coalesce, no Exchange") {
    // The whole point of sizing output from actual bytes + coalesce is that
    // merging files costs a read and a write, never a shuffle — at 100 TB a
    // repartition-based compactor would move the store through the network
    // once per maintenance pass. Pin the plan, not just the doc claim.
    val dir = java.nio.file.Files.createTempDirectory("cptx").toString + "/t"
    (1L to 1000L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartition(16).write.parquet(dir)
    val plan = spark.read.parquet(dir).coalesce(2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"compaction read plan shuffles:\n$plan")
    assert(plan.contains("Coalesce"), s"expected Coalesce node:\n$plan")
  }
}
