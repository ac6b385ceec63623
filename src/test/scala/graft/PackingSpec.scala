package graft

import org.apache.spark.sql.functions._

/** x11 sequence packing invariants: the contiguous-fill contract per bucket
  * and the reproducibility of the layout. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = graft.model.Tables(spark, "/root/testdata/sf0.001", "documents")

  test("pack positions are the exact contiguous fill of each bucket") {
    val cap = 512
    val out = graft.ops.Packing.packSequences(docs, "text", capacity = cap)
      .orderBy("bucket", "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    var prevBucket = -1L
    var running = 0L
    out.foreach { case (_, bucket, nTokens, packId, packOffset) =>
      if (bucket != prevBucket) { running = 0L; prevBucket = bucket }
      assert(packId == running / cap && packOffset == running % cap,
        s"bucket $bucket: start $running vs pack $packId+$packOffset")
      assert(packOffset >= 0 && packOffset < cap)
      running += nTokens
    }
  }

  test("length buckets: quantile-balanced, batches full and length-adjacent") {
    val nBuckets = 4
    val out = graft.ops.Packing.lengthBuckets(docs, "text", nBuckets = nBuckets,
        batchSize = 8, shards = 4)
      .as[(Long, Int, Int, Long, Long)].collect()
    assert(out.length == docs.count())
    // quantile buckets are roughly equal-sized (ties can skew, not collapse)
    val byBucket = out.groupBy(_._3).view.mapValues(_.length)
    assert(byBucket.keys.toSet.subsetOf((0 until nBuckets).toSet))
    assert(byBucket.values.min > out.length / (nBuckets * 4))
    // batch ids are dense 0..k per (bucket, shard), each full batch has 8 docs
    out.groupBy(r => (r._3, r._4)).foreach { case (_, g) =>
      val sizes = g.groupBy(_._5).view.mapValues(_.length).toMap
      assert(sizes.keySet == (0L until sizes.size.toLong).toSet)
      (0L until sizes.size.toLong - 1).foreach(b => assert(sizes(b) == 8))
    }
    // within a batch, lengths span less than the whole bucket's span
    val spans = out.groupBy(r => (r._3, r._4, r._5))
      .map { case (_, g) => g.map(_._2).max - g.map(_._2).min }
    val bucketSpans = out.groupBy(_._3)
      .map { case (_, g) => g.map(_._2).max - g.map(_._2).min }
    assert(spans.max <= bucketSpans.max)
  }

  test("layout is deterministic and changes with the salt") {
    val a = graft.ops.Packing.packSequences(docs, "text", 512).collect().toSet
    val b = graft.ops.Packing.packSequences(docs, "text", 512).collect().toSet
    assert(a == b)
    val c = graft.ops.Packing.packSequences(docs, "text", 512, salt = "other")
      .select("doc_id", "bucket").collect().toSet
    val aB = graft.ops.Packing.packSequences(docs, "text", 512)
      .select("doc_id", "bucket").collect().toSet
    assert(c != aB, "salt must reshuffle bucket assignment")
  }

  test("chunk windows: every token covered, overlap exact, short docs emit one chunk") {
    // 10 tokens, width 4, stride 3 -> starts 0,3,6 (6+4 >= 10 stops there):
    // chunks "t0..t3", "t3..t6", "t6..t9" — the last is width-4 because
    // 10-6=4; token t3/t6 appear twice (the overlap contract).
    val docs = Seq(
      (1L, (0 until 10).map(i => s"w$i").mkString(" ")),
      (2L, "a b"), // shorter than width -> exactly one chunk, n_tokens 2
      (3L, "")     // empty -> one chunk, n_tokens 0, empty text
    ).toDF("doc_id", "text")
    val got = graft.ops.Packing.chunkWindows(docs, "text", width = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(t => (t._1, t._2))
    assert(got.filter(_._1 == 1L).toList == List(
      (1L, 0, 0L, 4L, "w0 w1 w2 w3"),
      (1L, 1, 3L, 4L, "w3 w4 w5 w6"),
      (1L, 2, 6L, 4L, "w6 w7 w8 w9")))
    assert(got.filter(_._1 == 2L).toList == List((2L, 0, 0L, 2L, "a b")))
    assert(got.filter(_._1 == 3L).toList == List((3L, 0, 0L, 0L, "")))
  }
}
