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
}
