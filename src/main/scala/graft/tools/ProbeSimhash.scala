package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SimHash width-cost probe (round-17 adjudication follow-up): the r16
  * 32→60-bit widening nearly doubled the per-token vote-aggregation width
  * on every simhash query, and the advisor asked for a direct 32-vs-60
  * measurement to separate that cost from the r16 driver-bench artifact.
  * Runs d4's signature pass and d5's banded near-dup at both widths on the
  * same corpus, two passes each (pass 2 = warm).
  *
  *   runMain graft.tools.ProbeSimhash <sfDir>
  *
  * NOTE: the 32-bit arm is a COST arm only — its near-dup output differs
  * by design (fewer bits → more Hamming-≤3 pairs), which is the recall
  * reason the width was raised; only wall-clock is compared here. */
object ProbeSimhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.model.Tables(spark, dir, "documents")
    def time(label: String)(body: => Long): Unit =
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = body
        println(f"[simhash] pass=$pass $label rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    for (bits <- Seq(32, 60)) {
      time(s"d4_signatures bits=$bits") {
        // fold the signature into a scalar so the vote columns provably
        // evaluate (the ProbeChunk elimination trap); the printed value is
        // the signature xor-fold, not a row count (sum would overflow the
        // ANSI long at 60 bits)
        graft.ops.Dedup.simhash(docs, "text", bits)
          .agg(bit_xor(col("simhash"))).head().getLong(0)
      }
      time(s"d5_neardup bits=$bits") {
        graft.ops.Dedup.simhashNearDup(
          graft.ops.Dedup.simhash(docs, "text", bits), maxHamming = 3, bits = bits)
          .count()
      }
    }
    spark.stop()
  }
}
