package graft

import org.apache.spark.sql.functions._

/** SparkSessionExtensions surface: the shared test session is built with
  * `spark.sql.extensions=graft.plans.GraftExtensions`, so these functions
  * must resolve from PURE SQL text — no Scala-side registration calls — and
  * produce values identical to the DataFrame forms they share code with. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("injected SQL functions resolve and match the DataFrame forms") {
    val r = spark.sql(
      """SELECT grade_scale(8.2) AS g,
        |  dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d,
        |  word_shingles(array('a', 'b', 'c'), 2) AS sh""".stripMargin)
      .collect().head
    assert(r.getAs[Double]("g") == 3.5)
    assert(r.getAs[Double]("d") == 32.0)
    assert(r.getAs[scala.collection.Seq[String]]("sh").toSeq == Seq("a b", "b c"))
  }

  test("injected minhash_sig equals the streaming row-signature pipeline") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val viaOp = graft.ops.Dedup.rowMinhashSignatures(docs, "text", n = 3)
    val k = graft.ops.Dedup.minhashSeeds.length
    val opRow = viaOp.collect().head
    val opSig = (0 until k).map(i => opRow.getAs[Long](s"mh$i"))
    docs.createOrReplaceTempView("mh_docs")
    // double the backslashes: the SQL parser unescapes string literals, so
    // the SQL text must carry \\p to deliver \p to the regex engine
    val sqlRe = graft.ops.TextAnalysis.TokenRegex.replace("\\", "\\\\")
    val sqlSig = spark.sql(
      s"""SELECT minhash_sig(transform(
         |  array_distinct(word_shingles(regexp_extract_all(lower(text),
         |                '$sqlRe', 0), 3)),
         |  s -> CAST(conv(substr(md5(s), 1, 8), 16, 10) AS BIGINT)
         |         % ${graft.ops.Dedup.P})) AS sig FROM mh_docs""".stripMargin)
      .collect().head.getAs[scala.collection.Seq[Long]]("sig").toSeq
    assert(sqlSig == opSig, s"sql $sqlSig vs op $opSig")
  }

  test("functions survive newSession() (config-derived, not imperative)") {
    val fresh = spark.newSession()
    assert(fresh.sql("SELECT grade_scale(9.5) AS g").collect().head
      .getAs[Double]("g") == 4.0)
  }
}
