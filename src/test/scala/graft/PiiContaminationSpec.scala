package graft

import org.apache.spark.sql.functions._

/** x8 (PII redaction) and x10 (benchmark decontamination) behavior on
  * fixtures that actually contain PII / planted contamination — the synthetic
  * corpus is largely clean, so the driver oracle certifies the formulas while
  * these tests certify the behavior. */
class PiiContaminationSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.{Dedup, TextAnalysis}

  test("redaction replaces URLs, emails, phones with typed placeholders") {
    val docs = Seq(
      (1L, "contact me at jane.doe+spam@example.co.uk or call +1 (555) 123-4567 now"),
      (2L, "docs at https://spark.apache.org/docs/latest?q=1 and mail to a@b.io"),
      (3L, "no pii here at all")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(docs, "text")
      .orderBy("doc_id").as[(Long, Int, Int, Int, String)].collect()
    assert(out(0) == ((1L, 0, 1, 1, "contact me at <EMAIL> or call <PHONE> now")), s"${out(0)}")
    assert(out(1)._2 == 1 && out(1)._3 == 1, s"${out(1)}")
    assert(out(1)._5 == "docs at <URL> and mail to <EMAIL>", s"${out(1)}")
    assert(out(2) == ((3L, 0, 0, 0, "no pii here at all")))
  }

  test("email inside a URL is redacted once, as a URL") {
    val docs = Seq((1L, "see https://x.test/u?mail=a.b@c.de for details")).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(docs, "text").select("n_urls", "n_emails", "clean_text")
      .as[(Int, Int, String)].head()
    assert(r == ((1, 0, "see <URL> for details")), s"$r")
  }

  test("contamination score finds planted benchmark overlap") {
    // doc 50 is "benchmark" (50 % 50 == 0); doc 1 copies half its text,
    // doc 2 is clean
    val docs = Seq(
      (50L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha beta gamma delta unrelated words following here now ok"),
      (2L, "completely disjoint vocabulary in this document text body")
    ).toDF("doc_id", "text")
    val out = Dedup.contaminationScore(docs, col("doc_id") % 50 === 0, "text")
      .orderBy("doc_id").collect()
    assert(out.length == 2) // benchmark doc excluded from targets
    val d1 = out(0)
    assert(d1.getAs[Long]("n_hit") == 2, s"$d1") // shingles "alpha beta gamma", "beta gamma delta"
    assert(d1.getAs[Double]("contamination") > 0.2 && d1.getAs[Double]("contamination") < 0.3)
    assert(out(1).getAs[Long]("n_hit") == 0)
    assert(out(1).getAs[Double]("contamination") == 0.0)
  }
}
