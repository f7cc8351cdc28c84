package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("languageId expression form equals the join form") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val a = TextAnalysis.languageId(spark, docs, "doc_id", "text")
      .as[(Long, String, Long)].collect().toSet
    val b = TextAnalysis.languageIdJoin(spark, docs, "doc_id", "text")
      .as[(Long, String, Long)].collect().toSet
    assert(a == b)
  }

  test("languageId: marker-heavy text scores its language; empty -> und") {
    val docs = Seq(
      (1L, "the then there other another"), // saturated with en bigrams
      (2L, ""),
      (3L, "zzz qqq")).toDF("doc_id", "text")
    val byId = TextAnalysis.languageId(spark, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(byId(1L)._1 == "en" && byId(1L)._2 > 0)
    assert(byId(2L) == (("und", 0L)))
    assert(byId(3L) == (("und", 0L)))
  }

  test("charBigrams drops non-letters and boundary pairs") {
    val out = Seq("Ab c!d").toDF("t")
      .select(TextAnalysis.charBigrams($"t")).as[Seq[String]].collect()(0)
    // cleaned: "ab cd" -> pairs: ab, b␣(x), ␣c(x), cd
    assert(out == Seq("ab", "cd"))
  }

  test("docStats bundles per-doc metrics") {
    val s = TextAnalysis.docStats(
      Tables.documents(spark, sfDir).limit(10), "doc_id", "text")
    val rows = s.collect()
    assert(rows.length == 10)
    assert(s.columns.toSeq ==
      Seq("id", "n_chars", "n_tokens", "n_tokens_bpe", "quality", "fingerprint"))
  }
}
