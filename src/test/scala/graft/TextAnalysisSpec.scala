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

  test("piiScrub redacts emails/phones/IPs with counts; clean text intact") {
    val docs = Seq(
      (1L, "mail a.b+c@ex-ample.org or x@y.io, call 555-123-4567, " +
        "host 10.0.0.255 ok"),
      (2L, "no pii here, just v1.2 and 1234-5678"),
      (3L, "")).toDF("id", "text")
    val out = TextAnalysis.piiScrub(docs, "id", "text")
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 ==
      "mail <EMAIL> or <EMAIL>, call <PHONE>, host <IP> ok")
    assert((out(1L)._3, out(1L)._4, out(1L)._5) == ((2L, 1L, 1L)))
    assert(out(2L)._2 == "no pii here, just v1.2 and 1234-5678")
    assert((out(2L)._3, out(2L)._4, out(2L)._5) == ((0L, 0L, 0L)))
    assert((out(3L)._3, out(3L)._4, out(3L)._5) == ((0L, 0L, 0L)))
  }

  test("repetitionStats: dup fraction and top-token share") {
    val docs = Seq(
      (1L, "spam spam spam eggs"), // 4 tokens, 2 uniq, top 3/4
      (2L, "all words differ here"),
      (3L, "   ")).toDF("id", "text")
    val out = TextAnalysis.repetitionStats(docs, "id", "text")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 4L, 2L, 0.5, 0.75)))
    assert(out(2L) == ((2L, 4L, 4L, 0.0, 0.25)))
    assert(out(3L) == ((3L, 0L, 0L, 0.0, 0.0)))
  }

  test("repetitionStats: 100k-token high-entropy doc completes in bounded time") {
    // 50k copies of one token + 50k distinct tokens: the r6
    // O(distinct x tokens) shape did ~5*10^9 comparisons here; the
    // sorted-run fold is O(n log n) and must finish promptly
    val text = (Seq.fill(50000)("spam") ++
      (0 until 50000).map(i => s"t$i")).mkString(" ")
    val docs = Seq((1L, text)).toDF("id", "text")
    val t0 = System.nanoTime()
    val out = TextAnalysis.repetitionStats(docs, "id", "text")
      .as[(Long, Long, Long, Double, Double)].collect()(0)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out == ((1L, 100000L, 50001L, 0.5, 0.5)))
    assert(secs < 30.0, f"repetitionStats took $secs%.1f s on a 100k-token doc")
  }
}
