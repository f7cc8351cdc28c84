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

  test("maskPii: boundary guards leave versions and long numbers alone") {
    val docs = Seq(
      (1L, "mail a.b+c@ex-ample.org or x@y.io, call 555.123.4567, " +
        "host 10.0.0.255 ok"),
      (2L, "no pii here, just v1.2 and 1234-5678 and 10.0.0.1234"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.maskPii(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7)))).toMap
    // dot-separated phone form masks; both emails mask
    assert(out(1L) == (("mail <EMAIL> or <EMAIL>, call <PHONE>, " +
      "host <IP> ok", 2L, 0L, 0L, 1L, 1L, 4L)))
    // \b guards: a version string, a bare digit pair, and a too-long
    // final IP octet are NOT PII
    assert(out(2L) == (("no pii here, just v1.2 and 1234-5678 and " +
      "10.0.0.1234", 0L, 0L, 0L, 0L, 0L, 0L)))
    assert(out(3L) == (("", 0L, 0L, 0L, 0L, 0L, 0L)))
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

  test("htmlToText: blocks dropped wholesale, tags stripped, entities decoded") {
    val html = "<html><head><script>var hidden = 1;</script>" +
      "<style>p{color:red}</style></head><body>" +
      "<h1>Title</h1><p>a &amp; b &lt;c&gt; &nbsp;&#39;d&#39; &quot;e&quot;</p>" +
      "</body></html>"
    val out = Seq((1L, html), (2L, "plain  text   here")).toDF("id", "text")
      .select($"id", TextAnalysis.htmlToText($"text").as("t"))
      .as[(Long, String)].collect().toMap
    // script/style CONTENT is gone (not just the tags), entities decoded,
    // whitespace collapsed to single spaces
    assert(out(1L) == "Title a & b <c> 'd' \"e\"")
    assert(!out(1L).contains("hidden") && !out(1L).contains("color"))
    // non-HTML text passes through modulo whitespace collapsing
    assert(out(2L) == "plain text here")
  }

  test("htmlToText: multiline script bodies and double-escaped entities") {
    val html = "pre <script type=\"a\">\nline1\nline2\n</script> mid " +
      "&amp;lt; post"
    val out = Seq((1L, html)).toDF("id", "text")
      .select(TextAnalysis.htmlToText($"text")).as[String].collect()(0)
    // (?s) lets the block pattern span newlines; &amp;lt; decodes ONE
    // level per pass (&lt; after &amp;->&), like a single-pass decoder
    assert(out == "pre mid &lt; post")
  }

  test("maskPii: each category masks and counts; clean text untouched") {
    val docs = Seq(
      (1L, "mail alice.b+tag@sub.example.org now"),
      (2L, "pay 4111-1111-1111-1111 or 4111 1111 1111 1111 today"),
      (3L, "ssn 123-45-6789 phone 555-867-5309 alt (800) 555-1234"),
      (4L, "from 10.0.0.1 to 192.168.255.254"),
      (5L, "no pii here at all"),
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.maskPii(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7)))).toMap
    assert(out(1L) == (("mail <EMAIL> now", 1L, 0L, 0L, 0L, 0L, 1L)))
    // both separator forms of a card mask; the card is NEVER
    // double-counted as a phone number (sequential masking)
    assert(out(2L) == (("pay <CARD> or <CARD> today",
      0L, 2L, 0L, 0L, 0L, 2L)))
    assert(out(3L) == (("ssn <SSN> phone <PHONE> alt <PHONE>",
      0L, 0L, 1L, 2L, 0L, 3L)))
    assert(out(4L) == (("from <IP> to <IP>", 0L, 0L, 0L, 0L, 2L, 2L)))
    // PII-free text passes byte-identical; null passes through as null
    assert(out(5L) == (("no pii here at all", 0L, 0L, 0L, 0L, 0L, 0L)))
    assert(out(6L)._1 == null &&
      out(6L) == ((null, 0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("maskPii is shuffle-free (no Exchange in the plan)") {
    val docs = Seq((1L, "a@b.co")).toDF("doc_id", "text")
    val plan = TextAnalysis.maskPii(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(400))
  }

  test("gopherRules: clean prose passes, each rule fails its planted doc") {
    val good = ("the quick brown fox jumps over and over to be sure of " +
      "that fine day with plenty more words to have beyond the floor " +
      "and a tail that wags quite happily every single morning") // 36 toks
    val docs = Seq(
      (1L, good),
      (2L, "too short to pass the bar"), // fails ok_tokens
      (3L, Seq.fill(18)("# the to ##").mkString(" ")), // symbol-heavy
      (4L, (1 to 35).map(i => s"- item $i the to").mkString("\n")), // bullets
      (5L, good.split(" ").map(_ => "zz...").mkString(" ")), // no stops + symbols
      (6L, "   ") // whitespace-only: excluded entirely
    ).toDF("id", "text")
    val out = TextAnalysis.gopherRules(docs, "id", "text", minTokens = 30)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 5) // blank doc excluded
    def b(id: Long, col: String) =
      out(id).getBoolean(out(id).fieldIndex(col))
    assert(b(1L, "passes"), out(1L).toString)
    assert(!b(2L, "ok_tokens") && !b(2L, "passes"))
    assert(!b(3L, "ok_symbols") && !b(3L, "passes"))
    assert(!b(4L, "ok_bullets") && !b(4L, "passes"))
    assert(!b(5L, "ok_stops") && !b(5L, "passes"))
  }

  test("gopherRules: line-shape ratios count trimmed bullet/ellipsis lines") {
    val text = "the be to of and that have with more words here now\n" +
      "  - indented bullet\n* star bullet\nplain line\nends this way...\n…"
    val out = TextAnalysis.gopherRules(Seq((1L, text)).toDF("id", "text"),
      "id", "text", minTokens = 1).collect()(0)
    def d(col: String) = out.getDouble(out.fieldIndex(col))
    assert(d("bullet_ratio") == 0.3333) // 2 of 6 lines
    assert(d("ellipsis_ratio") == 0.3333) // "..." line and the bare "…" line
    assert(out.getLong(out.fieldIndex("stop_hits")) == 8L)
  }

  test("gopherRules is shuffle-free (no Exchange in the plan)") {
    val plan = TextAnalysis.gopherRules(
      Tables.documents(spark, sfDir), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
  }

  test("charEntropy: hand values, empty/null, codegen survives projection") {
    val rows = Seq((1L, "aabb"), (2L, "aaaa"), (3L, "abcd"), (4L, ""),
      (5L, null.asInstanceOf[String])).toDF("id", "t")
    val out = rows.select($"id", TextAnalysis.charEntropy($"t").as("h"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).contains(1.0d)) // two symbols, equal mass
    assert(out(2L).contains(0.0d)) // degenerate repetition
    assert(out(3L).contains(2.0d)) // four equal symbols
    assert(out(4L).contains(0.0d)) // empty -> 0, not null
    assert(out(5L).isEmpty) // null in, null out
    // stays inside whole-stage codegen (no CodegenFallback) — asserted
    // over the parquet scan (a local relation constant-folds away)
    val plan = Tables.documents(spark, sfDir)
      .select(TextAnalysis.charEntropy($"text"))
      .queryExecution.executedPlan.toString
    // the star prefix marks the projection as INSIDE WholeStageCodegen;
    // a CodegenFallback expression would strip it
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[char_entropy.*"),
      plan.take(400))
    // SQL registration
    graft.plans.TextExpressions.registerAll(spark)
    rows.createOrReplaceTempView("ce_rows")
    val sq = spark.sql("SELECT char_entropy(t) FROM ce_rows WHERE id = 1")
      .collect().head.getDouble(0)
    assert(sq == 1.0d)
  }

  test("scriptProfile: counts, dominance, tie priority, no-letter NULL") {
    val docs = Seq(
      (1L, "hello world"), // pure Latin: 10 letters
      (2L, "ok привет привет"), // Cyrillic 12 > Latin 2
      (3L, "中文字 plus latin here"), // Latin 13 > Han 3
      (4L, "123 !?"), // no letters at all
      (5L, "ab пв") // tie Latin 2 = Cyrillic 2 -> Latin (priority)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scriptProfile(docs, "doc_id", "text")
      .collect().map { r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(5),
          r.getLong(7), Option(r.getString(8)),
          Option(r.get(9)).map(_.asInstanceOf[Double]))
      }.toMap
    assert(out(1L) == ((10L, 0L, 0L, 10L, Some("Latin"), Some(1.0))))
    assert(out(2L)._2 == 12L && out(2L)._5.contains("Cyrillic"))
    assert(out(2L)._6.contains(math.rint(12.0 / 14.0 * 1e6) / 1e6))
    assert(out(3L)._3 == 3L && out(3L)._5.contains("Latin"))
    assert(out(4L) == ((0L, 0L, 0L, 0L, None, None)))
    assert(out(5L)._5.contains("Latin")) // menu-order tie-break
    // pure projection: no shuffle
    val plan = TextAnalysis.scriptProfile(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
  }
}
