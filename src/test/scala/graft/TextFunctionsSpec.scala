package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).get(0)

  test("scrubNullLiteral maps the string 'NULL' to null, passes others") {
    assert(eval1(scrubNullLiteral(lit("NULL"))) == null)
    assert(eval1(scrubNullLiteral(lit("ok"))) == "ok")
  }

  test("toStr canonicalizes null to blank and trims (Compare.py:45-48)") {
    assert(eval1(toStr(lit(null).cast("string"))) == "")
    assert(eval1(toStr(lit("  x "))) == "x")
    assert(eval1(toStr(lit(42))) == "42")
  }

  test("dateMdY formats %m-%d-%Y and coerces garbage to null (S1)") {
    assert(eval1(dateMdY(lit("2024-03-07"))) == "03-07-2024")
    assert(eval1(dateMdY(lit("not a date"))) == null)
  }

  test("percent formats f'{x*100:.0f}%' with null passthrough (S3)") {
    assert(eval1(percent(lit(0.07))) == "7%")
    assert(eval1(percent(lit(1.0))) == "100%")
    assert(eval1(percent(lit(null).cast("double"))) == null)
  }

  test("safeFnameToken replaces all nine forbidden chars (Upload.py:105)") {
    assert(eval1(safeFnameToken(lit("""a\b/c:d*e?f"g<h>i|j"""))) ==
      "a_b_c_d_e_f_g_h_i_j")
  }

  test("normHeaderSpace: NBSP/CR/LF, underscores, punctuation (S6)") {
    assert(eval1(normHeaderSpace(lit("  OB Main__ID (v2)\r\n"))) ==
      "ob main id v2")
  }

  test("normHeaderSnake: snake_case with stripped underscores (S7)") {
    assert(eval1(normHeaderSnake(lit("  OB Main-ID? "))) == "ob_main_id")
    // idempotence: norm(norm(x)) == norm(x)
    assert(eval1(normHeaderSnake(normHeaderSnake(lit("A  b!c")))) ==
      eval1(normHeaderSnake(lit("A  b!c"))))
  }

  test("tokens/tokenCount handle blank input") {
    assert(eval1(tokenCount(lit("a bb  ccc"))) == 3)
    assert(eval1(tokenCount(lit("   "))) == 0)
    assert(eval1(tokenCount(lit(""))) == 0)
  }

  test("tokenEstimate: 1 per word plus length/4 rounding") {
    // "supercalifragilistic" = 20 chars -> ceil(20/4) = 5
    assert(eval1(tokenEstimate(lit("supercalifragilistic"))) == 5L)
    assert(eval1(tokenEstimate(lit("a b"))) == 2L)
  }

  test("stopwordRatio and meanWordLen") {
    assert(eval1(stopwordRatio(lit("the cat and the hat"))) == 3.0 / 5.0)
    assert(eval1(meanWordLen(lit("ab cdef"))) == 3.0)
  }

  test("fingerprint is order-sensitive and deterministic") {
    val a = eval1(fingerprint(lit("alpha beta gamma")))
    val b = eval1(fingerprint(lit("beta alpha gamma")))
    val a2 = eval1(fingerprint(lit("alpha beta gamma")))
    assert(a == a2)
    assert(a != b)
  }

  test("shingles: 3-grams, distinct, short-doc guard") {
    assert(eval1(shingles(lit("a b c d"), 3)) ==
      Seq("a b c", "b c d"))
    assert(eval1(shingles(lit("a b"), 3)) == Seq())
    // repeated shingle deduped
    assert(eval1(shingles(lit("x y x y x y"), 2)) ==
      Seq("x y", "y x"))
  }

  test("word_shingles_from_tokens(tokens(t), n) ≡ word_shingles(t, n) " +
      "— the curateV2 single-tokenization contract") {
    import graft.plans.TextExpressions.{word_shingles, word_shingles_from_tokens}
    // representative shapes: normal doc, repeated shingles (dedup +
    // insertion order), short doc (< n tokens), whitespace noise,
    // blank and null text — the arrays must match element-for-element
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "x y x y x y x y",
      "a b",
      "  leading   and \t internal\nwhitespace  ",
      "",
      null
    ).toDF("t")
    Seq(2, 3, 8).foreach { n =>
      val rows = docs.select(
        word_shingles(col("t"), n).as("a"),
        word_shingles_from_tokens(tokens(col("t")), n).as("b")).collect()
      rows.foreach { r =>
        assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch at n=$n")
        if (!r.isNullAt(0))
          assert(r.getSeq[String](0) == r.getSeq[String](1),
            s"shingle mismatch at n=$n: ${r.getSeq[String](0)} vs " +
              s"${r.getSeq[String](1)}")
      }
    }
    // candidacy equivalence the pre-tokenized faces rely on:
    // size(tokens(t)) >= n ≡ hasMinTokens(t, n) for every edge doc
    val cand = docs.select(
      (size(tokens(col("t"))) >= 3).as("a"),
      (col("t").isNotNull && trim(col("t")) =!= "" &&
        size(split(trim(col("t")), "\\s+")) >= 3).as("b")).collect()
    cand.foreach { r =>
      val a = if (r.isNullAt(0)) false else r.getBoolean(0)
      val b = if (r.isNullAt(1)) false else r.getBoolean(1)
      assert(a == b, s"candidacy mismatch: $r")
    }
  }

  test("nfc_normalize composes; identity on composed and null input") {
    import graft.plans.TextExpressions.nfc_normalize
    // decomposed e + U+0301 composes to single-codepoint \u00e9
    assert(eval1(nfc_normalize(lit("cafe\u0301"))) == "caf\u00e9")
    // already-NFC input unchanged (the fast path)
    assert(eval1(nfc_normalize(lit("caf\u00e9 plain ascii"))) ==
      "caf\u00e9 plain ascii")
    assert(eval1(nfc_normalize(lit(null).cast("string"))) == null)
  }

  test("strip_accents drops combining marks, keeps non-mark letters") {
    import graft.plans.TextExpressions.strip_accents
    // composed AND decomposed inputs both strip to plain ascii
    assert(eval1(strip_accents(
      lit("caf\u00e9 na\u00efve \u00c5ngstr\u00f6m"))) ==
      "cafe naive Angstrom")
    assert(eval1(strip_accents(lit("cafe\u0301"))) == "cafe")
    // \u00f8 is a letter, not a base+mark composition: untouched
    assert(eval1(strip_accents(lit("s\u00f8ster"))) == "s\u00f8ster")
    // pure-ascii fast path is identity
    assert(eval1(strip_accents(lit("plain text"))) == "plain text")
    assert(eval1(strip_accents(lit(null).cast("string"))) == null)
  }
}
