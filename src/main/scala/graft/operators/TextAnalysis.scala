package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis operators for corpus curation (engine scope, SURVEY.md
  * §7.1 Tier B): language ID, quality scoring, token counting, document
  * fingerprinting. All are per-row codegen'd expressions or
  * broadcast-joined profile lookups — linear scans at 100 TB, no
  * all-pairs work.
  */
object TextAnalysis {

  /** Tiny public character-bigram profiles (top bigrams per language from
    * published frequency tables). Deliberately small: language ID here is
    * a deterministic, testable heuristic, not a trained model. */
  val bigramProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"),
    "de" -> Seq("er", "en", "ch", "de", "ei", "te", "in", "nd", "ie", "ge"),
    "es" -> Seq("de", "es", "en", "el", "la", "os", "ar", "ue", "ra", "as"),
    "fr" -> Seq("es", "le", "de", "en", "re", "nt", "on", "er", "te", "et"),
    "zh" -> Seq("zh", "sh", "ng", "ia", "ua", "uo", "ji", "xi", "qi", "an"))

  /** Language-ID by bigram-profile vote: per document, score each profile
    * by how many of its marker bigrams occur in the text; highest score
    * (ties broken alphabetically) wins; score 0 -> "und".
    *
    * Shuffle-free: profiles are literal arrays, each score is
    * `size(array_intersect(doc_bigrams, profile))`, arg-max is a when
    * chain in alphabetical order — one narrow scan per corpus.
    * [[languageIdJoin]] is the equivalent explode + broadcast-join +
    * window formulation (the general shape for LARGE profile tables),
    * kept as the semantic spec.
    */
  def languageId(spark: SparkSession, docs: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    val bs = array_distinct(charBigrams(col(textCol)))
    val scores = bigramProfiles.toSeq.sortBy(_._1).map { case (lang, prof) =>
      lang -> size(array_intersect(bs, typedLit(prof)))
    }
    val g = greatest(scores.map(_._2): _*)
    val pred = scores
      .foldLeft(when(g === 0, lit("und"))) { case (acc, (lang, sc)) =>
        acc.when(sc === g, lit(lang))
      }
      .otherwise(lit("und"))
    docs.select(col(idCol).as("id"), pred.as("pred_lang"),
      g.cast("long").as("score"))
  }

  /** Explode + broadcast profile join + window top-1 (for profile tables
    * too large to inline as literals). */
  def languageIdJoin(spark: SparkSession, docs: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    import spark.implicits._
    val profile = broadcast(
      bigramProfiles.toSeq
        .flatMap { case (lang, bs) => bs.map(b => (lang, b)) }
        .toDF("cand_lang", "bigram"))

    val docBigrams = docs
      .select(col(idCol).as("id"),
        array_distinct(charBigrams(col(textCol))).as("bs"))
      .select(col("id"), explode(col("bs")).as("bigram"))

    val scored = docBigrams.join(profile, Seq("bigram"))
      .groupBy(col("id"), col("cand_lang"))
      .agg(count(lit(1)).as("score"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("cand_lang"))
    val top = scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("id"), col("cand_lang").as("pred_lang"), col("score"))

    docs.select(col(idCol).as("id"))
      .join(top, Seq("id"), "left_outer")
      .select(col("id"),
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
        coalesce(col("score"), lit(0L)).as("score"))
  }

  /** Character bigrams of the lowercased text; non-letters dropped,
    * bigrams spanning a word boundary excluded. Native expression —
    * the declarative form below re-runs its regex clean once per
    * character position (nested-lambda inlining; see SCALE.md). */
  def charBigrams(c: Column): Column =
    graft.plans.TextExpressions.char_bigrams(c)

  /** Shannon entropy of the text's characters in bits/char — the
    * compressibility proxy (gibberish ≈ log2(alphabet), degenerate
    * repetition ≈ 0, natural language in a stable band). Native
    * codegen'd expression; one sorted pass per row. */
  def charEntropy(c: Column): Column =
    graft.plans.TextExpressions.char_entropy(c)

  /** Built-ins-only formulation, kept as the semantic spec. */
  private[graft] def charBigramsDeclarative(c: Column): Column = {
    val s = regexp_replace(lower(c), "[^a-z ]", "")
    when(length(s) >= 2,
      filter(
        transform(sequence(lit(1), length(s) - 1),
          i => s.substr(i, lit(2))),
        b => length(b) === 2 && !b.contains(" ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-document stats bundle: char count, whitespace token count,
    * BPE-ish token estimate, quality score, rolling-hash fingerprint. */
  def docStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("id"),
      length(col(textCol)).as("n_chars"),
      tokenCount(col(textCol)).as("n_tokens"),
      tokenEstimate(col(textCol)).as("n_tokens_bpe"),
      qualityScore(col(textCol)).as("quality"),
      fingerprint(col(textCol)).as("fingerprint"))

  /** HTML → text extraction for web-crawl ingestion (the WET-style
    * step every web corpus runs before any quality/dedup work): drop
    * `<script>`/`<style>` blocks wholesale (their CONTENT is code, not
    * prose — tag-stripping alone would leak it into the text), strip
    * the remaining tags, decode the six entities that actually occur
    * in crawl text at volume, and collapse the whitespace the removed
    * markup leaves behind.
    *
    * Pure regexp/replace built-ins — one codegen'd scan, zero shuffle,
    * embarrassingly parallel at 100 TB. The patterns use RE2-safe
    * syntax (inline `(?s)`, non-greedy `.*?`, no backreferences) so
    * the DuckDB oracle runs them VERBATIM. `&amp;` decodes last, so
    * double-escaped entities (`&amp;lt;`) resolve one level per pass
    * exactly like a single-pass decoder — same order on both sides. */
  def htmlToText(c: Column): Column = {
    val noBlocks = regexp_replace(c,
      "(?s)<script[^>]*>.*?</script>|(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (ent, ch)) =>
        replace(acc, lit(ent), lit(ch))
      }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** PII mask patterns, applied in THIS order — masking is sequential,
    * so each category's count sees the text AFTER earlier categories
    * masked (a credit card can never double-count as a phone number).
    * Deliberately conservative, precision-over-recall shapes (the
    * published pretraining scrubs — e.g. the BigScience/ROOTS and
    * Dolma PII passes — mask exactly these machine-recognizable
    * classes and leave ambiguous digit runs alone: a curation filter
    * that eats "2023-10-05" as a phone number corrupts more text than
    * it protects); digit-run patterns carry `\b` guards so a version
    * string or a longer number can't be half-eaten. RE2-safe syntax
    * only ([0-9] classes, bounded quantifiers, alternation, ASCII
    * `\b` — no backreferences or lookarounds), so a DuckDB oracle runs
    * the patterns VERBATIM. */
  private[graft] val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "<EMAIL>"),
    ("card", "\\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\\b",
      "<CARD>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("phone", "\\([0-9]{3}\\) ?[0-9]{3}[-.][0-9]{4}\\b" +
      "|\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b", "<PHONE>"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
      "<IP>"))

  /** PII masking — the scrub pass a released pretraining corpus runs
    * (emails, credit-card and SSN shapes, phone numbers, IPv4
    * addresses replaced by typed placeholder tokens), with per-
    * category counts for the corpus-level PII audit a data card
    * reports. Returns one row per input doc:
    * (`idCol`, `clean_text`, `n_email`, `n_card`, `n_ssn`, `n_phone`,
    * `n_ip`, `n_pii`). PII-free docs pass byte-identical; null text
    * passes through as null with zero counts (visible, never dropped).
    *
    * Scale shape: a pure per-row regexp projection — zero shuffle,
    * whole-stage codegen'd, embarrassingly parallel at 100 TB (the
    * [[htmlToText]] class). Counts are evaluated on the pre-mask text
    * of their own stage, so the five patterns cost a bounded number of
    * regex passes per row regardless of document size. */
  def maskPii(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val (cleaned, counts) = PiiPatterns
      .foldLeft((col(textCol), Seq.empty[(String, Column)])) {
        case ((t, cs), (cat, pat, tok)) =>
          (regexp_replace(t, pat, tok),
            cs :+ (s"n_$cat" ->
              coalesce(regexp_count(t, lit(pat)), lit(0)).cast("long")))
      }
    val total = counts.map(_._2).reduce(_ + _)
    docs.select(Seq(col(idCol), cleaned.as("clean_text")) ++
      counts.map { case (nm, c) => c.as(nm) } :+
      total.as("n_pii"): _*)
  }

  // the Gopher paper's stop-word presence list (Rae et al. 2021, §A1.1:
  // a document must contain >= 2 of these to pass the rule)
  private[graft] val GopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style quality gates (Rae et al. 2021 §A1.1, the rule set
    * most published curation pipelines start from): per-document signal
    * columns plus one boolean per rule and the conjunction `passes`.
    * Signals: whitespace token count, mean word length,
    * symbol-to-token ratio (`#` and `...`), fraction of lines starting
    * with a bullet, fraction ending with an ellipsis, fraction of
    * tokens containing a letter, and stop-word hits.
    *
    * Gates evaluate on the RAW ratios (the rounded columns are for
    * reading); thresholds are the paper's, except the token floor
    * which is a parameter (the paper's 50 assumes web pages).
    *
    * Per-row array/string expressions only — zero shuffle, linear
    * scan at 100 TB, whole-stage codegen'd. Null/whitespace-only
    * documents are excluded (they fail every curation gate anyway, and
    * excluding them keeps the ratio denominators nonzero). */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
                  minTokens: Int = 50): DataFrame =
    gopherRulesTokens(docs, idCol, textCol, tokens(col(textCol)), minTokens)

  /** [[gopherRules]] with a caller-supplied token-array column — the
    * single-tokenization face (curateV2 computes `tokens(text)` once
    * into its materialized stage relation and feeds all three gate
    * stages from it instead of re-splitting every document per stage).
    * Contract: `toks` must equal `tokens(col(textCol))` — the public
    * face pins the equality by delegation. */
  private[graft] def gopherRulesTokens(docs: DataFrame, idCol: String,
                                       textCol: String, toks: Column,
                                       minTokens: Int): DataFrame = {
    val n = size(toks)
    val nD = n.cast("double")
    val lines = split(col(textCol), "\n")
    val nLines = size(lines)
    val meanWlen = aggregate(toks, lit(0L), (a, t) => a + length(t))
      .cast("double") / nD
    val symbolRatio =
      (regexp_count(col(textCol), lit("#")) +
        regexp_count(col(textCol), lit("\\.\\.\\."))).cast("double") / nD
    val bulletRatio = size(filter(lines,
      l => trim(l).rlike("^[-*•]"))).cast("double") / nLines.cast("double")
    val ellipsisRatio = size(filter(lines,
      l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast("double") /
      nLines.cast("double")
    val alphaRatio = size(filter(toks, t => t.rlike("[A-Za-z]")))
      .cast("double") / nD
    val stopHits = size(filter(toks,
      t => lower(t).isin(GopherStops: _*))).cast("long")
    val gates = Seq(
      "ok_tokens" -> (n >= minTokens && n <= 100000),
      "ok_wlen" -> (meanWlen >= 3.0 && meanWlen <= 10.0),
      "ok_symbols" -> (symbolRatio < 0.1),
      "ok_bullets" -> (bulletRatio < 0.9),
      "ok_ellipsis" -> (ellipsisRatio < 0.3),
      "ok_alpha" -> (alphaRatio > 0.8),
      "ok_stops" -> (stopHits >= 2L))
    docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(Seq(
        col(idCol).as("id"),
        n.cast("long").as("n_tokens"),
        round(meanWlen, 4).as("mean_wlen"),
        round(symbolRatio, 4).as("symbol_ratio"),
        round(bulletRatio, 4).as("bullet_ratio"),
        round(ellipsisRatio, 4).as("ellipsis_ratio"),
        round(alphaRatio, 4).as("alpha_ratio"),
        stopHits.as("stop_hits")) ++
        gates.map { case (nm, g) => g.as(nm) } :+
        gates.map(_._2).reduce(_ && _).as("passes"): _*)
  }

  /** Repetition-ratio quality signals (the Gopher/C4-style filters):
    * duplicate-token fraction and the most-frequent token's share of
    * the document. Per-row array expressions, zero shuffle. The
    * top-share term sorts the token array once and takes the longest
    * equal-adjacent run in a single fold — O(tokens log tokens) per
    * document (r6 shipped `array_max(transform(distinct, t =>
    * size(filter(toks, = t))))`, which is O(distinct × tokens): a
    * 100k-token document with high entropy did 10^9+ comparisons in
    * one row — quadratic blowup on exactly the long documents a
    * quality filter exists to catch). Empty/whitespace docs report 0
    * ratios. */
  def repetitionStats(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val n = size(toks)
    val uniq = size(array_distinct(toks))
    // longest run of equal adjacent tokens in the sorted array == the
    // most-frequent token's count; one pass, state (prev, run, best)
    val topCnt = aggregate(
      array_sort(toks),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, t) => {
        val run = when(t === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(t.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    docs.select(
      col(idCol).as("id"),
      n.cast("long").as("n_tokens"),
      uniq.cast("long").as("uniq_tokens"),
      when(n > 0, round(lit(1.0d) - uniq.cast("double") / n.cast("double"), 4))
        .otherwise(lit(0.0d)).as("dup_ratio"),
      when(n > 0, round(topCnt.cast("double") / n.cast("double"), 4))
        .otherwise(lit(0.0d)).as("top_tok_share"))
  }

  /** Sentence segmentation: one row per sentence as
    * `(id, sent_id, sentence)` — the unit sentence-level dedup,
    * seq2seq pair extraction, and per-sentence quality filters work
    * on. A sentence is a maximal run of non-terminator characters
    * plus its trailing `.`/`!`/`?` run (`[^.!?]+[.!?]*` — an RE2-safe
    * pattern, so a SQL oracle can run it verbatim; no lookbehind,
    * which RE2 lacks). `sent_id` numbers matches 1-based BEFORE
    * empty-trim filtering so ids are stable under whitespace quirks.
    * Shuffle-free: one regex pass + posexplode per document. */
  def sentences(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(call_function("regexp_extract_all",
          col(textCol), lit("[^.!?]+[.!?]*"), lit(0)))
          .as(Seq("__i", "__s")))
      .select(col(idCol), (col("__i") + 1).cast("long").as("sent_id"),
        trim(col("__s")).as("sentence"))
      .filter(length(col("sentence")) > 0)

  /** The writing systems [[scriptProfile]] distinguishes, in the
    * PRIORITY order ties resolve to (fixed and documented, so the
    * label is deterministic). Java regex names the script property
    * `\p{script=X}`; RE2 (the DuckDB oracle side) spells the same
    * Unicode property `\p{X}`. */
  val scripts: Seq[String] =
    Seq("Latin", "Cyrillic", "Greek", "Arabic", "Han", "Hangul")

  /** Unicode-script profile per document — the writing-system check
    * that runs BEFORE language-ID in a web pipeline (char-bigram
    * language models assume you already know the script; mixed-script
    * text is its own signal, usually spam or markup soup). Counts
    * LETTERS per script over the [[scripts]] menu via per-script
    * `regexp_count` (codegen'd, one pass per script over the value —
    * no explode, no shuffle beyond none at all: this is a pure
    * projection), plus `n_letters` = all Unicode letters. The dominant
    * script is the menu maximum with ties to [[scripts]] order;
    * `script_ratio` = dominant / n_letters (NULL when the document has
    * no letters — "no script" stays distinguishable from "weakly
    * Latin"). Letters outside the menu count toward `n_letters` only,
    * lowering every menu ratio honestly. */
  def scriptProfile(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val t = col(textCol)
    val counts = scripts.map { s =>
      regexp_count(t, lit(s"\\p{script=$s}")).cast("long")
        .as(s"n_${s.toLowerCase}")
    }
    val nLetters = regexp_count(t, lit("\\p{L}")).cast("long")
      .as("n_letters")
    val base = docs.filter(t.isNotNull)
      .select(col(idCol) +: counts :+ nLetters: _*)
    val maxc = greatest(scripts.map(s => col(s"n_${s.toLowerCase}")): _*)
    val dominant = scripts.foldRight(lit(null).cast("string")) {
      case (s, acc) =>
        when(maxc > 0 && col(s"n_${s.toLowerCase}") === maxc, s)
          .otherwise(acc)
    }
    base.withColumn("dominant_script", dominant)
      .withColumn("script_ratio",
        when(col("n_letters") > 0 && col("dominant_script").isNotNull,
          round(maxc.cast("double") / col("n_letters").cast("double"), 6)))
  }
}
