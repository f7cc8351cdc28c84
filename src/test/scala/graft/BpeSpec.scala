package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

/** Learned BPE subword tokenization ([[CorpusOps.learnBpe]] + native
  * [[graft.plans.BpeEncode]]), pinned on the hand-derivable corpus
  * from Sennrich et al. 2016's exposition (low/lower/newest/widest).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def toy = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
    .zipWithIndex.map { case (w, i) => (i.toLong, w) }
    .toDF("doc_id", "text")

  test("learned merges match the hand-derived sequence") {
    val model = CorpusOps.learnBpe(toy, "text", numMerges = 6)
    // pair counts worked by hand: es/st/t</w> tie at 9 -> lexicographic
    // smallest (e,s); then (es,t); (est,</w>); l-o/o-w tie at 7 ->
    // (l,o); (lo,w); then the 6-way tie resolves to (e,w)
    assert(model.merges == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w"), ("e", "w")),
      model.merges.toString)
    // deterministic: a second fit is identical
    assert(CorpusOps.learnBpe(toy, "text", numMerges = 6) == model)
  }

  test("encoding applies merges by rank; round-trip holds") {
    val model = CorpusOps.learnBpe(toy, "text", numMerges = 6)
    val enc = Seq((0L, "lowest low newest")).toDF("doc_id", "text")
      .select(CorpusOps.bpeTokens($"text", model).as("t"))
      .as[Seq[String]].collect().head
    // "lowest" = low + est</w> (merges 0..4 apply), "low" = low + bare
    // </w> ((low,</w>) was never learned), "newest" = n + ew (merge 5)
    // + est</w>
    assert(enc == Seq("low", "est</w>", "low", "</w>", "n", "ew", "est</w>"),
      enc.toString)
    // the round-trip law, independent of the exact segmentation
    assert(enc.mkString("").replace("</w>", "") == "lowestlownewest")
  }

  test("vocab ids are deterministic; token ids decode; OOV maps to unk") {
    val model = CorpusOps.learnBpe(toy, "text", numMerges = 6)
    val v1 = CorpusOps.bpeVocab(toy, "text", model)
      .as[(String, Long)].collect().toMap
    val v2 = CorpusOps.bpeVocab(toy, "text", model)
      .as[(String, Long)].collect().toMap
    assert(v1 == v2 && v1.nonEmpty)
    assert(v1.values.toSeq.sorted == (0L until v1.size).toSeq)
    val rev = v1.map(_.swap)
    // in-vocab text decodes exactly; the OOV word "zzz" becomes unk ids
    val rows = Seq((0L, "newest low"), (1L, "zzz"))
      .toDF("doc_id", "text")
      .select($"doc_id",
        CorpusOps.bpeTokens($"text", model).as("t"),
        CorpusOps.tokenIds($"text", model, v1).as("ids"))
      .as[(Long, Seq[String], Seq[Long])].collect().sortBy(_._1)
    val (_, toks0, ids0) = rows(0)
    assert(ids0.map(rev) == toks0)
    val (_, toks1, ids1) = rows(1)
    assert(ids1.length == toks1.length)
    assert(ids1.zip(toks1).forall { case (i, t) =>
      if (v1.contains(t)) i == v1(t) else i == -1L })
    assert(ids1.contains(-1L), s"no unk in $ids1 for $toks1")
  }

  test("more merges never increase the token count; corpus round-trips") {
    val docs = Tables.documents(spark, sfDir)
      .filter($"text".isNotNull && trim($"text") =!= "")
    val m0 = CorpusOps.BpeModel(Seq.empty)
    val m20 = CorpusOps.learnBpe(docs, "text", numMerges = 20)
    assert(m20.merges.length == 20)
    val counted = docs.select(
        size(CorpusOps.bpeTokens($"text", m0)).as("n0"),
        size(CorpusOps.bpeTokens($"text", m20)).as("n20"),
        (call_function("replace",
          concat_ws("", CorpusOps.bpeTokens($"text", m20)),
          lit("</w>"), lit("")) ===
          concat_ws("", graft.functions.TextFunctions.tokens($"text")))
          .as("rt"))
      .agg(sum($"n0").as("n0"), sum($"n20").as("n20"),
        min($"rt").as("all_rt"))
      .as[(Long, Long, Boolean)].collect().head
    assert(counted._2 < counted._1,
      s"20 merges did not compress: ${counted._2} vs ${counted._1}")
    assert(counted._3, "round-trip failed on some doc")
  }
}
