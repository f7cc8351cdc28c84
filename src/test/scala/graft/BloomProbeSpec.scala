package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Bloom-sidecar probe for the incremental exact-dedup index
  * ([[Dedup.writeExactIndexBlooms]] / [[Dedup.incrementalExactDedupBloom]]):
  * the sidecar may only PRUNE work, never change answers.
  */
class BloomProbeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)

  private def freshIndex(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    Dedup.buildExactIndex(docs, "doc_id", "text", s"$dir/idx")
    Dedup.writeExactIndexBlooms(spark, s"$dir/idx",
      expectedItemsPerLeaf = 100000L)
    s"$dir/idx"
  }

  test("bloom probe output is identical to the plain probe") {
    val idx = freshIndex()
    val base = docs.filter($"doc_id" < 6)
    val delta = base
      .select(($"doc_id" + 1000000).as("doc_id"), $"text")
      .unionByName(docs.filter($"doc_id" === 0)
        .select(lit(3000001L).as("doc_id"), upper($"text").as("text")))
      .unionByName(docs.filter($"doc_id" === 0)
        .select(lit(3000002L).as("doc_id"), upper($"text").as("text")))
      .unionByName(Seq((4000001L, null: String)).toDF("doc_id", "text"))
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select($"id", $"dup_of").as[(Long, Option[Long])]
        .collect().sortBy(_._1).toSeq
    val plain = res(Dedup.incrementalExactDedup(
      spark, idx, delta, "doc_id", "text"))
    val bloomed = res(Dedup.incrementalExactDedupBloom(
      spark, idx, delta, "doc_id", "text"))
    assert(bloomed == plain)
    // and the planted legs landed as designed
    val m = bloomed.toMap
    assert(m(1000000L).contains(0L))      // corpus dup
    assert(m(3000001L).isEmpty)           // genuinely new
    assert(m(3000002L).contains(3000001L)) // intra-batch dup
    assert(m(4000001L).isEmpty)           // null text
  }

  test("definite corpus-misses never survive the bloom") {
    val idx = freshIndex()
    // novel texts (upper-cased corpus docs): absent from the corpus,
    // so the bloom must rule every one of them out — no false
    // negatives is the correctness contract, pruning them all at this
    // scale is the efficiency claim (fpp at 6 hashes vs 100k-slot
    // blooms is ~0 for a 6-row delta)
    val novel = docs.filter($"doc_id" < 6)
      .select(md5(upper($"text").cast("binary")).as("content_hash"))
    val survivors = Dedup.bloomCandidateHashes(spark, idx, novel).count()
    assert(survivors == 0L, s"$survivors novel hashes survived the bloom")
    // while every true corpus hash survives (no false negatives)
    val corpus = docs.filter($"doc_id" < 6)
      .select(md5($"text".cast("binary")).as("content_hash"))
    val kept = Dedup.bloomCandidateHashes(spark, idx, corpus).count()
    assert(kept == corpus.distinct().count())
  }

  test("missing sidecar falls back to the plain probe") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nb").toString
    Dedup.buildExactIndex(docs, "doc_id", "text", s"$dir/idx")
    val delta = docs.filter($"doc_id" === 0)
      .select(lit(5000000L).as("doc_id"), $"text")
    val out = Dedup.incrementalExactDedupBloom(
      spark, s"$dir/idx", delta, "doc_id", "text")
      .select($"dup_of").as[Option[Long]].collect()
    assert(out.toSeq == Seq(Some(0L)))
  }
}
