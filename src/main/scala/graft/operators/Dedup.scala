package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{shingles, tokens}

/** Deduplication operators for large-scale corpus curation — engine-scope
  * additions beyond the reference surface (SURVEY.md §7.1 Tier B), built
  * from public dedup recipes (MinHash/LSH per Broder 1997; SimHash per
  * Charikar 2002, as used by public web-corpus pipelines).
  *
  * Scale notes: every variant is a pure shuffle-on-key dataflow — no
  * driver materialization, no cartesian products. Candidate generation
  * for near-dup goes through banded LSH buckets so the self-join touches
  * only same-bucket pairs; skewed buckets (e.g. boilerplate shingles) are
  * capped. At 100 TB: shingle/minhash maps are per-row codegen'd
  * expressions; the only shuffles are the band-bucket join and the final
  * pair aggregation, both on well-distributed hash keys.
  */
object Dedup {

  /** Exact dedup by content hash: one representative row (min id) per
    * distinct value of `textCol`, with the duplicate count. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** MinHash signature of a text column: `numHashes` permutation minima
    * over word `shingleN`-gram shingles, using the standard
    * `(a_i * h + b_i) mod p` universal-hash family seeded deterministically.
    * Empty shingle sets get null signatures (filtered by callers).
    */
  def minhashSignature(textCol: Column, numHashes: Int, shingleN: Int): Column = {
    val prime = 2147483647L // 2^31-1, Mersenne
    val sh = shingles(textCol, shingleN)
    val base = transform(sh, s => pmod(crc32(s.cast("binary")), lit(prime)))
    val sig = sequence(lit(0), lit(numHashes - 1)).cast("array<int>")
    when(size(sh) > 0,
      transform(sig, i => {
        val a = pmod(hash(i, lit("a")).cast("long"), lit(prime - 1)) + 1
        val b = pmod(hash(i, lit("b")).cast("long"), lit(prime))
        array_min(transform(base, h => pmod(a * h + b, lit(prime))))
      }))
  }

  /** MinHash+LSH near-duplicate candidate pairs: band the signature,
    * bucket-join on (band, band-hash), emit distinct (id_a < id_b) pairs
    * with the fraction of matching signature positions (estimated
    * Jaccard). `maxBucketSize` caps pathological buckets (boilerplate). */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 32, bands: Int = 8, shingleN: Int = 3,
                   maxBucketSize: Int = 64): DataFrame = {
    val rows = numHashes / bands
    val sigd = df
      .select(col(idCol).as("id"),
        minhashSignature(col(textCol), numHashes, shingleN).as("sig"))
      .filter(col("sig").isNotNull)

    val banded = sigd.select(col("id"), col("sig"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          hash(slice(col("sig"), b * rows + 1, lit(rows)).cast("array<string>"))
            .as("bucket")))).as("bb"))
      .select(col("id"), col("sig"), col("bb.band"), col("bb.bucket"))

    // cap runaway buckets before the self-join (skew guard)
    val wB = Window.partitionBy(col("band"), col("bucket")).orderBy(col("id"))
    val capped = banded.withColumn("__rn", row_number().over(wB))
      .filter(col("__rn") <= maxBucketSize).drop("__rn")

    val a = capped.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = capped.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          m => m)).cast("double") / numHashes).as("est_jaccard"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("est_jaccard")).as("est_jaccard"))
  }

  /** 64-bit SimHash of the token multiset (Charikar 2002): per-bit
    * majority vote over xxhash64(token). Near-dups differ in few bits. */
  def simhash(textCol: Column): Column = {
    val toks = tokens(textCol)
    val hashes = transform(toks, t => xxhash64(t))
    val bits = transform(sequence(lit(0), lit(63)), i =>
      when(size(filter(hashes, h => h.bitwiseAND(call_function("shiftleft", lit(1L), i)) =!= 0))
        * 2 > size(hashes), call_function("shiftleft", lit(1L), i)).otherwise(lit(0L)))
    aggregate(bits, lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Exact n-gram Jaccard similarity over LSH-free candidate pairs:
    * candidates share at least one `shingleN`-gram that appears in fewer
    * than `maxDocFreq` docs (rare-shingle blocking — common shingles
    * would explode the join and add no discrimination). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, minJaccard: Double = 0.5,
                        maxDocFreq: Int = 20): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        shingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
    val sizes = sh.select(col("id"), size(col("sh")).as("n_sh"))
    val exploded = sh.select(col("id"), explode(col("sh")).as("s"))
    val rare = exploded.groupBy(col("s"))
      .agg(count(lit(1)).as("df_count"), collect_list(col("id")).as("ids"))
      .filter(col("df_count") <= maxDocFreq && col("df_count") >= 2)

    val pairs = rare
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))

    pairs
      .join(sizes.withColumnsRenamed(Map("id" -> "id_a", "n_sh" -> "n_a")), Seq("id_a"))
      .join(sizes.withColumnsRenamed(Map("id" -> "id_b", "n_sh" -> "n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }
}
