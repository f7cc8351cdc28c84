package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
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

  /** Cheap pre-filter equivalent to "the doc has >= n whitespace tokens"
    * — exactly the condition under which the sketch expressions produce
    * a null signature / empty shingle set.
    *
    * Filtering on the CHEAP predicate before computing the sketch
    * matters: a post-hoc `.filter(sig.isNotNull)` gets pushed below the
    * projection by Catalyst (PushDownPredicates substitutes the alias),
    * so the expensive sketch expression is evaluated TWICE per row —
    * once in the scan-side filter, once in the projection. Measured on
    * q_minhash_pairs at sf0.1: the double evaluation was the whole of
    * the r4 1.64x bench regression. */
  private def hasMinTokens(textCol: Column, n: Int): Column =
    textCol.isNotNull && trim(textCol) =!= "" &&
      size(split(trim(textCol), "\\s+")) >= n

  /** Caps each bucket (the `partCols` group, ordered by id) at
    * `maxBucketSize` members — the skew guard for pathological buckets
    * (boilerplate shingles / constant signatures). Members beyond the
    * cap are DROPPED, and with them any candidate pairs they were part
    * of, so every recall statement in this file is conditional on
    * buckets fitting the cap.
    *
    * Pass `capObservation` to make the loss visible: the observation
    * reports `dropped_candidates` (rows past the cap) and
    * `largest_bucket` after the query's first action —
    * `obs.get("dropped_candidates")`. The accounting is opt-in because
    * it must rank EVERY bucket member: the default path lets Spark's
    * WindowGroupLimit rewrite discard over-cap rows map-side before the
    * exchange (top-`maxBucketSize` per group per partition), which is
    * exactly the shuffle-volume protection hot buckets need at corpus
    * scale, and which whole-bucket counting necessarily forfeits. */
  private[operators] def capBuckets(banded: DataFrame, partCols: Seq[String],
                                    maxBucketSize: Int,
                                    capObservation: Option[Observation]): DataFrame = {
    val wB = Window.partitionBy(partCols.map(col): _*).orderBy(col("id"))
    val ranked = banded.withColumn("__rn", row_number().over(wB))
    val observed = capObservation.fold(ranked)(obs => ranked.observe(obs,
      sum(when(col("__rn") > maxBucketSize, lit(1L)).otherwise(lit(0L)))
        .as("dropped_candidates"),
      max(col("__rn")).as("largest_bucket")))
    observed.filter(col("__rn") <= maxBucketSize).drop("__rn")
  }

  /** MinHash signature of a text column: `numHashes` permutation minima
    * over word `shingleN`-gram shingles, using the standard
    * `(a_i * h + b_i) mod p` universal-hash family seeded deterministically.
    * Empty shingle sets get null signatures (filtered by callers).
    * Delegates to the native Catalyst expression (one JIT'd loop/row);
    * [[minhashSignatureDeclarative]] is the built-ins-only formulation,
    * kept as the semantic spec (equality asserted in tests). */
  def minhashSignature(textCol: Column, numHashes: Int, shingleN: Int): Column =
    graft.plans.TextExpressions.minhash_signature(textCol, numHashes, shingleN)

  /** Built-ins-only MinHash signature.
    *
    * Shape matters even here: ONE `aggregate` fold over the shingle
    * hashes updating all minima at once. The naive
    * `transform(0..k, i => array_min(...))` re-evaluates the whole
    * shingle pipeline k times per row — Catalyst collapses projections
    * into lambda bodies (single syntactic reference, per-element
    * evaluation), a 30x slowdown measured at k=32. */
  private[graft] def minhashSignatureDeclarative(
      textCol: Column, numHashes: Int, shingleN: Int): Column = {
    val prime = graft.plans.TextExpressions.Prime
    val (as, bs) = graft.plans.TextExpressions.minhashCoefficients(numHashes)
    val coefCol = typedLit(as.zip(bs).toSeq)
    val sh = shingles(textCol, shingleN)
    val base = transform(sh, s => pmod(crc32(s.cast("binary")), lit(prime)))
    when(size(sh) > 0,
      aggregate(base, array_repeat(lit(prime), numHashes),
        (acc, h) => zip_with(acc, coefCol, (m, ab) =>
          least(m, pmod(ab.getField("_1") * h + ab.getField("_2"), lit(prime))))))
  }

  /** MinHash+LSH near-duplicate candidate pairs: band the signature,
    * bucket-join on (band, band-hash), emit distinct (id_a < id_b) pairs
    * with the fraction of matching signature positions (estimated
    * Jaccard). `maxBucketSize` caps pathological buckets (boilerplate);
    * pairs among capped-away members are lost — pass `capObservation`
    * to count what the cap drops (see [[capBuckets]]). */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 32, bands: Int = 8, shingleN: Int = 3,
                   maxBucketSize: Int = 64,
                   capObservation: Option[Observation] = None): DataFrame = {
    // token-count guard BEFORE the signature projection (not
    // `.filter(sig.isNotNull)` after it — see [[hasMinTokens]]) lives
    // inside bandedSignatures; the guard is exactly the signature's
    // null condition, so `sig` is never null
    val banded = bandedSignatures(df, idCol, textCol, numHashes, bands,
      shingleN)
    pairsFromBanded(banded, numHashes, maxBucketSize, capObservation)
  }

  /** The bucket-grouped pair expansion shared by [[minhashPairs]] (the
    * whole-corpus self-join) and the intra-delta leg of
    * [[incrementalMinhashPairs]] (duplicates WITHIN an incoming batch).
    *
    * One shuffle: group members per (band, bucket) and generate the
    * i<j pairs inside the array — a self-join here would recompute the
    * signature expression for both sides and shuffle twice. The window
    * cap bounds bucket size first (skew guard: boilerplate buckets),
    * and its (band, bucket) partitioning is reused by the groupBy, so
    * the cap costs no extra exchange. */
  private def pairsFromBanded(banded: DataFrame, numHashes: Int,
                              maxBucketSize: Int,
                              capObservation: Option[Observation]): DataFrame = {
    val capped = capBuckets(banded, Seq("band", "bucket"), maxBucketSize,
      capObservation)

    val buckets = capped.groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_list(struct(col("id"), col("sig")))).as("ms"))
      .filter(size(col("ms")) >= 2)
    // sort_array orders by id, so position i < j implies id_a < id_b
    val pairsExpr = flatten(transform(col("ms"), (m, i) =>
      transform(slice(col("ms"), i + 2, lit(maxBucketSize)), m2 =>
        struct(m.getField("id").as("id_a"), m2.getField("id").as("id_b"),
          m.getField("sig").as("sig_a"), m2.getField("sig").as("sig_b")))))
    buckets
      .select(explode(pairsExpr).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        (size(filter(zip_with(col("p.sig_a"), col("p.sig_b"), (x, y) => x === y),
          m => m)).cast("double") / numHashes).as("est_jaccard"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("est_jaccard")).as("est_jaccard"))
  }

  /** Banded MinHash signature relation: one row per (doc, band) with the
    * band's bucket hash — the join key of every LSH variant. Shared by
    * [[minhashPairs]]-style self-joins and the persisted-index path
    * ([[buildMinhashIndex]] / [[incrementalMinhashPairs]]). */
  private def bandedSignatures(df: DataFrame, idCol: String, textCol: String,
                               numHashes: Int, bands: Int,
                               shingleN: Int): DataFrame = {
    val rows = numHashes / bands
    df.filter(hasMinTokens(col(textCol), shingleN))
      .select(col(idCol).as("id"),
        minhashSignature(col(textCol), numHashes, shingleN).as("sig"))
      .select(col("id"), col("sig"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            hash(slice(col("sig"), b * rows + 1, lit(rows)).cast("array<string>"))
              .as("bucket")))).as("bb"))
      .select(col("id"), col("sig"), col("bb.band"), col("bb.bucket"))
  }

  /** Number of `bucket`-modulus partition values per band in a persisted
    * MinHash index — with the default 8 bands, 8 x 256 = 2048 leaf
    * directories, each holding ~1/2048 of the corpus rows. */
  val IndexBucketMods = 256

  /** Persist a MinHash LSH index for INCREMENTAL dedup: the banded
    * signature relation laid out hive-partitioned by `(band, bmod)`
    * where `bmod = bucket mod `[[IndexBucketMods]]. Build cost is one
    * corpus scan (the signature projection) plus the partitioned write
    * — done ONCE; after that, deduplicating each incoming delta batch
    * against the corpus is [[incrementalMinhashPairs]], whose index
    * read is pruned to the delta's own `(band, bmod)` leaves. At 100 TB
    * that is the difference between rescanning the corpus per batch and
    * reading ~`|delta| x bands` small directories.
    *
    * Bucket membership is CAPPED at build time (`maxBucketSize`, same
    * id-ascending rule as [[capBuckets]]): a skewed (band, bucket) in
    * the index — boilerplate-heavy corpora, exactly what the cap
    * exists for — would otherwise join its ENTIRE membership against
    * every co-bucketed delta row on EVERY probe, making probe cost
    * scale with the corpus bucket instead of the delta. Capping once
    * at build bounds every future probe; pass `capObservation` to
    * count what the cap drops (docs past the cap are exempt from
    * incremental matching). */
  def buildMinhashIndex(df: DataFrame, idCol: String, textCol: String,
                        path: String, numHashes: Int = 32, bands: Int = 8,
                        shingleN: Int = 3, maxBucketSize: Int = 64,
                        capObservation: Option[Observation] = None): Unit =
    capBuckets(
      bandedSignatures(df, idCol, textCol, numHashes, bands, shingleN),
      Seq("band", "bucket"), maxBucketSize, capObservation)
      .withColumn("bmod", pmod(col("bucket"), lit(IndexBucketMods)))
      // co-locate each (band, bmod) leaf on one task before the
      // partitioned write: without this every shuffle partition writes
      // a sliver into every leaf (leaves x partitions tiny files — 65k
      // at local defaults; measured 4 s of probe-side file listing),
      // with it each leaf is one file and the layout stays listable
      .repartition(col("band"), col("bmod"))
      .write.mode("overwrite").partitionBy("band", "bmod").parquet(path)

  /** Near-duplicate candidates of a NEW batch against a persisted
    * [[buildMinhashIndex]] corpus index, without rescanning the corpus:
    * the delta's banded signatures are computed in-memory, their
    * distinct `(band, bmod)` keys prune the index read to matching
    * partition directories (driver-side collect of at most
    * `bands x `[[IndexBucketMods]] keys — bounded by the layout, not
    * the data), and the bucket equi-join probes the index with the
    * delta. Emits BOTH legs a steady-state ingest needs in one call:
    * corpus-vs-delta pairs `(id_a = corpus id, id_b = new id)` from the
    * index probe, AND intra-delta pairs `(id_a < id_b, both new ids)`
    * from [[pairsFromBanded]] over the delta's own banded signatures —
    * a batch that contains its own duplicates reports them without a
    * second pass. `est_jaccard` is the matching-position fraction of
    * the two signatures, maxed over co-occurring bands. Same
    * `numHashes`/`bands`/`shingleN` as the index build, or buckets will
    * not align. Assumes delta ids are disjoint from corpus ids (new
    * docs), so the two legs cannot emit the same (id_a, id_b) key.
    *
    * The delta side of the probe join is hint-broadcast only while its
    * banded row count (`|delta| x bands`) is at most
    * `maxBroadcastDeltaRows`; above that the hint is omitted and the
    * join strategy is left to AQE/statistics — an unconditional
    * broadcast of a production delta (millions of docs) would collect
    * docs x bands signature rows onto the driver and OOM it. The count
    * rides the same job as the partition-key collect (one aggregation),
    * and the delta's banded relation is materialized once
    * ([[Materialize]]) so the key scan, the probe join, and the
    * intra-delta leg share one computation of the signatures.
    *
    * `maxBucketSize`/`capObservation` govern the intra-delta leg's
    * bucket cap exactly as in [[minhashPairs]] (the corpus side was
    * already capped at index build time).
    *
    * NOT lazy: calling this runs the delta's signature pipeline (the
    * partition-key collect) and the per-leaf existence probes
    * immediately — the returned DataFrame's scan set is fixed at call
    * time, so index leaves written AFTER the call are not seen (same
    * eager-construction semantics as [[exactJaccardLshBlocked]]). */
  def incrementalMinhashPairs(spark: org.apache.spark.sql.SparkSession,
                              indexPath: String, newDocs: DataFrame,
                              idCol: String, textCol: String,
                              numHashes: Int = 32, bands: Int = 8,
                              shingleN: Int = 3, maxBucketSize: Int = 64,
                              capObservation: Option[Observation] = None,
                              maxBroadcastDeltaRows: Long = 4L * 1000 * 1000): DataFrame = {
    val fresh = Materialize(
      bandedSignatures(newDocs, idCol, textCol, numHashes, bands, shingleN)
        .withColumn("bmod", pmod(col("bucket"), lit(IndexBucketMods))),
      eager = false)
    // one job: distinct partition keys of the delta (<= bands x
    // IndexBucketMods values by construction, so the collect is bounded
    // by the LAYOUT) plus the banded row count that gates the broadcast
    val head = fresh.agg(
        collect_set(col("band") * IndexBucketMods + col("bmod")).as("ks"),
        count(lit(1)).as("n")).head()
    val keys = head.getSeq[Int](0)
    val bandedRows = head.getLong(1)
    val intraPairs = pairsFromBanded(fresh.drop("bmod"), numHashes,
      maxBucketSize, capObservation)
    // read the probed leaves by DIRECT PATH (basePath keeps the
    // partition columns) instead of filtering a scan of the root:
    // root-scan partition pruning still LISTS the whole tree up front
    // (2048 leaves here; at 100 TB, every corpus file's metadata), so
    // probe cost would grow with the corpus layout, not the delta.
    // The existence probe per candidate leaf is bands x |delta|
    // driver-side stat calls, bounded by the layout cap.
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(indexPath),
      spark.sparkContext.hadoopConfiguration)
    val leaves = keys.map { k =>
      s"$indexPath/band=${k / IndexBucketMods}/bmod=${k % IndexBucketMods}"
    }.filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    if (leaves.isEmpty) return intraPairs
    val index = spark.read.option("basePath", indexPath)
      .parquet(leaves: _*)
    val deltaSide = fresh.select(col("band"), col("bmod"), col("bucket"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    val probeSide =
      if (bandedRows <= maxBroadcastDeltaRows) broadcast(deltaSide)
      else deltaSide
    index.join(probeSide, Seq("band", "bmod", "bucket"))
      .select(col("id").as("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig"), col("sig_b"), (x, y) => x === y),
          m => m)).cast("double") / numHashes).as("est_jaccard"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("est_jaccard")).as("est_jaccard"))
      .unionByName(intraPairs)
  }

  /** Number of hash-prefix partition values in a persisted exact-dedup
    * index: the first md5 hex byte, 256 leaf directories. */
  val ExactIndexMods = 256

  private def hashPrefixMod(hashCol: Column): Column =
    conv(substring(hashCol, 1, 2), 16, 10).cast("int")

  /** Persist an EXACT-dedup index: `(id, content_hash)` for every
    * non-null text, hive-partitioned by the hash's first hex byte
    * ([[ExactIndexMods]] leaves). The exact twin of
    * [[buildMinhashIndex]]: built once at ingest, then every incoming
    * batch is checked against the corpus by [[incrementalExactDedup]]
    * with a read pruned to the delta's own prefix leaves — no corpus
    * rescan per batch. The index rows are two narrow columns, so even a
    * 100 TB text corpus indexes to ~(16 B + id) x rows, and md5 spreads
    * uniformly so no leaf can skew. */
  def buildExactIndex(df: DataFrame, idCol: String, textCol: String,
                      path: String): Unit =
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        md5(col(textCol).cast("binary")).as("content_hash"))
      .withColumn("hmod", hashPrefixMod(col("content_hash")))
      // one task per leaf before the partitioned write, same
      // small-files reasoning as buildMinhashIndex
      .repartition(col("hmod"))
      .write.mode("overwrite").partitionBy("hmod").parquet(path)

  /** Exact-duplicate annotation of a NEW batch against a persisted
    * [[buildExactIndex]] corpus index: returns one row per delta doc as
    * `(id, content_hash, dup_of)` where `dup_of` is the id of the doc
    * this one duplicates — the min corpus id with the same content hash
    * if any (corpus wins), else the min EARLIER id within the delta
    * itself (intra-batch duplicates are caught in the same call), else
    * null (genuinely new; `filter($"dup_of".isNull)` is the append
    * set). Null-text docs never match anything: `dup_of` is null and
    * they are excluded from grouping (a window over the shared null key
    * would funnel every null-text row into one task).
    *
    * Probe cost scales with the delta, not the corpus: the delta's
    * distinct hash-prefix keys (<= [[ExactIndexMods]], bounded by the
    * layout) prune the index read to matching leaves read by direct
    * path, the corpus side is reduced to min-id per matched hash before
    * joining, and that reduced relation is at most one row per distinct
    * delta hash — broadcast while the delta is small
    * (`maxBroadcastDeltaRows`), left to AQE above that. Assumes delta
    * ids are disjoint from corpus ids (new docs).
    *
    * NOT lazy: the partition-key collect and leaf-existence probes run
    * at call time, so index leaves written after the call are not seen
    * (same eager-construction semantics as [[incrementalMinhashPairs]]). */
  def incrementalExactDedup(spark: org.apache.spark.sql.SparkSession,
                            indexPath: String, newDocs: DataFrame,
                            idCol: String, textCol: String,
                            maxBroadcastDeltaRows: Long = 8L * 1000 * 1000): DataFrame = {
    val idType = newDocs.schema(newDocs.schema.fieldIndex(idCol)).dataType
    val hashed = Materialize(
      newDocs.select(col(idCol).as("id"),
        md5(col(textCol).cast("binary")).as("content_hash")),
      eager = false)
    val nn = hashed.filter(col("content_hash").isNotNull)
    // one job: the delta's prefix keys (<= ExactIndexMods values — the
    // collect is bounded by the layout) plus the row count gating the
    // broadcast hints
    val head = nn.agg(
      collect_set(hashPrefixMod(col("content_hash"))).as("ks"),
      count(lit(1)).as("n")).head()
    val keys = head.getSeq[Int](0)
    val deltaRows = head.getLong(1)
    val hint: DataFrame => DataFrame =
      if (deltaRows <= maxBroadcastDeltaRows) broadcast(_) else identity
    val wH = Window.partitionBy(col("content_hash"))
    val withDeltaMin = nn.withColumn("delta_min", min(col("id")).over(wH))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(indexPath),
      spark.sparkContext.hadoopConfiguration)
    val leaves = keys.map(k => s"$indexPath/hmod=$k")
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    val joined = if (leaves.isEmpty) {
      withDeltaMin.withColumn("corpus_min", lit(null).cast(idType))
    } else {
      // reduce the pruned corpus leaves to min-id per hash THAT THE
      // DELTA ACTUALLY CARRIES (semi-join on the broadcast delta hash
      // set) before the outer join: the reduced side is bounded by the
      // delta's distinct hashes, never by the corpus leaf population
      val index = spark.read.option("basePath", indexPath)
        .parquet(leaves: _*)
      val corpusMin = index
        .join(hint(nn.select(col("content_hash")).distinct()),
          Seq("content_hash"), "left_semi")
        .groupBy(col("content_hash"))
        .agg(min(col("id")).as("corpus_min"))
      withDeltaMin.join(hint(corpusMin), Seq("content_hash"), "left_outer")
    }
    joined
      .select(col("id"), col("content_hash"),
        coalesce(col("corpus_min"),
          when(col("id") =!= col("delta_min"), col("delta_min"))).as("dup_of"))
      .unionByName(hashed.filter(col("content_hash").isNull)
        .select(col("id"), col("content_hash"),
          lit(null).cast(idType).as("dup_of")))
  }

  /** Column wrapper over Spark's internal bloom-filter aggregate (the
    * expression behind runtime join pruning): builds one bloom over
    * `xxhash64(c)`. */
  private def bloomAgg(c: Column, expectedItems: Long): Column =
    org.apache.spark.sql.GraftBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(
          org.apache.spark.sql.GraftBridge.expression(xxhash64(c)),
          expectedItems)
        .toAggregateExpression())

  /** Per-leaf bloom sidecar for a [[buildExactIndex]] layout, written
    * to `indexPath/_blooms` (underscore prefix = invisible to parquet
    * directory listings, so index scans never pick it up). One bloom
    * row per `hmod` leaf over that leaf's content hashes.
    *
    * Why: [[incrementalExactDedup]] prunes the probe to the delta's
    * prefix leaves, but still READS every one of those leaves — and at
    * 256 prefixes a modest delta touches most of them. For the
    * dominant at-scale case (most new docs are genuinely new), the
    * bloom answers "no such hash in this leaf" from megabytes of
    * sidecar instead of scanning terabytes of index. False positives
    * only cost extra reads, never correctness (no false negatives).
    * Rebuild after appending to the index — a stale sidecar CAN miss
    * newer corpus hashes. */
  def writeExactIndexBlooms(spark: org.apache.spark.sql.SparkSession,
                            indexPath: String,
                            expectedItemsPerLeaf: Long = 100000L): Unit =
    // size expectedItemsPerLeaf ≈ corpus distinct hashes / ExactIndexMods
    // (the per-leaf population under the uniform md5 prefix split);
    // 100k ≈ a 25M-hash corpus at the default fpp, ~180 KB per bloom —
    // oversizing only wastes sidecar bytes, undersizing only raises
    // fpp (extra leaf reads, never wrong answers)
    spark.read.parquet(indexPath)
      .groupBy(col("hmod"))
      .agg(bloomAgg(col("content_hash"), expectedItemsPerLeaf).as("bloom"))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$indexPath/_blooms")

  /** Driver-side load of the sidecar — bounded by [[ExactIndexMods]] x
    * bloom size, the same boundedness argument as the prefix-key
    * collect. */
  private def loadBlooms(spark: org.apache.spark.sql.SparkSession,
                         indexPath: String): Map[Int, Seq[Byte]] =
    spark.read.parquet(s"$indexPath/_blooms")
      .select(col("hmod"), col("bloom")).collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1).toSeq).toMap

  /** The delta hashes that MIGHT exist in the corpus, per the bloom
    * sidecar: everything filtered out here is definitely absent.
    * The sidecar rides into the filter as a codegen reference object
    * ([[graft.plans.BloomSidecarContains]]): Spark's own
    * `might_contain` demands a CONSTANT bloom, and a per-leaf map
    * beats 256 scalar subqueries. A hash whose leaf has no sidecar row
    * is definitely absent (the leaf holds no corpus hashes at all).
    * Exposed for spec assertions; `deltaHashes` must carry
    * `content_hash`. */
  private[graft] def bloomCandidateHashes(
      spark: org.apache.spark.sql.SparkSession, indexPath: String,
      deltaHashes: DataFrame): DataFrame =
    deltaHashes.select(col("content_hash")).distinct()
      .filter(graft.plans.BloomSidecarContains.contains(
        col("content_hash"), loadBlooms(spark, indexPath)))

  /** [[incrementalExactDedup]] with the bloom sidecar in front: delta
    * hashes that no leaf can contain are settled as corpus-miss without
    * touching the index, and only leaves holding a surviving candidate
    * are read at all. Output is IDENTICAL to the plain probe (the bloom
    * has no false negatives; false positives just read a leaf that then
    * matches nothing). Falls back to the plain probe when the sidecar
    * is missing. The broadcast blooms are bounded by
    * `ExactIndexMods x bloom size` — size `expectedItemsPerLeaf` so a
    * leaf bloom stays ~1 MB. */
  def incrementalExactDedupBloom(spark: org.apache.spark.sql.SparkSession,
                                 indexPath: String, newDocs: DataFrame,
                                 idCol: String, textCol: String,
                                 maxBroadcastDeltaRows: Long = 8L * 1000 * 1000): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(indexPath),
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$indexPath/_blooms")))
      return incrementalExactDedup(spark, indexPath, newDocs, idCol,
        textCol, maxBroadcastDeltaRows)
    val idType = newDocs.schema(newDocs.schema.fieldIndex(idCol)).dataType
    val hashed = Materialize(
      newDocs.select(col(idCol).as("id"),
        md5(col(textCol).cast("binary")).as("content_hash")),
      eager = false)
    val nn = hashed.filter(col("content_hash").isNotNull)
    // candidates survive the bloom; their prefix keys are the ONLY
    // leaves worth reading. ONE job folds the surviving-key collect
    // and the broadcast-gating row count (the plain probe's 'one job'
    // discipline — per-batch latency here is job-overhead-dominated)
    val survives = graft.plans.BloomSidecarContains.contains(
      col("content_hash"), loadBlooms(spark, indexPath))
    val head = nn.agg(
      collect_set(when(survives, hashPrefixMod(col("content_hash"))))
        .as("ks"),
      count(lit(1)).as("n")).head()
    val keys = head.getSeq[Int](0)
    val deltaRows = head.getLong(1)
    val cands = nn.filter(survives).select(col("content_hash")).distinct()
    val hint: DataFrame => DataFrame =
      if (deltaRows <= maxBroadcastDeltaRows) broadcast(_) else identity
    val wH = Window.partitionBy(col("content_hash"))
    val withDeltaMin = nn.withColumn("delta_min", min(col("id")).over(wH))
    val leaves = keys.map(k => s"$indexPath/hmod=$k")
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    val joined = if (leaves.isEmpty) {
      withDeltaMin.withColumn("corpus_min", lit(null).cast(idType))
    } else {
      val index = spark.read.option("basePath", indexPath)
        .parquet(leaves: _*)
      val corpusMin = index
        .join(hint(cands), Seq("content_hash"), "left_semi")
        .groupBy(col("content_hash"))
        .agg(min(col("id")).as("corpus_min"))
      withDeltaMin.join(hint(corpusMin), Seq("content_hash"), "left_outer")
    }
    joined
      .select(col("id"), col("content_hash"),
        coalesce(col("corpus_min"),
          when(col("id") =!= col("delta_min"), col("delta_min"))).as("dup_of"))
      .unionByName(hashed.filter(col("content_hash").isNull)
        .select(col("id"), col("content_hash"),
          lit(null).cast(idType).as("dup_of")))
  }

  /** Exact Jaccard over MinHash-LSH candidates: the robust hybrid —
    * candidate pairs come from signature band buckets (immune to the
    * rare-shingle blocking failure, see [[ngramJaccardPairs]]), then the
    * TRUE Jaccard is computed by co-occurrence counting on the narrow
    * exploded (id, shingle) relation ([[exactJaccardForCandidates]]), so
    * the output carries exact similarities, not estimates.
    *
    * NOT lazy: calling this runs the candidate-generation pipeline
    * immediately (an eager [[Materialize]] — the candidate list is
    * referenced from three plan branches downstream), so the full LSH
    * cost is paid even if the returned DataFrame is never executed, and
    * caller-side predicates cannot push below the materialized
    * candidates. See [[Materialize]] for the cluster fault-tolerance
    * mode.
    *
    * Candidate pairs with an EMPTY shingle intersection are excluded
    * from the output (the co-occurrence count is an inner join): with
    * `minJaccard = 0` such pairs would otherwise appear with jaccard
    * 0.0. Any `minJaccard > 0` makes the exclusion semantically
    * invisible. */
  def exactJaccardLshBlocked(df: DataFrame, idCol: String, textCol: String,
                             minJaccard: Double = 0.5, numHashes: Int = 32,
                             bands: Int = 8, shingleN: Int = 3): DataFrame = {
    // eager: the candidate list is tiny but its LSH subtree is the
    // whole banding pipeline, and exactJaccardForCandidates references
    // candidates three times (see ngramJaccardPairs note)
    val candidates = Materialize(
      minhashPairs(df, idCol, textCol, numHashes, bands, shingleN)
        .select(col("id_a"), col("id_b")),
      eager = true)
    exactJaccardForCandidates(candidates,
      shingleRelation(df, idCol, textCol, shingleN), minJaccard)
  }

  /** The narrow exploded (id, shingle) relation, block-shared via LAZY
    * `localCheckpoint`: every Jaccard pipeline references it from
    * several plan branches (doc-frequency counts, candidate generation,
    * per-doc stats, and both sides of the intersection join), and
    * without sharing each branch re-runs
    * [[graft.plans.TextExpressions.WordShingles]] over the full corpus.
    *
    * Lifecycle alternatives, all MEASURED at sf0.1 on q_ngram_jaccard
    * (min of 5, see SCALE.md):
    *   - r5's `Dataset.persist` (3.4-3.6 s) leaks: the CacheManager
    *     pins one corpus×shingles entry PER CALL until an explicit
    *     unpersist, which a lazily-returned result can never issue
    *     (ADVICE r5);
    *   - eager-checkpointing the final pair result + unpersist: +38%;
    *   - persist + an unpersist-after-first-query listener: matches
    *     persist on the query itself but the ASYNC block release lands
    *     on whatever query runs next (bench sd tripled) — rejected;
    *   - lazy `localCheckpoint` (here, 3.7 s): blocks fill during the
    *     first consuming stage and the ContextCleaner genuinely frees
    *     them once the plan is GC'd — leak-free for ~+5% on this query
    *     (RDD block reads lack the columnar cache's batch layout).
    * DedupSimilaritySpec pins the CacheManager staying empty. Lineage
    * truncation / cluster fault-tolerance tradeoff: see [[Materialize]]
    * (the `spark.graft.reliableCheckpoint` switch). */
  private def shingleRelation(df: DataFrame, idCol: String, textCol: String,
                              shingleN: Int): DataFrame =
    Materialize(
      df.filter(hasMinTokens(col(textCol), shingleN))
        .select(col(idCol).as("id"),
          graft.plans.TextExpressions.word_shingles(col(textCol), shingleN)
            .as("sh"))
        .select(col("id"), explode(col("sh")).as("s_raw"))
        // 64-bit shingle identity, not the string: every downstream
        // consumer (window sort, groupBy, co-occurrence equi-join) only
        // needs set identity, and fixed-width longs sort/compare/shuffle
        // several times cheaper than ~30-byte UTF8 shingles (measured on
        // q_ngram_jaccard's single-task window stage: the string sort
        // dominated). Collisions merge two shingles corpus-wide at
        // ~n^2/2^65 probability — immaterial next to MinHash/LSH's own
        // approximation, and the exact-Jaccard path counts set overlap
        // where a collision shifts one count by 1.
        .select(col("id"), xxhash64(col("s_raw")).as("s")),
      eager = false)

  /** Skew-safe rare-shingle candidate machinery shared by
    * [[ngramJaccardPairs]] and [[ngramContainmentPairs]]: from the
    * narrow exploded (id, s) relation, derive
    *   - `candCounts` (id_a, id_b, r_inter): candidate pairs sharing
    *     >= 1 rare shingle (corpus df in [2, maxDocFreq]) with their
    *     shared-rare count, and
    *   - `stats` (id, n_sh, cm): per-doc shingle-set size and
    *     common-shingle count (df > maxDocFreq) for the PPJoin bound.
    *
    * Doc frequency is derived WITHOUT ever co-locating one shingle's
    * occurrences on one task — the r14 plan audit's one at-100x
    * exposure. The previous shape (`count(1) over (partition by s)` on
    * the exploded relation) buffered every occurrence of a stop-shingle
    * in a single window group: for a trigram like "of the and" at
    * corpus scale that is billions of rows on one task — a straggler at
    * best, an executor OOM at worst. (Its rationale was genuinely
    * measured — the r5 aggregate-and-join-back made both downstream
    * consumers pay a corpus-sized exchange — but a join back on `s`
    * co-locates the hot key identically, so no unsalted shape survives
    * planted skew.) The skew-safe decomposition:
    *
    *   1. df per shingle via `groupBy(s).count()`. Catalyst's partial
    *      HashAggregate IS the salted two-phase count — each map task
    *      pre-combines its local occurrences (the map partition is the
    *      salt), so the exchange carries at most one partial row per
    *      shingle per map task no matter how hot the key is.
    *   2. HOT keys (df > hotDocFreq) are classified by a BROADCAST
    *      left join: hot keys are provably few — at most (total shingle
    *      rows / hotDocFreq), e.g. <= 15M eight-byte hashes for 10^12
    *      rows at the 2^16 default — so hot occurrences are tagged
    *      map-side and never shuffle on `s` at all.
    *   3. MID keys (maxDocFreq < df <= hotDocFreq) are classified by an
    *      equi-join on `s` AFTER the hot rows are split off, so every
    *      join group is <= hotDocFreq rows by construction.
    *   4. Rows matching neither class have df <= maxDocFreq, so the
    *      rare collect_list groups are <= maxDocFreq elements and the
    *      group SIZE is the key's df — `size(ids) >= 2` replaces the
    *      old `df_count >= 2` filter exactly (singletons drop there).
    *
    * Shuffle ledger vs the window: the window paid one full corpus
    * exchange+sort on `s`; this pays the partial-agg exchange (vocab-
    * sized after map-side combine) plus one corpus exchange on `s` for
    * the mid join — same order of volume, minus the single-task failure
    * mode (planted-skew stage evidence in SCALE.md). `restLeg` and the
    * `dfTable` aggregation are each referenced twice and NOT
    * checkpointed: all references land in one query, where AQE stage
    * reuse evaluates the shared shuffles once (verified in the sf0.1
    * stage trace, SCALE.md; DedupSimilaritySpec pins the structural
    * properties — no Window node, hot keys through a broadcast join,
    * and the hot-vs-mid equivalence law under planted skew). */
  private[graft] def rareShingleCandidates(
      exploded: DataFrame, maxDocFreq: Int, hotDocFreq: Int)
    : (DataFrame, DataFrame) = {
    require(hotDocFreq >= maxDocFreq,
      s"hotDocFreq ($hotDocFreq) must be >= maxDocFreq ($maxDocFreq)")
    val spark = exploded.sparkSession
    val dfTable = exploded.groupBy(col("s"))
      .agg(count(lit(1)).as("df_count"))
    val hotDim = dfTable.filter(col("df_count") > hotDocFreq)
      .select(col("s"), lit(1).as("__hot"))
    val midDim = dfTable
      .filter(col("df_count") > maxDocFreq && col("df_count") <= hotDocFreq)
      .select(col("s"), lit(1).as("__mid"))
    val marked = exploded.join(broadcast(hotDim), Seq("s"), "left")
    val hotLeg = marked.filter(col("__hot") === 1)
    val restLeg = marked.filter(col("__hot").isNull)
      .join(midDim, Seq("s"), "left")
    val stats = hotLeg.select(col("id"), lit(true).as("__common"))
      .unionByName(restLeg.select(col("id"),
        coalesce(col("__mid") === 1, lit(false)).as("__common")))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_sh"), count_if(col("__common")).as("cm"))
    // id lists ONLY for rows already known rare, so every collected
    // array is bounded by maxDocFreq. sort_array so in-array pair
    // expansion below can emit id_a < id_b positionally. Explicit
    // partition count so AQE does NOT coalesce this exchange: rare rows
    // compress tiny, and byte-based coalescing would land the final agg
    // AND the in-array pair expansion (the pipeline's most CPU-dense
    // stage) on ONE task while every other core idles — measured 1.5 s
    // single-task vs spread at sf0.1 (r5).
    val rareIds = restLeg.filter(col("__mid").isNull)
      .select(col("id"), col("s"))
      .repartition(spark.sessionState.conf.numShufflePartitions, col("s"))
      .groupBy(col("s"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
    // Candidate pairs share >= 1 rare shingle; each shared rare shingle
    // contributes one pair row, so the group count IS the shared-rare
    // count `r_inter` (exact — shingle sets are deduped per doc). Pairs
    // are generated i<j IN-ARRAY by the native [[graft.plans.IdPairs]]
    // (ids sorted ascending above, so id_a < id_b positionally);
    // measured 2x the interpreted flatten/transform nest it replaced.
    val candCounts = rareIds
      .select(explode(graft.plans.TextExpressions.id_pairs(col("ids")))
        .as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("r_inter"))
    (candCounts, stats)
  }

  /** LOSSLESS prune before the expensive intersection join (positional-
    * filtering bound in the PPJoin family, Xiao et al. 2008): `keep` is
    * the caller's bound predicate over (r_inter, n_a, n_b, cm_a, cm_b).
    * Pairs whose bound misses the threshold are dropped without ever
    * touching their shingles — measured at sf0.1: 1.12M candidates ->
    * 266 survivors, turning the pair x shingles fanout from ~58M rows
    * to ~14k. `stats` is joined twice (a and b sides) and not
    * checkpointed: the twin aggregations overlap inside one job; a
    * checkpoint barrier here measured slower (see the note in
    * [[exactJaccardForCandidates]]). */
  private def boundSurvivors(candCounts: DataFrame, stats: DataFrame,
                             keep: Column): DataFrame =
    candCounts
      .join(stats.select(col("id").as("id_a"), col("n_sh").as("n_a"),
        col("cm").as("cm_a")), Seq("id_a"))
      .join(stats.select(col("id").as("id_b"), col("n_sh").as("n_b"),
        col("cm").as("cm_b")), Seq("id_b"))
      .filter(keep)
      .select(col("id_a"), col("id_b"))

  /** Exact Jaccard for a given (id_a, id_b) candidate-pair list over
    * the narrow exploded (id, shingle) relation from
    * [[shingleRelation]] (one row per doc x distinct shingle).
    *
    * The intersection is counted on the narrow exploded (id, shingle)
    * relation — fan candidate pairs out over id_a's shingles, equi-join
    * id_b's shingles — NOT by joining the full shingle arrays to each
    * pair and running `array_intersect` (that shape shuffles wide arrays
    * twice; shuffle volume ∝ docs x shingles x candidate fanout — the
    * r2 bench's 11x q_ngram_jaccard regression). The id_b side is
    * semi-joined down to candidate docs first so the equi-join's
    * shuffled input is proportional to candidate docs, not the corpus.
    *
    * Pairs with an empty intersection drop out of the inner joins, so
    * they never reach the output even when `minJaccard = 0` (callers
    * document this; all shipped entry points default to thresholds
    * > 0 where the exclusion is unobservable). */
  /** N-gram CONTAINMENT near-dup pairs — the asymmetric twin of
    * [[ngramJaccardPairs]] for SUB-document duplication: a 50-token
    * quote inside a 5000-token page has Jaccard ~ 0.01 (invisible at
    * any usable threshold) but containment-of-the-smaller
    * `|A ∩ B| / min(|A|, |B|)` ~ 1.0. Broder's containment measure;
    * the standard companion wherever corpora embed copies of smaller
    * documents (mirrored articles inside aggregator pages, license
    * blocks, quoted posts).
    *
    * Same machinery and guarantees as the Jaccard form — rare-shingle
    * blocking gates candidacy (identical recall contract: a pair must
    * share >= 1 shingle with corpus df in [2, maxDocFreq]), a lossless
    * PPJoin-style bound prunes before the exact intersection
    * (`inter <= r_inter + min(cm_a, cm_b)` and `<= min(n_a, n_b)`, so
    * `containment <= ub / min(n_a, n_b)`), and the reported score is
    * EXACT over the pair's full shingle sets. Returns (`id_a`, `id_b`,
    * `containment` round 4) with id_a < id_b.
    *
    * Recall caveat for HIGH-MULTIPLICITY boilerplate: candidacy needs a
    * shared shingle with df <= `maxDocFreq`, so a fragment copied into
    * MORE than `maxDocFreq` documents (a license block on every page of
    * a site, a footer quoted corpus-wide) has every shingle above the
    * cutoff and yields zero candidates at the default — the most-
    * duplicated fragments are exactly the ones this blocks. Raise
    * `maxDocFreq` toward the expected copy multiplicity to find them
    * (candidate-pair volume grows ~quadratically in df per shingle:
    * each rare shingle with df=d contributes d(d-1)/2 pairs), or handle
    * corpus-wide boilerplate with the span family
    * ([[graft.operators.CorpusOps.duplicateSpanStats]] /
    * `removeDupSpans`), whose posting-list shape has no df ceiling.
    * DedupSimilaritySpec pins both regimes. */
  def ngramContainmentPairs(df: DataFrame, idCol: String, textCol: String,
                            shingleN: Int = 3,
                            minContainment: Double = 0.8,
                            maxDocFreq: Int = 20,
                            hotDocFreq: Int = 1 << 16): DataFrame = {
    // candidate pipeline shared with ngramJaccardPairs (see
    // rareShingleCandidates for the skew-safe df decomposition); only
    // the prune bound and the final scorer differ
    val exploded = shingleRelation(df, idCol, textCol, shingleN)
    val (candCounts, stats) =
      rareShingleCandidates(exploded, maxDocFreq, hotDocFreq)
    val ubInter = least(col("r_inter") + least(col("cm_a"), col("cm_b")),
      least(col("n_a"), col("n_b")))
    val survivors = boundSurvivors(candCounts, stats,
      ubInter.cast("double")
        / least(col("n_a"), col("n_b")).cast("double") >= minContainment)
    exactScoredForCandidates(Materialize(survivors, eager = true),
      exploded, minContainment, containment = true)
  }

  private def exactJaccardForCandidates(candidates: DataFrame,
                                        exploded: DataFrame,
                                        minJaccard: Double): DataFrame =
    exactScoredForCandidates(candidates, exploded, minJaccard,
      containment = false)

  private def exactScoredForCandidates(candidates: DataFrame,
                                       exploded: DataFrame,
                                       minScore: Double,
                                       containment: Boolean): DataFrame = {
    // shingles are a per-doc SET, so the per-id row count IS the set
    // size — counted only for docs that appear in some candidate pair
    // (semi-join first): the candidate set is tiny next to the corpus,
    // so this turns a corpus-wide aggregation into one over ~|pairs|
    // docs, with AQE broadcasting the id list
    // Joined twice below (n_a and n_b sides) and NOT checkpointed, on
    // purpose: the duplicate semi-join+agg evaluations land in ONE job
    // and overlap on idle cores, while an eager checkpoint is a serial
    // job barrier — measured +15% on q_ngram_jaccard. (The candidate
    // list itself IS checkpointed by callers: its references would
    // otherwise re-run the whole upstream pipeline, which no amount of
    // overlap hides.)
    val candIds = candidates.select(col("id_a").as("id"))
      .unionByName(candidates.select(col("id_b").as("id"))).distinct()
    val sz = exploded.join(candIds, Seq("id"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val candB = candidates.select(col("id_b").as("id")).distinct()
    val eB = exploded.join(candB, Seq("id"), "left_semi")
      .select(col("id").as("id_b"), col("s"))
    val inter = candidates
      .join(exploded.select(col("id").as("id_a"), col("s")), Seq("id_a"))
      .join(eB, Seq("id_b", "s"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    val (scoreName, scoreExpr) =
      if (containment)
        ("containment", col("inter").cast("double")
          / least(col("n_a"), col("n_b")).cast("double"))
      else
        ("jaccard", col("inter").cast("double")
          / (col("n_a") + col("n_b") - col("inter")).cast("double"))
    inter
      .join(sz.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sz.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn(scoreName, scoreExpr)
      .filter(col(scoreName) >= minScore)
      .select(col("id_a"), col("id_b"),
        round(col(scoreName), 4).as(scoreName))
  }

  /** 64-bit SimHash of the token multiset (Charikar 2002): per-bit
    * majority vote over xxhash64(token). Near-dups differ in few bits.
    * Native expression; [[simhashDeclarative]] is the built-ins spec. */
  def simhash(textCol: Column): Column =
    graft.plans.TextExpressions.simhash64(textCol)

  /** Built-ins-only SimHash: single fold over token hashes maintaining 64
    * bit-counters (same nested-lambda re-evaluation pitfall as
    * [[minhashSignatureDeclarative]]). */
  private[graft] def simhashDeclarative(textCol: Column): Column = {
    val masks = typedLit((0 until 64).map(1L << _))
    val toks = tokens(textCol)
    val hashes = transform(toks, t => xxhash64(t))
    val counts = aggregate(hashes, array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, masks, (c, m) =>
        c + when(h.bitwiseAND(m) =!= 0, lit(1L)).otherwise(lit(0L))))
    aggregate(
      zip_with(counts, masks, (cnt, m) =>
        when(cnt * 2 > size(toks), m).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash near-duplicate pairs via bit-band blocking (the Manku/
    * Jain/Sarma WWW'07 web-dedup construction): the 64-bit signature is
    * split into `bands` contiguous bit blocks and docs sharing any
    * block value become candidates; the true Hamming distance is then
    * checked exactly with `bit_count(xor)`. By pigeonhole, a pair
    * within `maxHamming` bit flips leaves at least one of `bands`
    * blocks intact whenever `maxHamming < bands`, so blocking itself
    * prunes only work, not results — recall for the returned distance
    * bound is exact PROVIDED every (band, bucket) fits within
    * `maxBucketSize`: the skew cap drops bucket members past the cap,
    * and pairs among dropped members with them (heavy-boilerplate
    * corpora are precisely where buckets overflow — pass
    * `capObservation` to count the loss, see [[capBuckets]]). Same
    * bucket-join shape (one shuffle, capped buckets, in-array pair
    * expansion) as [[minhashPairs]]. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, bands: Int = 4,
                   maxBucketSize: Int = 256,
                   capObservation: Option[Observation] = None): DataFrame = {
    require(maxHamming < bands,
      s"recall guarantee needs maxHamming ($maxHamming) < bands ($bands)")
    require(64 % bands == 0, s"bands ($bands) must divide 64")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val sigd = df.select(col(idCol).as("id"),
      simhash(col(textCol)).as("sig"))
    val banded = sigd.select(col("id"), col("sig"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          call_function("shiftrightunsigned", col("sig"), b * lit(width))
            .bitwiseAND(lit(mask)).as("bucket")))).as("bb"))
      .select(col("id"), col("sig"), col("bb.band"), col("bb.bucket"))
    val capped = capBuckets(banded, Seq("band", "bucket"), maxBucketSize,
      capObservation)
    val buckets = capped.groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_list(struct(col("id"), col("sig")))).as("ms"))
      .filter(size(col("ms")) >= 2)
    val pairsExpr = flatten(transform(col("ms"), (m, i) =>
      transform(slice(col("ms"), i + 2, lit(maxBucketSize)), m2 =>
        struct(m.getField("id").as("id_a"), m2.getField("id").as("id_b"),
          m.getField("sig").as("sig_a"), m2.getField("sig").as("sig_b")))))
    buckets
      .select(explode(pairsExpr).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        bit_count(col("p.sig_a").bitwiseXOR(col("p.sig_b")))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("hamming")).as("hamming"))
  }

  /** Connected components over a near-dup pair list: every document in a
    * duplicate cluster gets the cluster's MIN id as its canonical id —
    * the step that turns pairwise similarity into "keep one per
    * cluster". Iterative min-label propagation (each round joins labels
    * across edges); converges in O(log(max component diameter)) rounds —
    * near-dup clusters are small, so `maxIter` 10 is generous. The
    * classic scalable formulation (no driver-side union-find).
    *
    * NOT lazy: calling this runs the whole upstream pair pipeline AND
    * every propagation round immediately (each round materializes
    * eagerly so the convergence probe and the next round read blocks
    * instead of re-running joins) — the returned DataFrame is the
    * already-computed label relation, not a deferred plan. See
    * [[Materialize]] for the cluster fault-tolerance mode.
    */
  def clusterPairs(pairs: DataFrame, idA: String = "id_a",
                   idB: String = "id_b", maxIter: Int = 10): DataFrame = {
    // edges are consumed by EVERY label-propagation round below —
    // materialize them once (eagerly; near-dup edge lists are tiny next
    // to the corpus) so iterations never re-execute the upstream pair
    // pipeline
    val edges = Materialize(
      pairs.select(col(idA).as("a"), col(idB).as("b"))
        .unionByName(pairs.select(col(idB).as("a"), col(idA).as("b")))
        .distinct(),
      eager = true)
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // each node adopts the min label among itself and its neighbors
      val neighborLabels = edges
        .join(labels.withColumnsRenamed(Map("id" -> "b", "label" -> "nl")), Seq("b"))
        .groupBy(col("a").as("id"))
        .agg(min(col("nl")).as("min_neighbor"))
      // materialize BEFORE the convergence probe: isEmpty then reads
      // the result blocks instead of re-running the iteration's joins,
      // and the iterative lineage is truncated either way
      val next = Materialize(
        labels.join(neighborLabels, Seq("id"), "left_outer")
          .select(col("id"),
            least(col("label"), coalesce(col("min_neighbor"), col("label")))
              .as("label")),
        eager = true)
      converged = next
        .join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .filter(col("label") =!= col("old")).isEmpty
      labels = next
      iter += 1
    }
    labels.withColumnRenamed("label", "cluster_id")
  }

  /** Exact n-gram Jaccard similarity over LSH-free candidate pairs:
    * candidates share at least one `shingleN`-gram that appears in fewer
    * than `maxDocFreq` docs (rare-shingle blocking — common shingles
    * would explode the join and add no discrimination). The reported
    * `jaccard` is then EXACT: the intersection is recomputed over each
    * pair's full shingle sets (rare shingles only gate candidacy), so
    * pairs that also share common shingles are not deflated.
    *
    * Best for high-entropy text where near-dup pairs share globally-rare
    * shingles. On low-entropy corpora (tiny vocabulary / boilerplate)
    * every shingle exceeds `maxDocFreq` and recall collapses — measured:
    * 0 pairs at 50k docs over a 40-word vocabulary where
    * [[minhashPairs]] finds 250k. Prefer MinHash LSH when shingle
    * frequencies are unknown.
    *
    * `hotDocFreq` tiers the df classification for skew safety (see
    * [[rareShingleCandidates]]): keys above it are resolved via a
    * broadcast set instead of any shuffle on `s`. It only exists to
    * bound per-task work — any value >= maxDocFreq yields identical
    * pairs (spec-pinned equivalence law).
    *
    * NOT lazy: calling this runs candidate generation and the survivor
    * prune immediately (an eager [[Materialize]] of the survivor list —
    * it is referenced from three plan branches downstream), so most of
    * the pipeline cost is paid even if the returned DataFrame is never
    * executed, and caller-side predicates cannot push below the
    * materialized survivors. See [[Materialize]] for the cluster
    * fault-tolerance mode. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, minJaccard: Double = 0.5,
                        maxDocFreq: Int = 20,
                        hotDocFreq: Int = 1 << 16): DataFrame = {
    // checkpoint-shared narrow (id, shingle) rows — WordShingles emits a
    // per-doc SET, so co-occurrence counts downstream ARE intersection
    // sizes. Doc frequency, the rare/common/hot classification, and the
    // PPJoin-bound stats all come from rareShingleCandidates — see its
    // scaladoc for the skew-safe decomposition that replaced the r5-r14
    // count-over-window (the window put every occurrence of a
    // stop-shingle in one task's window group).
    val exploded = shingleRelation(df, idCol, textCol, shingleN)
    val (candCounts, stats) =
      rareShingleCandidates(exploded, maxDocFreq, hotDocFreq)
    //   inter <= r_inter + min(cm_a, cm_b)   and   inter <= min(n_a, n_b)
    // where cm_x = |common shingles of x| (df > maxDocFreq; singletons
    // df = 1 are never shared), so jaccard <= ub below — lossless, see
    // [[boundSurvivors]].
    val ubInter = least(col("r_inter") + least(col("cm_a"), col("cm_b")),
      least(col("n_a"), col("n_b")))
    val survivors = boundSurvivors(candCounts, stats,
      ubInter.cast("double") /
        (col("n_a") + col("n_b") - ubInter).cast("double") >= minJaccard)

    // TRUE intersection by co-occurrence counting on the exploded
    // relation, for surviving pairs only (rare shingles gate candidacy
    // and the bound; the final count runs over ALL of each pair's
    // shingles, so similarities are exact, not deflated) — see
    // [[exactJaccardForCandidates]] for why this shape, and not
    // array_intersect over full arrays.
    // Surviving pairs are TINY (hundreds at sf0.1) but their subtree is
    // most of the pipeline, and exactJaccardForCandidates references its
    // candidate input three times (id sets for both semi-joins + the
    // pair fan-out) — an unmaterialized diamond that re-runs the
    // subtree per reference (measured +17%). Eagerly materializing the
    // pair list pays the subtree once; the three reads then cost
    // nothing. (Same reasoning rejected reusing `stats` for the sizes:
    // diamonds over unmaterialized plans re-evaluate.)
    exactJaccardForCandidates(Materialize(survivors, eager = true),
      exploded, minJaccard)
  }

  /** End-to-end near-duplicate corpus dedup — the one-call form of the
    * pipeline a training-data curation job runs: near-dup pair
    * generation ([[ngramJaccardPairs]]: exact Jaccard over blocked
    * candidates) -> connected components ([[clusterPairs]]) -> keep
    * each cluster's canonical (min-id) document.
    *
    * Returns `(idCol, n_members)`: every non-duplicate document plus
    * one representative per duplicate cluster, where `n_members` is how
    * many near-dups the kept row absorbed (1 for docs in no cluster).
    * Join back to the source on `idCol` for the surviving payloads.
    *
    * Scale shape: the cluster relation only contains documents that
    * appear in some near-dup pair (tiny vs the corpus at real dup
    * rates); the corpus-sized work is one anti-join plus one left join,
    * both shuffling on the id key. */
  def nearDedup(df: DataFrame, idCol: String, textCol: String,
                shingleN: Int = 3, minJaccard: Double = 0.8,
                maxDocFreq: Int = 20): DataFrame = {
    val clusters = clusterPairs(
      ngramJaccardPairs(df, idCol, textCol, shingleN, minJaccard, maxDocFreq))
    // cluster_id is the component's min id, so the canonical row is the
    // one whose own id equals it
    val sizes = clusters.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"))
    val canon = clusters.filter(col("id") === col("cluster_id"))
      .join(sizes, Seq("cluster_id"))
      .select(col("id").as(idCol), col("n_members"))
    val dropIds = clusters.filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    df.select(col(idCol))
      .join(dropIds, Seq(idCol), "left_anti")
      .join(canon, Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col("n_members"), lit(1L)).as("n_members"))
  }

  /** [[nearDedup]] with a QUALITY keeper: each near-dup cluster keeps
    * its highest-`qualityCol` member (ties to the smaller id) instead
    * of the arbitrary min-id — the curation-grade form: when a page
    * exists as a clean original and a boilerplate-wrapped mirror, the
    * min-id rule keeps whichever crawled first; this rule keeps the
    * better document (SemDeDup and the RefinedWeb pipeline both pick
    * per-cluster representatives by quality, not by id).
    *
    * `quality` is any per-row Column evaluated against `df` (a stored
    * score, [[graft.operators.TextAnalysis.gopherRules]] output joined
    * beforehand, a length prior...). NULL quality ranks below every
    * non-NULL (nulls-last), so an unscored member never beats a scored
    * one. Returns `(idCol, n_members)` like [[nearDedup]].
    *
    * Scale shape: identical to [[nearDedup]] plus one extra join of
    * the (tiny) cluster relation against the corpus to fetch member
    * quality, and a per-cluster max — aggregation over the cluster
    * relation, never the corpus. */
  def nearDedupByQuality(df: DataFrame, idCol: String, textCol: String,
                         quality: Column,
                         shingleN: Int = 3, minJaccard: Double = 0.8,
                         maxDocFreq: Int = 20): DataFrame =
    dedupByQualityFromPairs(df, idCol,
      ngramJaccardPairs(df, idCol, textCol, shingleN, minJaccard,
        maxDocFreq),
      quality)

  /** The cluster-then-keep-best tail of [[nearDedupByQuality]], taking
    * the near-dup PAIRS as input so any pair generator plugs in —
    * [[ngramContainmentPairs]] for sub-document dedup (quality = token
    * count keeps the PARENT and drops embedded fragments, where min-id
    * canonicalization could keep the fragment), [[simhashPairs]],
    * embedding pairs. Keeper per connected component = max (quality,
    * then smallest id); returns (`idCol`, `n_members`) — every
    * unclustered doc plus one keeper per cluster. */
  def dedupByQualityFromPairs(df: DataFrame, idCol: String,
                              pairs: DataFrame,
                              quality: Column): DataFrame = {
    val clusters = clusterPairs(pairs)
    val scored = clusters
      .join(df.select(col(idCol).as("id"), quality.as("__q")), Seq("id"))
    // keeper = max (quality, -id): nulls-last via the struct trick —
    // a null quality sorts below any non-null under max_by semantics
    val keeper = scored
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        max_by(col("id"), struct(col("__q").isNotNull, col("__q"),
          -col("id"))).as("__keep"))
    val canon = keeper.select(col("__keep").as(idCol), col("n_members"))
    val dropIds = scored.join(keeper, Seq("cluster_id"))
      .filter(col("id") =!= col("__keep"))
      .select(col("id").as(idCol))
    df.select(col(idCol))
      .join(dropIds, Seq(idCol), "left_anti")
      .join(canon, Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col("n_members"), lit(1L)).as("n_members"))
  }

  /** Blocked fuzzy-match join — the entity-resolution primitive: find
    * pairs of DISTINCT `nameCol` values within `maxDist` Levenshtein
    * edits, generating candidates by BLOCKING (equal lowercased
    * `prefixLen`-char prefix, a length gap of at most `maxDist`) so no
    * all-pairs comparison ever runs. Returns (`name_a`, `name_b`,
    * `dist`, `n_a`, `n_b`) with `name_a < name_b`; `n_*` are the
    * names' row occurrence counts.
    *
    * Matching is over DISTINCT names deliberately: real entity data
    * repeats values massively (this repo's `part` table: 20k rows, 64
    * distinct names), and row-level pairing squares the duplication —
    * measured 3.2M output pairs vs a few hundred name pairs on the
    * same input. Fuzzy comparison is a function of the VALUES; expand
    * matches back to rows with an ordinary equi-join on the name only
    * where the pipeline actually needs row granularity.
    *
    * Blocking is part of the CONTRACT, not an approximation being
    * hidden: a pair differing inside its first `prefixLen` characters
    * is out of scope by definition (the standard recall/cost dial of
    * entity resolution — at 100 TB the alternative is a quadratic
    * join). The same declarative predicate runs verbatim in the
    * DuckDB oracle, so the gate is exact.
    *
    * Scale shape: one hash aggregation collapses rows to distinct
    * names (corpus-linear, map-side combined), then one self-join
    * shuffle keyed on the prefix; per-block cost is distinct-names²,
    * so `prefixLen` dials skew. The length-gap predicate prunes
    * before the edit distance evaluates, and the distance uses the
    * THRESHOLDED Levenshtein (banded O(maxDist·len) with early exit,
    * returns -1 over the bound) rather than the full O(len²) matrix.
    */
  def fuzzyNamePairs(df: DataFrame, nameCol: String,
                     maxDist: Int = 2, prefixLen: Int = 2): DataFrame = {
    require(maxDist >= 0 && prefixLen > 0,
      s"fuzzyNamePairs: need maxDist >= 0 and prefixLen > 0")
    val names = df.filter(col(nameCol).isNotNull)
      .groupBy(col(nameCol)).agg(count(lit(1)).as("__n"))
      .select(col(nameCol).as("__nm"), col("__n"),
        lower(substring(col(nameCol), 1, prefixLen)).as("__blk"),
        length(col(nameCol)).as("__len"))
    val a = names.select(col("__nm").as("name_a"), col("__n").as("n_a"),
      col("__blk"), col("__len").as("__la"))
    val b = names.select(col("__nm").as("name_b"), col("__n").as("n_b"),
      col("__blk"), col("__len").as("__lb"))
    a.join(b, Seq("__blk"))
      .filter(col("name_a") < col("name_b") &&
        abs(col("__la") - col("__lb")) <= maxDist)
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0) // thresholded variant returns -1 over bound
      .select(col("name_a"), col("name_b"), col("dist"),
        col("n_a"), col("n_b"))
  }
}
