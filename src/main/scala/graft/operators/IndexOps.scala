package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType}

/** Cross-index operational surface (r16 verdict #6): one call that
  * answers "what lives at this root, and is maintenance due" for
  * every persisted layout this engine writes, without the caller
  * knowing which report to run. */
object IndexOps {

  /** One-call index health report: detects what lives at `root` — a
    * centroid-IVF index, an IVF-PQ index, a BM25 posting index, a
    * binary-signature index, or a raw embedding/vector table —
    * resolves VERSIONED roots through their `.current` pointer, and
    * emits that kind's FIXED metric set (never data-dependent) as one
    * long-format relation `(kind, layout, metric, value)`:
    *
    *   - every kind: `generation` (live `.v<N>` number; -1 when the
    *     root is unversioned) — plus the kind's own dials:
    *   - `ivf`: [[Similarity.ivfDriftSummary]]'s row unpivoted
    *     (n_cells, n_vecs, count_skew, mean_residual,
    *     retrain_recommended as 0/1, n_tombstones, tombstone_frac) —
    *     the "retrain due / compact due" dials;
    *   - `ivfpq`: n_cells, n_vecs, count_skew, n_tombstones,
    *     tombstone_frac (occupancy from the code rows — residual
    *     drift is unmeasurable from lossy codes; watch the flat-IVF
    *     twin or re-probe recall instead, the SCALE.md drift recipe);
    *   - `bm25`: [[CorpusOps.bm25IndexStats]]'s row unpivoted
    *     (n_builds, n_batches, n_tombstones, n_docs, sum_dl, avgdl) —
    *     df_rows growth and n_batches are the "compact due" dials;
    *   - `bq` / `int8` (the model-free quantized layouts): n_vecs,
    *     n_batches, n_tombstones, tombstone_frac;
    *   - `srp` (detected by the `.srpmeta` sidecar): the model-free
    *     dials plus `n_bits` (the persisted signature width) and
    *     `n_cells`/`count_skew` (bucket-occupancy health — the LSH
    *     prune assumes occupancy near n/2^nBits);
    *   - `embeddings` (a raw vector table, no index layout):
    *     [[Similarity.embeddingReport]]'s ingest-health card.
    *
    * `layout` is `flat` | `batch` (how the data tree is organized)
    * or `table` for a raw embedding table. Costs: directory listings,
    * sidecar-table scans, and — for the vector kinds — the same
    * single data-tree pass their standalone reports already pay; run
    * it from the maintenance loop, not per query. */
  def indexReport(spark: SparkSession, root: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    def exists(p: String): Boolean = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(conf).exists(hp)
    }
    def hasDir(dir: String, prefix: String): Boolean = {
      val hp = new org.apache.hadoop.fs.Path(dir)
      val fs = hp.getFileSystem(conf)
      fs.exists(hp) && fs.listStatus(hp).exists(st =>
        st.isDirectory && st.getPath.getName.startsWith(prefix))
    }
    val gen = Similarity.readIndexVersion(spark, root)
    val genRoot = gen.map(n => s"$root/.v$n").getOrElse(root)
    val generation = gen.map(_.toDouble).getOrElse(-1.0d)

    def layoutOf(dataDir: String): String =
      if (hasDir(dataDir, "batch=")) "batch" else "flat"

    /** distinct tombstoned ids that actually intersect the index —
      * the [[Similarity.ivfDriftSummary]] counting rule. */
    def tombstoneCount(tombDir: String, ids: DataFrame): Long =
      if (exists(tombDir))
        spark.read.parquet(tombDir).select(col("id")).distinct()
          .join(ids, Seq("id"), "left_semi").count()
      else 0L

    def emit(kind: String, layout: String,
             metrics: Seq[(String, java.lang.Double)]): DataFrame = {
      import spark.implicits._
      (metrics :+ ("generation" -> java.lang.Double.valueOf(generation)))
        .map { case (m, v) => (kind, layout, m, v) }
        .toDF("kind", "layout", "metric", "value")
    }
    def d(v: Double): java.lang.Double = java.lang.Double.valueOf(v)

    if (exists(s"$genRoot/codes") && exists(s"$genRoot/model")) {
      // ---- IVF-PQ: occupancy skew + pending deletes off the codes.
      // An EMPTY codes tree (everything tombstoned then compacted, or
      // a crashed build) must report zeros and a null skew — the
      // report is exactly what an operator runs to find out why an
      // index looks wrong (the bm25IndexStats hardening rule). A codes
      // dir with NO data files at all would trip parquet schema
      // inference, so guard with a listing first (r17 advice).
      if (Similarity.listDataFiles(spark, s"$genRoot/codes").isEmpty)
        emit("ivfpq", "flat", Seq(
          "n_cells" -> d(0.0), "n_vecs" -> d(0.0),
          "count_skew" -> null, "n_tombstones" -> d(0.0),
          "tombstone_frac" -> d(0.0)))
      else {
        val codes = spark.read.parquet(s"$genRoot/codes")
        val occ = codes.groupBy(col("cell"))
          .agg(count(lit(1)).as("n")).agg(
            count(lit(1)).as("n_cells"),
            coalesce(sum(col("n")), lit(0L)).as("n_vecs"),
            (max(col("n")).cast("double") / avg(col("n"))).as("skew"))
          .collect()(0)
        val nVecs = occ.getLong(1)
        val nTomb = tombstoneCount(s"$genRoot/tombstones",
          codes.select(col("id")))
        emit("ivfpq", layoutOf(s"$genRoot/codes"), Seq(
          "n_cells" -> d(occ.getLong(0).toDouble),
          "n_vecs" -> d(nVecs.toDouble),
          "count_skew" -> (if (occ.isNullAt(2)) null
            else d(math.round(occ.getDouble(2) * 1e6) / 1e6)),
          "n_tombstones" -> d(nTomb.toDouble),
          "tombstone_frac" -> d(if (nVecs > 0)
            math.round(nTomb.toDouble / nVecs * 1e6) / 1e6 else 0.0)))
      }
    } else if (exists(s"$genRoot/postings") || exists(s"$root.df") ||
        hasDir(root, "tmod=")) {
      // ---- BM25: the stats report unpivoted (no posting-leaf scan)
      val r = CorpusOps.bm25IndexStats(spark, root).collect()(0)
      emit("bm25", r.getString(0), Seq(
        "n_builds" -> d(r.getLong(1).toDouble),
        "n_batches" -> d(r.getLong(2).toDouble),
        "n_tombstones" -> d(r.getLong(3).toDouble),
        "n_docs" -> d(r.getLong(4).toDouble),
        "sum_dl" -> d(r.getLong(5).toDouble),
        "avgdl" -> (if (r.isNullAt(6)) null else d(r.getDouble(6)))))
    } else if (exists(s"$genRoot/centroids") ||
        exists(s"$root.centroids")) {
      // ---- centroid IVF: the drift summary unpivoted. A zero-vector
      // index aggregates to null n_vecs/skew/residual (sum/max/avg of
      // no rows) — null-safe getters, not primitive NPEs (r17 advice)
      val r = Similarity.ivfDriftSummary(spark, root).collect()(0)
      val dataDir = if (gen.isDefined) s"$genRoot/data" else root
      def od(i: Int): java.lang.Double =
        if (r.isNullAt(i)) null else d(r.getDouble(i))
      emit("ivf", layoutOf(dataDir), Seq(
        "n_cells" -> d(r.getLong(0).toDouble),
        "n_vecs" -> (if (r.isNullAt(1)) d(0.0)
          else d(r.getLong(1).toDouble)),
        "count_skew" -> od(2),
        "mean_residual" -> od(3),
        "retrain_recommended" -> (if (r.isNullAt(4)) null
          else d(if (r.getBoolean(4)) 1.0 else 0.0)),
        "n_tombstones" -> d(r.getLong(5).toDouble),
        "tombstone_frac" -> od(6)))
    } else if (exists(s"$root.srpmeta")) {
      // ---- SRP signature index: the model-free lifecycle dials plus
      // the persisted nBits and the cell-occupancy skew (the bucket
      // prune assumes occupancy stays near n/2^nBits)
      val nBits = Similarity.readSrpNBits(spark, root)
      if (Similarity.listDataFiles(spark, root).isEmpty)
        emit("srp", "flat", Seq(
          "n_vecs" -> d(0.0), "n_batches" -> d(0.0),
          "n_tombstones" -> d(0.0), "tombstone_frac" -> d(0.0),
          "n_bits" -> d(nBits.toDouble), "n_cells" -> d(0.0),
          "count_skew" -> null))
      else {
        val rows = spark.read.parquet(root)
        val occ = rows.groupBy(col("cell"))
          .agg(count(lit(1)).as("n")).agg(
            count(lit(1)).as("n_cells"),
            coalesce(sum(col("n")), lit(0L)).as("n_vecs"),
            (max(col("n")).cast("double") / avg(col("n"))).as("skew"))
          .collect()(0)
        val nVecs = occ.getLong(1)
        val nBatches = {
          val hp = new org.apache.hadoop.fs.Path(root)
          hp.getFileSystem(conf).listStatus(hp).count(st =>
            st.isDirectory && st.getPath.getName.startsWith("batch="))
        }
        val nTomb = tombstoneCount(s"$root.tombstones",
          rows.select(col("id")))
        emit("srp", layoutOf(root), Seq(
          "n_vecs" -> d(nVecs.toDouble),
          "n_batches" -> d(nBatches.toDouble),
          "n_tombstones" -> d(nTomb.toDouble),
          "tombstone_frac" -> d(if (nVecs > 0)
            math.round(nTomb.toDouble / nVecs * 1e6) / 1e6 else 0.0),
          "n_bits" -> d(nBits.toDouble),
          "n_cells" -> d(occ.getLong(0).toDouble),
          "count_skew" -> (if (occ.isNullAt(2)) null
            else d(math.round(occ.getDouble(2) * 1e6) / 1e6))))
      }
    } else {
      require(exists(root), s"indexReport: nothing at $root")
      val df = spark.read.parquet(root)
      val isSig = df.schema.fields.exists(f =>
        f.name == "sig" && (f.dataType match {
          case ArrayType(LongType, _) => true
          case _ => false
        }))
      val isInt8 = df.schema.fields.exists(f =>
        f.name == "q_vec" && (f.dataType match {
          case ArrayType(org.apache.spark.sql.types.ByteType, _) => true
          case _ => false
        }))
      if (isSig || isInt8) {
        // ---- model-free quantized index (binary signatures / int8)
        val nVecs = df.count()
        val nBatches = {
          val hp = new org.apache.hadoop.fs.Path(root)
          hp.getFileSystem(conf).listStatus(hp).count(st =>
            st.isDirectory && st.getPath.getName.startsWith("batch="))
        }
        val nTomb = tombstoneCount(s"$root.tombstones",
          df.select(col("id")))
        emit(if (isSig) "bq" else "int8", layoutOf(root), Seq(
          "n_vecs" -> d(nVecs.toDouble),
          "n_batches" -> d(nBatches.toDouble),
          "n_tombstones" -> d(nTomb.toDouble),
          "tombstone_frac" -> d(if (nVecs > 0)
            math.round(nTomb.toDouble / nVecs * 1e6) / 1e6 else 0.0)))
      } else {
        // ---- raw embedding table: the ingest-health data card
        val vecCol = df.schema.fields.find(_.dataType match {
          case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
          case _ => false
        }).getOrElse(sys.error(
          s"indexReport: $root is neither a known index layout nor " +
            "a vector table (no float/double-array column)")).name
        val idCol = df.schema.fields
          .find(f => f.name != vecCol && !f.dataType.isInstanceOf[ArrayType])
          .getOrElse(sys.error(
            s"indexReport: no scalar id column beside $vecCol")).name
        val card = Similarity.embeddingReport(df, idCol, vecCol)
        card.select(lit("embeddings").as("kind"), lit("table").as("layout"),
            col("metric"), col("value").cast("double").as("value"))
          .unionByName(emit("embeddings", "table", Nil))
      }
    }
  }
}
