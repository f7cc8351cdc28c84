package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Measurement main (dev tooling): how [[Similarity.ivfDriftSummary]]'s
  * two dials move as an appended delta drifts away from the build-time
  * distribution — the numbers that justify "watch the summary, retrain
  * on movement" as the [[Similarity.ivfAppend]] maintenance contract.
  *
  * Protocol: build the centroid index on the corpus embeddings,
  * snapshot the summary, then append same-size deltas of increasing
  * distortion — an IN-DISTRIBUTION copy (ids shifted, vectors
  * unchanged: the null case — both dials should barely move) and
  * SHIFTED copies (a constant offset added to the first coordinate,
  * the anisotropic-mean drift real embedding corpora develop), and
  * print the summary after each append (appends COMPOUND — each row
  * reads the index with all prior deltas in, which is exactly how an
  * unattended ingest pipeline would experience drift). */
object IvfDrift {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivfdrift").toString + "/idx"
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    Similarity.buildIvfCentroidIndex(emb, "vec_id", "embedding", dir,
      k = 16, iters = 4)
    def row(stage: String): String = {
      val s = Similarity.ivfDriftSummary(spark, dir).collect()(0)
      f"| $stage | ${s.getLong(0)} | ${s.getLong(1)} | " +
        f"${s.getDouble(2)}%.3f | ${s.getDouble(3)}%.4f | " +
        f"${s.getBoolean(4)} |"
    }
    def shifted(offset: Double, idBase: Long) = emb.select(
      (col("vec_id") + idBase).as("vec_id"),
      // cast back to float so appended partitions keep the index's
      // at-rest schema (array<float>), not a silently widened copy
      transform(col("embedding"),
        (x, i) => when(i === 0, x + lit(offset)).otherwise(x + lit(0.0d)))
        .cast("array<float>").as("embedding"))
    println("| stage | cells | vecs | count_skew | mean_residual | " +
      "retrain(4.0/0.5) |")
    println("|---|---|---|---|---|---|")
    println(row("build"))
    Similarity.ivfAppend(shifted(0.0, 1000000L), "vec_id", "embedding", dir)
    println(row("+copy (no shift)"))
    Similarity.ivfAppend(shifted(0.5, 2000000L), "vec_id", "embedding", dir)
    println(row("+copy shifted 0.5"))
    Similarity.ivfAppend(shifted(2.0, 3000000L), "vec_id", "embedding", dir)
    println(row("+copy shifted 2.0"))
    spark.stop()
  }
}
