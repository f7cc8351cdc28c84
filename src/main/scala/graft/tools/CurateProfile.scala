package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, Materialize, TextAnalysis}
import graft.functions.TextFunctions.tokens

/** Dev scratch: stage-level timing of the q_curate_v2 DAG — replicates
  * the curateV2 body with a noop sink after each stage so the
  * incremental cost of every stage is visible. Numbers feed
  * OPTIMIZATION_r19.md; the tool is not part of the catalog.
  */
object CurateProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docsTable = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(label: String)(df: => DataFrame): Unit = {
      // warm + 3 timed; `df` is by-name so each pass builds a fresh
      // plan (fresh lazy checkpoints), predecessors' blocks stay warm
      df.write.format("noop").mode("overwrite").save()
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[curate-profile] $label%-28s min=${ts.min}%.3f")
    }

    // replicate the q_curate_v2 inputs
    val derived = docsTable
      .select(col("doc_id"), col("source"),
        regexp_replace(col("text"), " the ", "\n").as("text"))
    val planted = derived.unionByName(
      derived.filter(col("doc_id") < 10)
        .select((col("doc_id") + 1000000).as("doc_id"),
          col("source"), col("text")))
    def model = CorpusOps.trainNbQuality(
      planted.filter(col("doc_id") % 2 === 0)
        .withColumn("__label",
          when(array_contains(tokens(col("text")), "dup"), "dupish")
            .otherwise("clean")),
      "doc_id", "text", "__label", numBuckets = 4096,
      alpha = 0.0009765625)
    val evalSet = derived.filter(col("doc_id") < 20)

    val idCol = "doc_id"; val textCol = "text"; val groupCol = "source"

    // stage 1
    val hashed = planted.filter(col(textCol).isNotNull)
      .select(col(idCol), md5(col(textCol).cast("binary")).as("__h"))
    val firstPer = hashed.groupBy(col("__h"))
      .agg(min(col(idCol)).as("__first"))
    def dupFlags = Materialize(hashed.join(firstPer, Seq("__h"))
      .select(col(idCol), (col(idCol) =!= col("__first")).as("is_dup")),
      eager = false)
    time("s1 dupFlags")(dupFlags)
    val dupF = dupFlags
    def nd = Materialize(planted.join(dupF, Seq(idCol), "left_outer")
      .filter(!coalesce(col("is_dup"), lit(false)))
      .select(col(idCol), col(groupCol), col(textCol)), eager = false)
    time("s1b nd")(nd)
    val ndM = nd
    // stage 2
    def para = CorpusOps.dropRepeatedParagraphs(ndM, idCol, textCol, "\n")
      .select(col(idCol), col("clean_text").as("__t1"),
        col("n_removed").as("n_para_removed"))
    def nd1 = Materialize(ndM.join(para, Seq(idCol), "left_outer")
      .select(col(idCol), col(groupCol),
        coalesce(col("__t1"), col(textCol)).as("__t1"),
        coalesce(col("n_para_removed"), lit(0L)).as("n_para_removed")),
      eager = false)
    time("s2 nd1 (para dedup)")(nd1)
    val nd1M = nd1
    // stage 3
    def spans = CorpusOps.removeDupSpans(nd1M, idCol, "__t1", 8, 2, 8)
      .select(col(idCol), col("clean_text").as("__t2"),
        col("n_removed").as("n_span_removed"))
    def nd2 = Materialize(
      nd1M.select(col(idCol), col(groupCol), col("n_para_removed"))
        .join(spans, Seq(idCol)),
      eager = false)
    time("s3 nd2 (span removal)")(nd2)
    val nd2M = nd2
    // stages 4-6 separately
    time("s4 gopher")(
      TextAnalysis.gopherRules(nd2M, idCol, "__t2", 30))
    time("s5 model alone")(model)
    time("s5 nbScore")(CorpusOps.nbScore(nd2M, model, idCol, "__t2"))
    time("s6 contam")(CorpusOps.contaminationFlags(nd2M, idCol, "__t2",
      evalSet, "text", 3))
    // full assembly
    time("full curateV2")(CorpusOps.curateV2(planted, idCol, textCol,
      evalSet, "text", model, "dupish", groupCol, tau = 0.5,
      totalBudgetTokens = 2000L, minTokens = 30, contamN = 3))
    spark.stop()
  }
}
