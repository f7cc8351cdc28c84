package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: dump `.explain("formatted")` for named catalog queries
  * to `plans/<tag>/<name>_<suffix>.txt` — the before/after plan evidence
  * the optimization rounds commit alongside the code.
  *
  * Usage: `sbt "runMain graft.tools.ExplainDump r19 before q_curate_v2 ..."`
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = new java.io.File(s"plans/$tag")
    dir.mkdirs()
    names.foreach { n =>
      val q = graft.QueryCatalog.all.find(_.name == n)
        .getOrElse(sys.error(s"no such query: $n"))
      val df = q.run(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"plans/$tag/${n}_$suffix.txt"), txt)
      println(s"[explain-dump] wrote plans/$tag/${n}_$suffix.txt " +
        s"(${txt.linesIterator.size} lines)")
    }
    spark.stop()
  }
}
