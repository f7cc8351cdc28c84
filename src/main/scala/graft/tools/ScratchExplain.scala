// scratch: sbt "runMain graft.tools.ScratchExplain" — plan introspection
package graft.tools

import org.apache.spark.sql.SparkSession
import graft._

object ScratchExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = QueryCatalog.all.find(_.name == args.headOption.getOrElse("q_minhash_pairs")).get
    val df = q.run(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    println("=== physical plan ===")
    println(plan)
    println("minhash_signature occurrences: " + "minhash_signature".r.findAllIn(plan).size)
    println("word_shingles occurrences: " + "word_shingles".r.findAllIn(plan).size)
    spark.stop()
  }
}
