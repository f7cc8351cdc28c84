package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: time named catalog queries (noop sink, min-of-N) outside
  * the headline bench — for SCALE.md sizing notes. */
object ScratchTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.QueryCatalog.all.filter(q => names.contains(q.name))
    qs.foreach(q => q.run(spark, sfDir).write.format("noop").mode("overwrite").save())
    qs.foreach { q =>
      val ts = (0 until 5).map { _ =>
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch-time] ${q.name} min=${ts.min}%.3f mean=${ts.sum / 5}%.3f")
    }
    spark.stop()
  }
}
