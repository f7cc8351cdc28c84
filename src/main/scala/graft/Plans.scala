package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump formatted physical plans for selected catalog queries. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_agg","q_join5_revenue","q_filter_eq","q_topk","q_dedup_exact","q_cosine_knn")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      QueryCatalog.byName(n).run(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
