// scratch: per-stage timing forensics for one catalog query —
//   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ScratchStages q_ngram_jaccard"
package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft._

object ScratchStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qname = args.headOption.getOrElse("q_ngram_jaccard")
    val q = QueryCatalog.all.find(_.name == qname).get

    // warm pass (scan cache, codegen) — not instrumented
    q.run(spark, sfDir).queryExecution.toRdd.count()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.add(f"stage ${si.stageId}%3d ${si.numTasks}%4d tasks " +
          f"wall=${(si.completionTime.get - si.submissionTime.get) / 1000.0}%6.2fs " +
          f"cpu=${m.executorCpuTime / 1e9}%7.2fs run=${m.executorRunTime / 1e3}%7.2fs " +
          f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
          f"in=${m.inputMetrics.recordsRead}%10d recs | ${si.name.take(60)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val n = q.run(spark, sfDir).queryExecution.toRdd.count()
    val el = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1500) // let the listener bus drain
    println(s"=== $qname: rows=$n wall=${el}s ===")
    stages.forEach(println(_))
    spark.stop()
  }
}
