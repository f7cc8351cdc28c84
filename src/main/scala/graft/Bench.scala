package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries from [[QueryCatalog]] on
  * `SPARK_GRAFT_SF_DIR`, forcing full materialization through the noop
  * sink (a bare `count()` would let Catalyst prune the computed columns),
  * and prints ONE JSON line for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val targets = QueryCatalog.all.filter(_.headline)
    // full warm-up pass (every headline query) so JIT/codegen/
    // file-listing costs — and GC pressure left behind by a heavy
    // neighbor — don't land on whichever query runs first after it
    targets.foreach { q =>
      try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // drain warm-up garbage so the first timed queries don't pay for it
    System.gc()
    // `iters` timed passes per query, interleaved at the pass level so a
    // slow neighbor's GC debt spreads across all queries instead of
    // landing on one iteration of one query; per-query we report
    // best-of-N (min: least-noise estimate of the true cost), mean, and
    // stddev so regressions can be told apart from run-to-run variance
    val samples = (0 until iters).map { _ =>
      targets.map { q =>
        val t0 = System.nanoTime()
        try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        }
        q.name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val results = targets.map { q =>
      val ts = samples.map(_.find(_._1 == q.name).get._2)
      val mean = ts.sum / ts.size
      val sd = math.sqrt(ts.map(t => (t - mean) * (t - mean)).sum / ts.size)
      (q.name, ts.min, mean, sd)
    }
    val qs = results.map { case (k, mn, _, _) => "\"" + k + "\":" + f"$mn%.3f" }
      .mkString("{", ",", "}")
    val stats = results.map { case (k, mn, mean, sd) =>
      "\"" + k + "\":" + f"""{"min":$mn%.3f,"mean":$mean%.3f,"sd":$sd%.3f}"""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"stats":$stats,"iters":$iters,"sf":"$sfDir"}""")
    spark.stop()
  }
}
