package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Pipeline observability via `Dataset.observe`: counters ride the
  * SAME job as the data pass. At 100 TB the alternative — a separate
  * `count()` per metric — is a full rescan per counter; observed
  * metrics are free at any scale, which is why production pipelines
  * gate on them (row counts, null rates, domain violations) rather
  * than on post-hoc queries.
  */
class ObservabilitySpec extends SparkSpec {

  test("observe collects scan metrics on the job that does the work") {
    val obs = Observation("ingest_metrics")
    val out = java.nio.file.Files.createTempDirectory("graft_obs").toString
    Tables.orders(spark, sfDir)
      .observe(obs,
        count(lit(1)).as("rows_scanned"),
        sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
          .as("n_urgent"),
        sum(when(col("o_totalprice").isNull, 1L).otherwise(0L))
          .as("null_totalprice"))
      .filter(col("o_orderpriority") === "1-URGENT")
      .write.mode("overwrite").parquet(out)
    val m = obs.get
    val written = spark.read.parquet(out).count()
    // the metric saw the FULL scan (pre-filter), in the same job
    assert(m("rows_scanned") == Tables.orders(spark, sfDir).count())
    assert(m("n_urgent") == written)
    assert(m("null_totalprice") == 0L)
  }

  test("observed quality gate fails the batch loudly, not silently") {
    val obs = Observation("quality_gate")
    val docs = Tables.documents(spark, sfDir)
      .observe(obs,
        count(lit(1)).as("n_docs"),
        sum(when(col("text").isNull || trim(col("text")) === "", 1L)
          .otherwise(0L)).as("n_blank"))
    docs.write.format("noop").mode("overwrite").save()
    val m = obs.get
    // the gate a pipeline would enforce before publishing the batch
    val blankRate = m("n_blank").asInstanceOf[Long].toDouble /
      m("n_docs").asInstanceOf[Long]
    assert(blankRate <= 0.5, s"blank rate $blankRate exceeds gate")
  }
}
