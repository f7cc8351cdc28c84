package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Mergeable HLL sketch tables: the property that matters is that a
  * PERSISTED sketch (binary parquet column) from one batch merges with
  * later batches' sketches to the same answer a full rescan would give
  * (within HLL tolerance) — distinct counting becomes metadata-sized
  * after the first pass.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def est(df: org.apache.spark.sql.DataFrame): Long =
    df.collect()(0).getLong(0)

  test("persisted per-batch sketches merge to the rescan answer") {
    val docs = Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_hll").toString
    // two ingest "batches" sketched independently and persisted
    val b0 = docs.filter($"doc_id" % 2 === 0)
    val b1 = docs.filter($"doc_id" % 2 =!= 0)
    Sketches.hllByGroup(b0, "source", "doc_id")
      .write.parquet(s"$dir/batch=0")
    Sketches.hllByGroup(b1, "source", "doc_id")
      .write.parquet(s"$dir/batch=1")
    // merge the PERSISTED bytes, never re-reading documents
    val persisted = spark.read.parquet(s"$dir/batch=*")
    val merged = est(Sketches.hllMergedEstimate(persisted))
    val exact = docs.select($"doc_id").distinct().count()
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged=$merged exact=$exact")
    // a one-shot sketch over everything lands in the same envelope (the
    // union path is NOT bit-identical to a single build — DataSketches
    // sparse/dense mode transitions shift the estimate slightly)
    val oneShot = est(Sketches.hllMergedEstimate(
      Sketches.hllByGroup(docs, "source", "doc_id")))
    assert(math.abs(oneShot - exact).toDouble / exact < 0.05,
      s"oneShot=$oneShot exact=$exact")
  }

  test("sketches re-aggregate to a coarser grouping without rescan") {
    val docs = Tables.documents(spark, sfDir)
    // fine-grained build: per (source, lang); coarse query: per source
    val fine = docs.groupBy($"source", $"lang")
      .agg(hll_sketch_agg($"doc_id", lit(12)).as("hll"))
    val bySource = Sketches.hllUnionBy(fine, "source")
      .select($"source", Sketches.hllEstimate($"hll").as("n_est"))
      .as[(String, Long)].collect().toMap
    val exact = docs.groupBy($"source")
      .agg(countDistinct($"doc_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(bySource.keySet == exact.keySet)
    exact.foreach { case (src, n) =>
      assert(math.abs(bySource(src) - n).toDouble / n < 0.05,
        s"$src: est=${bySource(src)} exact=$n")
    }
  }

  test("sketch build plan partially aggregates before the exchange") {
    val plan = Sketches.hllByGroup(
      Tables.documents(spark, sfDir), "source", "doc_id")
      .queryExecution.executedPlan.toString
    // partial ObjectHashAggregate below the exchange: the shuffle moves
    // sketch states, not rows
    val exch = plan.indexOf("Exchange")
    assert(exch >= 0, plan.take(500))
    assert(plan.substring(exch).contains("Aggregate"), plan.take(800))
  }
}
