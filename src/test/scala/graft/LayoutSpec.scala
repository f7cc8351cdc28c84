package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("partitioned layout prunes partitions under a filter") {
    val dir = Files.createTempDirectory("layout_part").toString + "/docs"
    Layout.writePartitioned(
      Tables.documents(spark, sfDir), dir, Seq("lang"))
    // directory structure is hive-style
    assert(new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("lang=")))
    val filtered = Layout.readPartitioned(spark, dir)
      .filter($"lang" === "en")
    val scan = filtered.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("isnotnull(lang") || scan.contains("lang#"),
      s"expected partition filters in:\n$scan")
    // only the en partition's rows come back
    val expected = Tables.documents(spark, sfDir)
      .filter($"lang" === "en").count()
    assert(filtered.count() == expected)
  }

  test("bucketed tables join with no exchange") {
    Layout.saveBucketed(
      Tables.orders(spark, sfDir).select($"o_orderkey", $"o_totalprice"),
      "b_orders", "o_orderkey", buckets = 4)
    Layout.saveBucketed(
      Tables.lineitem(spark, sfDir)
        .select($"l_orderkey".as("o_orderkey"), $"l_quantity"),
      "b_lineitem", "o_orderkey", buckets = 4)
    // force the shuffle-join path (small testdata would auto-broadcast,
    // which bypasses bucketing entirely)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
        "o_orderkey")
      val plan = planOf(joined)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
      // and it still computes the right thing
      val expected = Tables.orders(spark, sfDir)
        .join(Tables.lineitem(spark, sfDir),
          $"o_orderkey" === $"l_orderkey").count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("compact: small files coalesce to size-derived count, data intact") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact")
      .toString
    val docs = Tables.documents(spark, sfDir)
    docs.repartition(40).write.mode("overwrite").parquet(s"$base/frag")
    def dataFiles(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(dataFiles(s"$base/frag") == 40)
    // target sized so the whole dataset fits one file
    val n = Layout.compact(spark, s"$base/frag", s"$base/one",
      targetBytes = 1L << 30)
    assert(n == 1 && dataFiles(s"$base/one") == 1)
    // target sized from actual bytes: forces a multi-file layout
    val bytes = new java.io.File(s"$base/frag").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val n2 = Layout.compact(spark, s"$base/frag", s"$base/multi",
      targetBytes = bytes / 4, sortCol = Some("doc_id"))
    assert(n2 >= 4 && dataFiles(s"$base/multi") == n2)
    // content identical in all layouts
    val orig = docs.orderBy("doc_id").collect()
    assert(spark.read.parquet(s"$base/one").orderBy("doc_id").collect()
      .sameElements(orig))
    assert(spark.read.parquet(s"$base/multi").orderBy("doc_id").collect()
      .sameElements(orig))
    // the sorted compaction restores disjoint doc_id ranges per file
    val ranges = spark.read.parquet(s"$base/multi")
      .groupBy(input_file_name()).agg(min($"doc_id"), max($"doc_id"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ => ()
    }
  }
}
