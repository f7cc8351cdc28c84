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
}
