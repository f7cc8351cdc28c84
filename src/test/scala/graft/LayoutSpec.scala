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

  test("merge-hinted bucketed fact-fact join plans exchange-free " +
    "without conf overrides (the q_bucketed_join shape)") {
    Layout.saveBucketed(
      Tables.orders(spark, sfDir), "bh_orders", "o_orderkey", buckets = 8)
    Layout.saveBucketed(
      Tables.lineitem(spark, sfDir)
        .withColumnRenamed("l_orderkey", "o_orderkey"),
      "bh_lineitem", "o_orderkey", buckets = 8)
    // the merge hint pins sort-merge (test-SF sizes would otherwise
    // auto-broadcast and bypass the bucketed layout entirely); with
    // both sides bucketed on the key, the join needs NO exchange —
    // the shuffle was paid once, at write
    val joined = spark.table("bh_orders").hint("merge")
      .join(spark.table("bh_lineitem"), "o_orderkey")
    val plan = planOf(joined)
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed merge join should not shuffle either side:\n$plan")
    val expected = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir),
        $"o_orderkey" === $"l_orderkey").count()
    assert(joined.count() == expected)
  }

  test("dropOrphanedTableLocation clears a dead location; rerun succeeds") {
    // Simulate the cross-JVM rerun: the warehouse directory for a
    // deterministic table name exists on disk, but THIS session's
    // catalog has never heard of the table (a previous JVM's managed
    // table). saveAsTable(Overwrite) refuses to create over it —
    // sweeping first makes the rebuild succeed.
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val orphan = new java.io.File(
      new org.apache.hadoop.fs.Path(s"$wh/b_orphan").toUri.getPath)
    assert(orphan.mkdirs())
    val junk = new java.io.File(orphan, "part-stale.parquet")
    java.nio.file.Files.write(junk.toPath, Array[Byte](1, 2, 3))
    val df = Tables.orders(spark, sfDir).select($"o_orderkey")
    intercept[Exception] {
      Layout.saveBucketed(df, "b_orphan", "o_orderkey", buckets = 2)
    }
    Layout.dropOrphanedTableLocation(spark, "b_orphan")
    assert(!orphan.exists(), "stale location should be gone")
    Layout.saveBucketed(df, "b_orphan", "o_orderkey", buckets = 2)
    assert(spark.table("b_orphan").count() == df.count())
    // and once the catalog OWNS the table, the sweep is a no-op:
    // Overwrite's own drop-and-recreate path stays in charge
    Layout.dropOrphanedTableLocation(spark, "b_orphan")
    assert(spark.table("b_orphan").count() == df.count())
  }

  test("normalized events layout pushes ts-range filters into the scan") {
    val base = Files.createTempDirectory("layout_norm").toString
    val path = s"$base/events"
    Layout.writeNormalized(Tables.events(spark, sfDir), path, "ts",
      numFiles = 4)
    val lo = lit("2024-01-10 00:00:00").cast("timestamp")
    val hi = lit("2024-01-17 00:00:00").cast("timestamp")
    val pruned = spark.read.parquet(path)
      .filter($"ts" >= lo && $"ts" < hi)
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .head.toString
    // the whole point: the range predicate reaches the parquet reader
    assert(scan.contains("PushedFilters") &&
      scan.contains("GreaterThanOrEqual(ts") &&
      scan.contains("LessThan(ts"),
      s"expected ts range in PushedFilters:\n$scan")
    // ...which the normalize-at-read path cannot do when the file is
    // INT64-encoded (the nanos/micros encodings the driver has shipped):
    // there `ts` is timestamp_micros(when(...)) over the stored column
    // and nothing pushes. (An NTZ-encoded file is the lucky case — the
    // plain cast is invertible in a UTC session and Catalyst unwraps
    // it — so the gap is replicated here with an explicit INT64 copy
    // rather than relying on the driver's encoding of the day.)
    val longDir = s"$base/events_i64"
    Tables.events(spark, sfDir)
      .withColumn("ts", unix_micros($"ts".cast("timestamp")))
      .write.parquet(longDir)
    val rawLong = spark.read.parquet(longDir)
    val wrapped = rawLong
      .withColumn("ts",
        Tables.normalizedTs(org.apache.spark.sql.types.LongType))
      .filter($"ts" >= lo && $"ts" < hi)
    val wrappedScan = wrapped.queryExecution.executedPlan.collectLeaves()
      .head.toString
    assert(!wrappedScan.contains("GreaterThanOrEqual(ts"),
      s"wrapped-ts scan unexpectedly pushed the filter:\n$wrappedScan")
    // range-clustered files cover disjoint time slices, so the filter
    // prunes whole FILES from the listing, not just row groups
    val ranges = spark.read.parquet(path)
      .groupBy(input_file_name()).agg(min($"ts"), max($"ts"))
      .collect()
      .map(r => (r.getTimestamp(1).getTime, r.getTimestamp(2).getTime))
      .sortBy(_._1)
    assert(ranges.length == 4)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ => ()
    }
    // and the rewrite changed layout only, never values
    val expect = Tables.events(spark, sfDir)
      .filter($"ts" >= lo && $"ts" < hi)
      .select($"event_id").as[Long].collect().sorted
    val got = pruned.select($"event_id").as[Long].collect().sorted
    assert(got.sameElements(expect))
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
