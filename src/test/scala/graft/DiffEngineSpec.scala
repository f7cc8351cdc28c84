package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.DiffEngine

class DiffEngineSpec extends SparkSpec {
  import spark.implicits._

  test("keepLast keeps the highest-ord row per key, drops blank keys") {
    val df = Seq(
      ("k1", 1, "old"), ("k1", 2, "new"),
      ("k2", 1, "only"),
      ("  ", 9, "blank-key"), ("", 8, "empty-key"))
      .toDF("k", "ord", "v")
    val out = DiffEngine.keepLast(df, "k", "ord")
      .select("k", "v").as[(String, String)].collect().toMap
    assert(out == Map("k1" -> "new", "k2" -> "only"))
  }

  test("wordDiff marks positional changes and length extension (S10)") {
    def diff(old: String, neu: String): Seq[(String, Boolean)] =
      Seq(1).toDF("x")
        .select(DiffEngine.wordDiff(lit(old), lit(neu)).as("d"))
        .as[Seq[(String, Boolean)]].collect()(0)

    // equal -> all unchanged
    assert(diff("a b c", "a b c") == Seq(("a", false), ("b", false), ("c", false)))
    // positional change
    assert(diff("a b c", "a X c") == Seq(("a", false), ("X", true), ("c", false)))
    // new longer than old: extension tokens changed (i >= len(old))
    assert(diff("a", "a b c") == Seq(("a", false), ("b", true), ("c", true)))
    // new shorter than old: zip_with null-padding filtered out
    assert(diff("a b c", "a b") == Seq(("a", false), ("b", false)))
  }

  test("wordDiffChangedCount matches the run form") {
    val n = Seq(1).toDF("x")
      .select(DiffEngine.wordDiffChangedCount(lit("a b c"), lit("a X c Y")).as("n"))
      .collect()(0).getInt(0)
    assert(n == 2)
  }

  test("diff classifies NEW / CHANGED / CLEARED / UNCHANGED (S9)") {
    val oldDf = Seq(("k1", 1, "v1", "s"), ("k2", 1, "v2", "s"),
      ("k2", 2, "v2-last", "s"), ("k3", 1, "gone", "s"))
      .toDF("k", "ord", "a", "b")
    val newDf = Seq(
      ("k1", "v1", "s"),      // unchanged / unchanged
      ("k2", "CHANGED!", "s"), // changed vs keep-LAST value
      ("k3", "", "s"),        // cleared
      ("k4", "brand", "new")) // new key -> NEW for every column
      .toDF("k", "a", "b")
    val out = DiffEngine.diff(oldDf, newDf, "k", "ord", Seq("a", "b"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(4)).toMap
    assert(out(("k1", "a")) == "UNCHANGED")
    assert(out(("k2", "a")) == "CHANGED")
    assert(out(("k2", "b")) == "UNCHANGED")
    assert(out(("k3", "a")) == "CLEARED")
    assert(out(("k4", "a")) == "NEW")
    assert(out(("k4", "b")) == "NEW")
  }

  test("diffTyped returns the typed DiffCell dataset") {
    val oldDf = Seq(("k", 1, "v")).toDF("k", "ord", "a")
    val newDf = Seq(("k", "w")).toDF("k", "a")
    val cells = DiffEngine.diffTyped(oldDf, newDf, "k", "ord", Seq("a"))
      .collect()
    assert(cells.toSeq ==
      Seq(DiffEngine.DiffCell("k", "a", "v", "w", "CHANGED")))
  }

  test("diff involution: diff(x, x) is all-UNCHANGED (SURVEY §5.2)") {
    val o = Tables.orders(spark, sfDir).limit(500)
      .select(col("o_orderkey").cast("string").as("k"),
        col("o_orderkey").as("ord"),
        col("o_orderpriority").as("a"), col("o_orderstatus").as("b"))
    val d = DiffEngine.diff(o, o, "k", "ord", Seq("a", "b"))
    assert(d.filter(col("status") =!= "UNCHANGED").isEmpty)
    assert(d.count() == 1000) // 500 keys x 2 compared columns
  }

  test("join decomposition law: left_outer = inner union anti-null-extended") {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir).select("o_custkey", "o_orderkey")
    val leftOuter = c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .select("c_custkey", "o_orderkey")
    val inner = c.join(o, col("c_custkey") === col("o_custkey"), "inner")
      .select("c_custkey", "o_orderkey")
    val antiExtended = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit(null).cast("long").as("o_orderkey"))
    assert(leftOuter.exceptAll(inner.unionAll(antiExtended)).isEmpty)
    assert(inner.unionAll(antiExtended).exceptAll(leftOuter).isEmpty)
  }

  test("diff old_value reflects keep-last dedup (Compare.py:62)") {
    val oldDf = Seq(("k", 1, "first"), ("k", 2, "second")).toDF("k", "ord", "a")
    val newDf = Seq(("k", "third")).toDF("k", "a")
    val Row(_, _, oldV: String, newV: String, status: String) =
      DiffEngine.diff(oldDf, newDf, "k", "ord", Seq("a")).collect()(0)
    assert(oldV == "second" && newV == "third" && status == "CHANGED")
  }
}
