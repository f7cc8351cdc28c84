package graft

import org.apache.spark.sql.functions._

import graft.sources.Layout

/** Z-order clustered layout: interleave correctness, and the property
  * the layout exists for — parquet per-file min/max stats prune files
  * for range predicates on EITHER clustered column, where a linear
  * sort only serves its leading column. The spec measures pruning the
  * way a reader would: which files' [min,max] interval intersects the
  * query range.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue2 interleaves bits: a on even positions, b on odd") {
    // a=3 (bits 0,1 -> z bits 0,2 = 5), b=5 (bits 0,2 -> z bits 1,5 = 34)
    val out = Seq((3L, 5L)).toDF("a", "b")
      .select(Layout.zValue2($"a", $"b")).as[Long].collect()(0)
    assert(out == 39L)
    // max grid point maps to all 32 bits set
    val full = Seq((65535L, 65535L)).toDF("a", "b")
      .select(Layout.zValue2($"a", $"b")).as[Long].collect()(0)
    assert(full == 0xFFFFFFFFL)
    // inputs beyond 16 bits are masked, not corrupted
    val masked = Seq((65536L + 3L, 0L)).toDF("a", "b")
      .select(Layout.zValue2($"a", $"b")).as[Long].collect()(0)
    assert(masked == 5L)
  }

  test("z-order locality: adjacent grid points differ in low z bits") {
    // points within one 4x4 grid cell share all but the low 4 z bits,
    // so a curve segment covers a compact 2-D box
    val cell = for (a <- 0L to 3L; b <- 0L to 3L) yield (a, b)
    val zs = cell.toDF("a", "b")
      .select(Layout.zValue2($"a", $"b")).as[Long].collect()
    assert(zs.toSet == (0L to 15L).toSet)
  }

  test("z-ordered files prune on the NON-leading dimension; linear sort cannot") {
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_partkey", $"l_extendedprice")
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString

    // layout A: linear sort on l_orderkey (the classic single-key sort)
    li.repartitionByRange(16, $"l_orderkey")
      .sortWithinPartitions($"l_orderkey")
      .write.mode("overwrite").parquet(s"$base/linear")
    // layout B: Z-ordered on (l_orderkey, l_partkey)
    Layout.writeZOrdered(li, s"$base/zorder", "l_orderkey", "l_partkey", 16)

    // a reader prunes a file when the query range misses [min, max]
    def filesIntersecting(path: String, lo: Long, hi: Long): (Long, Long) = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min($"l_partkey").as("mn"), max($"l_partkey").as("mx"))
      (stats.count(),
        stats.filter($"mx" >= lo && $"mn" <= hi).count())
    }
    val Row = li.agg(min($"l_partkey"), max($"l_partkey")).collect()(0)
    val (pLo, pHi) = (Row.getLong(0), Row.getLong(1))
    // a narrow band (~10% of the partkey domain), placed INSIDE one
    // top-level quadrant: a band straddling the domain midpoint touches
    // both halves of the curve by construction (the curve's top partkey
    // bit flips there) and is the layout's documented worst case
    val lo = pLo + (pHi - pLo) * 26 / 100
    val hi = pLo + (pHi - pLo) * 36 / 100

    val (nLin, hitLin) = filesIntersecting(s"$base/linear", lo, hi)
    val (nZ, hitZ) = filesIntersecting(s"$base/zorder", lo, hi)
    // the orderkey-sorted layout scatters partkey across every file:
    // (almost) nothing prunes
    assert(nLin >= 12 && hitLin >= nLin - 1,
      s"linear: $hitLin of $nLin files intersect")
    // the z-ordered layout confines the band to a minority of files
    assert(hitZ * 2 <= nZ, s"zorder: $hitZ of $nZ files intersect")
    // and both layouts return the same rows
    val a = spark.read.parquet(s"$base/linear")
      .filter($"l_partkey".between(lo, hi)).count()
    val b = spark.read.parquet(s"$base/zorder")
      .filter($"l_partkey".between(lo, hi)).count()
    assert(a == b && a > 0)
  }
}
