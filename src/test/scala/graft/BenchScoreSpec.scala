package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench failure contract: a query that threw during ANY timed
  * iteration (recorded as NaN) must be excluded from the scored map and
  * listed under failed — never timed as if it ran (the r9 failure mode:
  * four queries throwing instantly were reported as 80-90% speedups). */
class BenchScoreSpec extends AnyFunSuite {

  test("a query with any NaN iteration is excluded and reported failed") {
    val samples = Seq(
      Seq("a" -> 1.0, "b" -> Double.NaN, "c" -> 3.0),
      Seq("a" -> 2.0, "b" -> 0.001, "c" -> 4.0))
    val (failed, results) = Bench.score(Seq("a", "b", "c"), samples)
    assert(failed == Seq("b"))
    assert(results.map(_._1) == Seq("a", "c"))
    // min/mean over both iterations for the survivors
    val a = results.find(_._1 == "a").get
    assert(a._2 == 1.0 && a._3 == 1.5)
    // the failed query's remaining sub-second "timing" contributes
    // nothing anywhere: no entry, and the total built from results
    // can only shrink when a query breaks
    assert(!results.exists(_._1 == "b"))
  }

  test("partial passes (the noisy-query extra iterations) contribute " +
    "only to the queries they carry") {
    val samples = Seq(
      Seq("a" -> 5.0, "b" -> 1.0),
      Seq("a" -> 3.0, "b" -> 2.0),
      Seq("a" -> 2.0), // extra pass: only the noisy query
      Seq("a" -> 9.0))
    val (failed, results) = Bench.score(Seq("a", "b"), samples)
    assert(failed.isEmpty)
    val a = results.find(_._1 == "a").get
    val b = results.find(_._1 == "b").get
    assert(a._2 == 2.0 && a._3 == 4.75) // min over 4, mean over 4
    assert(b._2 == 1.0 && b._3 == 1.5)  // untouched by partial passes
    // a NaN in a partial pass still condemns its query
    val (f2, _) = Bench.score(Seq("a"), samples :+ Seq("a" -> Double.NaN))
    assert(f2 == Seq("a"))
  }

  test("all-green pass scores every query with exact stats") {
    val samples = Seq(Seq("x" -> 2.0), Seq("x" -> 4.0), Seq("x" -> 3.0))
    val (failed, results) = Bench.score(Seq("x"), samples)
    assert(failed.isEmpty)
    val (_, mn, mean, sd) = results.head
    assert(mn == 2.0 && mean == 3.0)
    assert(math.abs(sd - math.sqrt(2.0 / 3)) < 1e-12)
  }
}
