package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.plans.{GraftExtensions, TextExpressions}

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registerAll exposes the native expressions to SQL") {
    TextExpressions.registerAll(spark)
    val r = spark.sql(
      """SELECT simhash64('a b c') AS sh,
        |       size(minhash_signature('a b c d e', 16, 3)) AS mh_len,
        |       word_shingles('a b c d', 2) AS ws""".stripMargin)
      .as[(Long, Int, Seq[String])].collect()(0)
    assert(r._2 == 16)
    assert(r._3 == Seq("a b", "b c", "c d"))
    // SQL value equals the Column-API value
    val fromCol = Seq("a b c").toDF("t")
      .select(graft.operators.Dedup.simhash($"t")).collect()(0).getLong(0)
    assert(r._1 == fromCol)
  }

  test("GraftExtensions wires injection without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
