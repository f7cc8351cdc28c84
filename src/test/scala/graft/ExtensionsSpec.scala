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
        |       word_shingles('a b c d', 2) AS ws,
        |       char_bigrams('abc') AS cb,
        |       srp_signature(array(CAST(1.0 AS FLOAT),
        |                           CAST(0.5 AS FLOAT)), 4) AS srp"""
        .stripMargin)
      .as[(Long, Int, Seq[String], Seq[String], Long)].collect()(0)
    assert(r._2 == 16)
    assert(r._3 == Seq("a b", "b c", "c d"))
    assert(r._4 == Seq("ab", "bc"))
    // SQL value equals the Column-API value
    val fromCol = Seq("a b c").toDF("t")
      .select(graft.operators.Dedup.simhash($"t")).collect()(0).getLong(0)
    assert(r._1 == fromCol)
    val srpFromCol = Seq(Array(1.0f, 0.5f)).toDF("v")
      .select(graft.operators.Similarity.srpSignature($"v", 4))
      .collect()(0).getLong(0)
    assert(r._5 == srpFromCol)
  }

  test("GraftExtensions wires injection without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
