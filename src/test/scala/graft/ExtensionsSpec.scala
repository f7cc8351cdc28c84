package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

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

  // --- SketchFilterSimplify (active via spark.sql.extensions on the
  // --- shared test session) ---

  private def filterConditions(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.toString
    }

  test("isNotNull(minhash_signature) filter no longer re-runs the sketch") {
    // parquet-backed (a LocalRelation would be folded away, Filter and
    // all); inline edge-case data covers behavior in the contract test
    val docs = Tables.documents(spark, sfDir)
    val q = docs
      .select($"doc_id",
        TextExpressions.minhash_signature($"text", 8, 3).as("sig"))
      .filter($"sig".isNotNull)
    // plan: the pushed-down filter references only the cheap token
    // predicate, not the sketch
    val conds = filterConditions(q)
    assert(conds.nonEmpty && conds.forall(!_.contains("minhash_signature")),
      conds.mkString("; "))
    // behavior unchanged: same rows as checking nullness in a projection
    val viaProj = docs
      .select($"doc_id",
        TextExpressions.minhash_signature($"text", 8, 3).isNotNull.as("ok"))
      .filter($"ok").count()
    assert(q.count() == viaProj)
  }

  test("explode(word_shingles) inferred guards become token predicates") {
    // project the shingles to a column FIRST, then explode the column —
    // the operator-code shape: InferFiltersFromGenerate only infers on
    // attribute generators, and predicate pushdown then substitutes the
    // alias, recreating the expensive expression inside the filter
    val q = Tables.documents(spark, sfDir)
      .select($"doc_id", TextExpressions.word_shingles($"text", 3).as("sh"))
      .select($"doc_id", explode($"sh").as("s"))
    val conds = filterConditions(q)
    assert(conds.nonEmpty && conds.forall(!_.contains("word_shingles")),
      conds.mkString("; "))
    // spot-check values on inline data (folded, but evaluates the same
    // expression)
    val rows = Seq((1L, "a b c d"), (2L, "a b"))
      .toDF("doc_id", "text")
      .select(explode(TextExpressions.word_shingles($"text", 3)).as("s"))
      .as[String].collect().sorted.toSeq
    assert(rows == Seq("a b c", "b c d"))
  }

  test("rewritten predicates pin the expressions' null contracts") {
    // implementation == rewrite equality over the contract's edge cases:
    // null, empty, whitespace-only, 1..n tokens, multi-space separators
    val edge = Seq(null.asInstanceOf[String], "", "   ", "a", "a b",
      "a b c", "a  b\tc", "a b c d").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val sig = TextExpressions.minhash_signature($"text", 8, 3)
    val viaFilter = edge.select($"id", sig.as("sig")).filter($"sig".isNotNull)
      .select($"id").as[Long].collect().toSet
    // ground truth WITHOUT the rule: evaluate the sketch and check null-
    // ness in a projection (projections are not rewritten into filters)
    val truth = edge.select($"id", sig.isNotNull.as("ok"))
      .filter($"ok").select($"id").as[Long].collect().toSet
    assert(viaFilter == truth)
    val isNullIds = edge.select($"id", sig.as("sig")).filter($"sig".isNull)
      .select($"id").as[Long].collect().toSet
    assert(isNullIds == (edge.select($"id").as[Long].collect().toSet -- truth))
  }
}
