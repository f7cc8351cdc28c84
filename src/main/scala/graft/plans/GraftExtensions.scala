package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's native expressions as SQL
  * functions, for deployments that configure
  * `spark.sql.extensions=graft.plans.GraftExtensions`:
  *
  * {{{
  *   SELECT doc_id, minhash_signature(text, 32, 3), simhash64(text)
  *   FROM documents
  * }}}
  *
  * (Per-session alternative without extensions:
  * [[TextExpressions.registerAll]].)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, default: Int): Int =
    Option(e).map(_.eval().asInstanceOf[Int]).getOrElse(default)

  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer rule: pushed-down / inferred null-emptiness predicates
    // over the sketch expressions become cheap token-count predicates
    // (see [[SketchFilterSimplify]] for the double-evaluation story)
    ext.injectOptimizerRule(_ => SketchFilterSimplify)
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_signature"),
      (exprs: Seq[Expression]) => MinHashSig(exprs.head,
        exprs.lift(1).map(_.eval().asInstanceOf[Int]).getOrElse(32),
        exprs.lift(2).map(_.eval().asInstanceOf[Int]).getOrElse(3))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) => WordShingles(exprs.head,
        exprs.lift(1).map(_.eval().asInstanceOf[Int]).getOrElse(3))))
    ext.injectFunction((
      FunctionIdentifier("char_bigrams"),
      new ExpressionInfo(classOf[CharBigrams].getName, "char_bigrams"),
      (exprs: Seq[Expression]) => CharBigrams(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("srp_signature"),
      new ExpressionInfo(classOf[SrpSignature].getName, "srp_signature"),
      (exprs: Seq[Expression]) => SrpSignature(exprs.head,
        exprs.lift(1).map(_.eval().asInstanceOf[Int]).getOrElse(8))))
    ext.injectFunction((
      FunctionIdentifier("id_pairs"),
      new ExpressionInfo(classOf[IdPairs].getName, "id_pairs"),
      (exprs: Seq[Expression]) => IdPairs(exprs.head)))
  }
}
