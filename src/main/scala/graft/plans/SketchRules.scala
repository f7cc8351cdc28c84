package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Rewrites null / emptiness predicates over the native sketch
  * expressions into their documented cheap equivalents.
  *
  * Why this exists: Catalyst pushes a `.filter($"sig".isNotNull)` below
  * the projection that computed `sig` (PushDownPredicates substitutes
  * the alias), and `InferFiltersFromGenerate` synthesizes
  * `size(word_shingles(text)) > 0 AND isnotnull(word_shingles(text))`
  * under every `explode` — in both cases the full sketch runs once in
  * the filter (twice for the inferred pair) and AGAIN in the
  * projection, per row, in the scan stage. That double evaluation was
  * the whole of the r4 q_minhash_pairs 1.64x regression, worked around
  * operator-by-operator with a manual token-count pre-filter
  * (`Dedup.hasMinTokens`). This rule applies the same rewrite at the
  * optimizer level, so ANY query — SQL via the registered functions,
  * ad-hoc DataFrame code, the inferred Generate guards — gets the cheap
  * predicate without knowing the trick.
  *
  * The rewrites restate each expression's documented null contract
  * (pinned by ExtensionsSpec against the expressions themselves):
  *   - `minhash_signature(t, k, n)` is null iff `t` is null or has
  *     fewer than n whitespace tokens;
  *   - `word_shingles(t, n)` is null iff `t` is null, and EMPTY (not
  *     null) iff `t` has fewer than n tokens;
  *   - `simhash64(t)` is null iff `t` is null.
  *
  * Runs in the operator-optimization batches (fixed point), so
  * predicates synthesized by the infer rules in between are caught too.
  */
object SketchFilterSimplify extends Rule[LogicalPlan] {

  /** size(split(trim(t), "\s+")) — the same tokenizer the sketch
    * expressions run ([[TextExpressions.tokenize]]). */
  private def tokCount(t: Expression): Expression =
    Size(StringSplit(new StringTrim(t), Literal("\\s+"), Literal(-1)))

  /** t IS NOT NULL AND trim(t) <> '' AND tokens(t) >= n. The trim
    * guard covers n = 1: java split("") returns [""], tokenize returns
    * the empty array. */
  private def hasMinTokens(t: Expression, n: Int): Expression =
    And(And(IsNotNull(t), Not(EqualTo(new StringTrim(t), Literal("")))),
      GreaterThanOrEqual(tokCount(t), Literal(n)))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case IsNotNull(MinHashSig(t, _, n)) => hasMinTokens(t, n)
      // three-valued logic holds: null t -> And short-circuits false ->
      // Not(...) true, matching IsNull on a null signature
      case IsNull(MinHashSig(t, _, n)) => Not(hasMinTokens(t, n))
      case IsNotNull(WordShingles(t, _)) => IsNotNull(t)
      case IsNotNull(SimHash64(t)) => IsNotNull(t)
      case GreaterThan(Size(WordShingles(t, n), _),
          Literal(0, org.apache.spark.sql.types.IntegerType)) =>
        hasMinTokens(t, n)
    }
}
