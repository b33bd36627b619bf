package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite a thresholded levenshtein predicate
  * `levenshtein(a, b) <= k` (any of the four `<=`/`<`/reversed
  * orientations) into the conjunction
  *
  * {{{ abs(length(a) - length(b)) <= k  AND  levenshtein(a, b, k) >= 0 }}}
  *
  * Two lossless wins, applied automatically to every SQL/DataFrame
  * query on a session built with `graft.GraftExtensions`:
  *
  *  1. '''Length gate''': edit distance is bounded below by the length
  *     difference, so the cheap gate (a few codegen'd instructions)
  *     short-circuits `And` before the O(m·n) DP ever runs — the same
  *     prefilter [[graft.ops.Joins.fuzzyPairs]] writes by hand, now
  *     applied to any user predicate, including join conditions (the
  *     fuzzy-join shape where the predicate runs once per candidate
  *     PAIR and the DP dominates the stage profile).
  *  2. '''Banded DP''': Spark's three-arg `levenshtein(a, b, k)` stops
  *     at distance k and returns -1 past it — O(k·min(m,n)) instead of
  *     O(m·n) — and `banded >= 0` is exactly `full <= k`. Null
  *     semantics are unchanged (both forms are null-intolerant, and
  *     `And(null, null) = null = original`).
  *
  * Idempotent by construction: the rewrite only matches a Levenshtein
  * WITHOUT a threshold, and produces one WITH a threshold — a second
  * optimizer pass finds nothing to do. Lower-bound predicates
  * (`levenshtein >= k`) are left alone: banding cannot serve them.
  * Non-deterministic operands are left alone too: the rewrite
  * duplicates `a`/`b` into the length gate, and two evaluations of a
  * non-deterministic expression can disagree between the gate and the
  * DP (the same `.deterministic` guard built-in rules apply before
  * duplicating expressions).
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  private def det(a: Expression, b: Expression): Boolean =
    a.deterministic && b.deterministic

  private def rewrite(a: Expression, b: Expression, k: Int): Expression = {
    val kLit = Literal(k, IntegerType)
    val lenGate = LessThanOrEqual(
      Abs(Subtract(Length(a), Length(b))), kLit)
    val banded = GreaterThanOrEqual(
      Levenshtein(a, b, Some(kLit)), Literal(0, IntegerType))
    And(lenGate, banded)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 0 && det(a, b) => rewrite(a, b, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 0 && det(a, b) => rewrite(a, b, k)
      // strict bound: lev < k  ⇔  lev <= k-1 (distances are integers)
      case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 1 && det(a, b) => rewrite(a, b, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 1 && det(a, b) => rewrite(a, b, k - 1)
    }
}
