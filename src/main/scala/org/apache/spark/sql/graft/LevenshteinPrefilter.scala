package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: guard `levenshtein(a, b) <= k` predicates with the free
  * length lower bound.
  *
  * Edit distance is at least the length difference, so
  * `levenshtein(a, b) <= k` implies `abs(length(a) - length(b)) <= k`.
  * The implied bound costs two length reads per row while the Levenshtein
  * DP is O(len(a)·len(b)); `And` short-circuits inside codegen, so rows
  * pruned by the bound never run the DP at all. On a blocked fuzzy join
  * (q_fuzzy_neardup_join-style) this is the difference between running the
  * DP on every candidate pair and only on length-compatible ones — the
  * same prefilter a careful author writes by hand, applied automatically
  * to any plan that forgot it.
  *
  * Idempotent (required: user-provided rules run inside fixed-point
  * batches): a Filter whose condition already contains a semantically
  * equal bound — hand-written or added by a previous pass — is left alone.
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  private def bound(l: Expression, r: Expression, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(l), Length(r))), k)

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      // every sub-expression already present, canonicalized — covers both
      // hand-written guards and guards added by a previous fixed-point pass
      val existing: Set[Expression] =
        cond.collect { case e => e.canonicalized }.toSet
      val rewritten = cond transformUp {
        case lte @ LessThanOrEqual(lev: Levenshtein, k: Literal)
            if lev.threshold.isEmpty &&
              !existing.contains(
                bound(lev.left, lev.right, k).canonicalized) =>
          And(bound(lev.left, lev.right, k), lte)
      }
      if (rewritten.fastEquals(cond)) f else Filter(rewritten, child)
  }
}
