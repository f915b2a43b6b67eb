package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: guard `jaro_winkler(a, b) >= t` predicates with the
  * free length-ratio lower bound.
  *
  * Derivation. Matches satisfy m ≤ min(|a|, |b|), so with la = min,
  * lb = max:  jaro ≤ (m/|a| + m/|b| + 1) / 3 ≤ (2 + la/lb) / 3.
  * Winkler adds at most 0.4·(1 − jaro):  jw ≤ 0.4 + 0.6·jaro.  Chaining,
  * `jw ≥ t` implies  la/lb ≥ 5t − 4  — the length-ratio bound.  It costs
  * two length reads per row while the match loop is O(|a|·window);
  * `And` short-circuits inside codegen, so length-incompatible candidate
  * pairs never run the kernel. For t ≤ 0.8 the bound is vacuous
  * (5t − 4 ≤ 0) and the rule leaves the plan alone. This is
  * the same class of rewrite as [[LevenshteinPrefilter]] — the prefilter a
  * careful blocked-join author writes by hand, applied automatically.
  *
  * Idempotent (required inside fixed-point batches): a Filter that
  * already carries a semantically equal bound is left unchanged.
  */
object JaroWinklerPrefilter extends Rule[LogicalPlan] {

  private def bound(l: Expression, r: Expression, factor: Double): Expression =
    GreaterThanOrEqual(
      Cast(Least(Seq(Length(l), Length(r))), DoubleType),
      Multiply(Literal(factor),
        Cast(Greatest(Seq(Length(l), Length(r))), DoubleType)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val existing: Set[Expression] =
        cond.collect { case e => e.canonicalized }.toSet
      val rewritten = cond transformUp {
        case gte @ GreaterThanOrEqual(jw: JaroWinkler,
            Literal(t: Double, DoubleType))
            if 5 * t - 4 > 0 &&
              !existing.contains(
                bound(jw.left, jw.right, 5 * t - 4).canonicalized) =>
          And(bound(jw.left, jw.right, 5 * t - 4), gte)
      }
      if (rewritten.fastEquals(cond)) f else Filter(rewritten, child)
  }
}
