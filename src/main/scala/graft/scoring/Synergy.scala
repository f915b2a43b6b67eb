package graft.scoring

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import ScoringConfig.SynergyRule

/** Synergy operators (reference: app/scoring_engine/synergy.py).
  *
  * Rule synergy (synergy.py:70-129): for each configured rule over two
  * dimension scores —
  *   positive: both ≥ threshold        → +magnitude
  *   negative: a ≥ thr AND b < thr     → −|magnitude|
  * total capped at ±SynergyCap.
  *
  * Formula synergy (synergy.py:132-156):
  *   Synergy = (VR·HR/100) · Align · Timing
  *   Align  = clamp(1 − |VR−HR|/100, 0, 1)
  *   Timing = clamp(timing, 0.8, 1.2);  result clamped [0,100].
  *
  * Rules are a handful of literals — they fold into the plan (broadcast by
  * construction); the per-entity evaluation is a pure projection, no shuffle.
  */
object Synergy {

  /** `wide` has one row per entity with one column per dimension score. */
  def ruleSynergy(wide: DataFrame, rules: Seq[SynergyRule],
      cap: Double = ScoringConfig.SynergyCap): DataFrame = {
    val contributions: Seq[Column] = rules.map { r =>
      val a = col(r.dimA); val b = col(r.dimB)
      r.kind match {
        case "positive" =>
          when(a >= r.threshold && b >= r.threshold, lit(r.magnitude)).otherwise(lit(0.0))
        case "negative" =>
          when(a >= r.threshold && b < r.threshold, lit(-math.abs(r.magnitude))).otherwise(lit(0.0))
        case other => throw new IllegalArgumentException(s"unknown synergy kind: $other")
      }
    }
    val total = contributions.reduceOption(_ + _).getOrElse(lit(0.0))
    wide.withColumn("synergy_bonus", least(lit(cap), greatest(lit(-cap), total)))
  }

  def alignment(vr: Column, hr: Column): Column =
    least(lit(1.0), greatest(lit(0.0), lit(1.0) - abs(vr - hr) / lit(100.0)))

  def formulaSynergy(vr: Column, hr: Column, timing: Column): Column = {
    val t = least(lit(1.2), greatest(lit(0.8), timing))
    least(lit(100.0), greatest(lit(0.0), (vr * hr / lit(100.0)) * alignment(vr, hr) * t))
  }
}
