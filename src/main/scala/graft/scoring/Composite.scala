package graft.scoring

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Composite score + banding (reference: app/scoring_engine/composite.py).
  *
  * preferred path (composite.py:55-68, invoked run_scoring_engine.py:444-450):
  *   composite = (1−β)·(α·VR + (1−α)·HR) + β·Synergy, clamped [0,100]
  * legacy path (composite.py:37-53):
  *   composite = (VR + bonus) · penalty, clamped [0,100]
  * banding (composite.py:17-34): ≤20 Nascent, ≤40 Developing, ≤60 Progressing,
  * ≤80 Advanced, else Leading.
  */
object Composite {

  def clamp01To100(x: Column): Column = least(lit(100.0), greatest(lit(0.0), x))

  def preferred(vr: Column, hr: Column, synergy: Column,
      alpha: Double = ScoringConfig.Alpha, beta: Double = ScoringConfig.Beta): Column =
    clamp01To100(
      (lit(1.0) - lit(beta)) * (lit(alpha) * vr + (lit(1.0) - lit(alpha)) * hr)
        + lit(beta) * synergy)

  def legacy(vr: Column, bonus: Column, penalty: Column): Column =
    clamp01To100((vr + bonus) * penalty)

  def band(score: Column): Column =
    ScoringConfig.BandThresholds
      .foldLeft(Option.empty[org.apache.spark.sql.Column]) { case (acc, (thr, label)) =>
        Some(acc match {
          case None => when(score <= thr, label)
          case Some(c) => c.when(score <= thr, label)
        })
      }.get.otherwise(ScoringConfig.TopBand)
}
