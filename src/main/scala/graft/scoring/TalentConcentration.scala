package graft.scoring

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Talent-concentration score + risk adjustment (reference:
  * app/scoring_engine/talent_concentration.py:20-45, 93-100).
  *
  * TC = clamp(0.4·leadership_ratio + 0.3·team_size_factor
  *          + 0.2·skill_concentration + 0.1·individual_factor, 0, 1)
  *   team_size_factor    = min(1, 1/(√n + 0.1))
  *   skill_concentration = max(0, 1 − n_unique_skills/15)
  * adjustment = clamp(1 − 0.15·max(0, TC − 0.25), 0, 1).
  */
object TalentConcentration {

  def teamSizeFactor(n: Column): Column =
    least(lit(1.0), lit(1.0) / (sqrt(n.cast("double")) + lit(0.1)))

  def skillConcentration(nUniqueSkills: Column): Column =
    greatest(lit(0.0), lit(1.0) - nUniqueSkills.cast("double") / lit(15.0))

  def tcScore(leadershipRatio: Column, nPeople: Column, nUniqueSkills: Column,
      individualFactor: Column): Column =
    least(lit(1.0), greatest(lit(0.0),
      lit(0.4) * leadershipRatio + lit(0.3) * teamSizeFactor(nPeople)
        + lit(0.2) * skillConcentration(nUniqueSkills) + lit(0.1) * individualFactor))

  def riskAdjustment(tc: Column): Column =
    least(lit(1.0), greatest(lit(0.0),
      lit(1.0) - lit(0.15) * greatest(lit(0.0), tc - lit(0.25))))
}
