package graft.scoring

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import ScoringConfig.TalentPenaltyConfig

/** Herfindahl–Hirschman concentration + penalty factor (reference:
  * app/scoring_engine/talent_penalty.py:126-188).
  *
  * HHI = Σ_c (n_c / n_total)²  over categories c per entity.
  * penalty: n<minSample → 1.0; hhi≥severe → factorSevere; hhi≥mild →
  * factorMild; else 1.0.
  *
  * Two-level aggregation = two shuffles on the same key prefix
  * (entity,category) then (entity); Spark collapses the second into a
  * near-free re-agg because the child partitioning (hash on entity,category)
  * is not reusable — at 100 TB pre-partition the signals table by entity to
  * make the second agg shuffle-free.
  */
object TalentPenalty {

  /** df: one row per observation with (entity_id, category). */
  def hhi(df: DataFrame): DataFrame =
    hhiFromCounts(
      df.groupBy("entity_id", "category").agg(count(lit(1)).as("n_cat")))

  /** Same, starting from pre-aggregated per-(entity, category) counts —
    * lets the scoring pipeline reuse its dims frame instead of re-scanning
    * events. */
  def hhiFromCounts(counts: DataFrame): DataFrame =
    counts.groupBy("entity_id")
      .agg(sum("n_cat").cast("long").as("n_total"),
           sum(col("n_cat") * col("n_cat")).as("sq"))
      .select(col("entity_id"), col("n_total"),
        (col("sq").cast("double") / (col("n_total") * col("n_total")).cast("double")).as("hhi"))

  def penaltyFactor(hhi: Column, nTotal: Column,
      cfg: TalentPenaltyConfig = ScoringConfig.DefaultTalentPenalty): Column =
    when(nTotal < cfg.minSampleSize, lit(1.0))
      .when(hhi >= cfg.hhiSevere, lit(cfg.factorSevere))
      .when(hhi >= cfg.hhiMild, lit(cfg.factorMild))
      .otherwise(lit(1.0))
}
