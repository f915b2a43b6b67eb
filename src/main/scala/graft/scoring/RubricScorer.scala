package graft.scoring

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rubric scoring (reference: app/scoring_engine/rubric_scorer.py:169-217;
  * band interpolation :162-166; confidence :210-213; fallback :214-217).
  *
  * Per (entity, dimension) feature row (keyword `hits`, quantitative
  * `metric` in [0,1]) the scorer descends levels L5→L1; a level passes iff
  * hits ≥ min_matches AND metric ≥ quant_threshold; the score interpolates
  * inside the level band by hits/(min_matches+2) capped at 1:
  *   score = lo + (hi−lo)·min(1, hits/(min_matches+2))
  *   conf  = min(0.95, 0.50 + 0.08·hits + 0.30·metric)
  * No level passes → score 10.0, confidence 0.40.
  *
  * Pure column expressions (when-cascade) — codegen-friendly, no shuffle.
  */
object RubricScorer {

  /** (level, lo, hi, minMatches, quantThreshold), highest first. */
  final case class RubricLevel(level: Int, lo: Double, hi: Double,
      minMatches: Int, quantThreshold: Double)

  val DefaultRubric: Seq[RubricLevel] = Seq(
    RubricLevel(5, 80, 100, 8, 0.80),
    RubricLevel(4, 60, 80, 6, 0.60),
    RubricLevel(3, 40, 60, 4, 0.40),
    RubricLevel(2, 20, 40, 2, 0.20),
    RubricLevel(1, 0, 20, 1, 0.00))

  def scoreColumn(hits: Column, metric: Column,
      rubric: Seq[RubricLevel] = DefaultRubric): Column = {
    val cascade = rubric.foldLeft(Option.empty[Column]) { case (acc, l) =>
      val interp = lit(l.lo) + lit(l.hi - l.lo) *
        least(lit(1.0), hits.cast("double") / lit((l.minMatches + 2).toDouble))
      val cond = hits >= l.minMatches && metric >= l.quantThreshold
      Some(acc match {
        case None => when(cond, interp)
        case Some(c) => c.when(cond, interp)
      })
    }
    cascade.get.otherwise(lit(10.0))
  }

  def confidenceColumn(hits: Column, metric: Column): Column = {
    val passed = hits >= 1 // any level passed (L1 needs 1 hit, threshold 0)
    when(passed, least(lit(0.95),
      lit(0.50) + lit(0.08) * hits.cast("double") + lit(0.30) * metric))
      .otherwise(lit(0.40))
  }

  /** features: (entity_id, dimension, hits, metric) → adds score+confidence. */
  def score(features: DataFrame, rubric: Seq[RubricLevel] = DefaultRubric): DataFrame =
    features
      .withColumn("score", scoreColumn(col("hits"), col("metric"), rubric))
      .withColumn("confidence", confidenceColumn(col("hits"), col("metric")))
}
