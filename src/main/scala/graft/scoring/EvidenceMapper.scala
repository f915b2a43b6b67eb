package graft.scoring

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Evidence-weighted dimension scoring (reference:
  * app/scoring_engine/evidence_mapper.py:159-213).
  *
  * score_dim  = Σ(raw·conf·rel·w) / Σ(w·conf·rel)
  * conf_dim   = Σ(conf·rel·w) / Σ(w)
  * no evidence → score 50.0 / confidence 0.5 (reference defaults).
  *
  * Input: one row per evidence item per (entity_id, dimension) with columns
  * `raw_score`, `confidence`, `relevance`, `weight`. Single groupBy shuffle;
  * partial aggregation keeps 100 TB evidence map-side reduced.
  */
object EvidenceMapper {
  def dimensionScores(evidence: DataFrame): DataFrame = {
    val eff = col("weight") * col("confidence") * col("relevance")
    evidence.groupBy("entity_id", "dimension")
      .agg(sum(col("raw_score") * eff).as("num"),
           sum(eff).as("den"),
           sum(col("weight")).as("wsum"))
      .select(col("entity_id"), col("dimension"),
        when(col("den") > 0.0, col("num") / col("den")).otherwise(lit(50.0)).as("score"),
        when(col("wsum") > 0.0,
          least(lit(0.95), col("den") / col("wsum"))).otherwise(lit(0.5)).as("confidence"))
  }
}
