package graft.scoring

/** Config-as-data for the scoring stack.
  *
  * Mirrors the reference's seeded configuration semantics (values cited from
  * /root/reference/pe-org-air-platform):
  *   - composite constants α=0.60 β=0.12 — scripts/run_scoring_engine.py:444-450
  *   - synergy cap ±15, rule thresholds/magnitudes — scripts/seed_scoring_config.py:50-56
  *   - confidence floor 0.20 — app/scoring_engine/vr_model.py:54
  *   - HHI thresholds .40/.70 → factors .95/.85, min sample 15 —
  *     app/scoring_engine/talent_penalty.py:56-64
  *   - talent-risk adjustment 1−0.15·max(0,TC−0.25) —
  *     app/scoring_engine/talent_concentration.py:93-100
  *   - score bands at 20/40/60/80 — app/scoring_engine/composite.py:17-34
  *
  * At cluster scale these literals are broadcast with the plan (tiny), never
  * shuffled; larger rule tables would become broadcast-joined DataFrames.
  */
object ScoringConfig {
  val Alpha = 0.60
  val Beta = 0.12
  val ConfidenceFloor = 0.20
  val SynergyCap = 15.0
  val CvPenaltyRate = 0.25

  final case class SynergyRule(
      dimA: String, dimB: String, kind: String, threshold: Double, magnitude: Double)

  final case class TalentPenaltyConfig(
      hhiMild: Double = 0.40, hhiSevere: Double = 0.70,
      factorMild: Double = 0.95, factorSevere: Double = 0.85,
      minSampleSize: Int = 15)

  val DefaultTalentPenalty: TalentPenaltyConfig = TalentPenaltyConfig()

  /** Band thresholds: <=20 Nascent, <=40 Developing, <=60 Progressing,
    * <=80 Advanced, else Leading (composite.py:17-34 semantics —
    * inclusive upper boundary at each threshold). */
  val BandThresholds: Seq[(Double, String)] = Seq(
    20.0 -> "Nascent", 40.0 -> "Developing", 60.0 -> "Progressing",
    80.0 -> "Advanced")
  val TopBand = "Leading"
}
