package graft.scoring

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Golden-range validation (reference layer-5 tests:
  * app/scoring_engine/portfolio_validation.py:10-16 — expected composite
  * ranges per calibration ticker, validated end-to-end through the formula
  * stack; scripts/validate_portfolio_scores.py:17-63).
  *
  * Config-as-data: the expected bands are a tiny broadcast table; the check
  * is one broadcast join + a status projection over the scored output. */
object PortfolioValidation {

  final case class ExpectedRange(entity_id: Long, lo: Double, hi: Double)

  /** Validate scored entities against expected bands. Returns one row per
    * expected entity: actual, bounds, in_range, and a deviation measure. */
  def validate(scores: DataFrame, scoreCol: String, entityCol: String,
      expected: Seq[ExpectedRange])(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val exp = expected.toDF()
    scores.select(col(entityCol).cast("long").as("entity_id"),
        col(scoreCol).as("actual"))
      .join(broadcast(exp), "entity_id")
      .withColumn("in_range", col("actual") >= col("lo") && col("actual") <= col("hi"))
      .withColumn("deviation",
        when(col("actual") < col("lo"), col("lo") - col("actual"))
          .when(col("actual") > col("hi"), col("actual") - col("hi"))
          .otherwise(lit(0.0)))
      .orderBy("entity_id")
  }

  /** True iff every expected entity scored within its band. */
  def allInRange(report: DataFrame): Boolean =
    report.filter(!col("in_range")).isEmpty
}

/** Board-governance scorer (reference M16: board_analyzer.py:57-129 —
  * additive: base 20, +15 tech committee, +20 AI expertise, +15 data
  * officer, +10 independence>0.5, +10 risk-tech, +10 AI-in-strategy, cap
  * 100; confidence = min(0.5 + members/20, 0.95)). Inputs are the feature
  * columns extracted by graft.text.HtmlText. */
object BoardScorer {

  def score(hasTechCommittee: org.apache.spark.sql.Column,
      hasAiExpertise: org.apache.spark.sql.Column,
      hasDataOfficer: org.apache.spark.sql.Column,
      independenceRatio: org.apache.spark.sql.Column,
      hasRiskTech: org.apache.spark.sql.Column,
      hasAiStrategy: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    least(lit(100.0),
      lit(20.0)
        + when(hasTechCommittee, 15.0).otherwise(0.0)
        + when(hasAiExpertise, 20.0).otherwise(0.0)
        + when(hasDataOfficer, 15.0).otherwise(0.0)
        + when(independenceRatio > 0.5, 10.0).otherwise(0.0)
        + when(hasRiskTech, 10.0).otherwise(0.0)
        + when(hasAiStrategy, 10.0).otherwise(0.0))

  def confidence(nMembers: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    least(lit(0.95), lit(0.5) + nMembers.cast("double") / lit(20.0))

  /** Full extraction + scoring over raw board-proxy text (F15 + M16). */
  def scoreBoardText(df: DataFrame, textCol: String): DataFrame = {
    import graft.text.{HtmlText, KeywordMatch}
    val text = col(textCol)
    df.withColumn("committees", HtmlText.extractCommittees(text))
      .withColumn("names", HtmlText.extractNames(text))
      .withColumn("n_members", size(col("names")))
      .withColumn("board_score", score(
        array_contains(col("committees"), "technology committee"),
        KeywordMatch.wordBoundary(text, "ai expertise") ||
          KeywordMatch.wordBoundary(text, "artificial intelligence"),
        KeywordMatch.wordBoundary(text, "chief data officer"),
        when(KeywordMatch.wordBoundary(text, "independent directors"), 0.6)
          .otherwise(0.0),
        array_contains(col("committees"), "risk committee") &&
          KeywordMatch.substringMatch(text, "technology"),
        KeywordMatch.wordBoundary(text, "ai strategy")))
      .withColumn("board_confidence", confidence(col("n_members")))
  }
}
