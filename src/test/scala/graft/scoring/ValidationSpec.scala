package graft.scoring

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ValidationSpec extends SparkSpec {
  import spark.implicits._

  test("portfolio validation flags out-of-band scores with deviation") {
    implicit val s = spark
    val scores = Seq((1L, 90.0), (2L, 70.0), (3L, 30.0)).toDF("entity_id", "score")
    val expected = Seq(
      PortfolioValidation.ExpectedRange(1L, 84, 94),  // in range
      PortfolioValidation.ExpectedRange(2L, 55, 66),  // above
      PortfolioValidation.ExpectedRange(3L, 34, 45))  // below
    val report = PortfolioValidation.validate(scores, "score", "entity_id", expected)
    val rows = report.collect()
    assert(rows.map(_.getAs[Boolean]("in_range")).toSeq == Seq(true, false, false))
    assert(math.abs(rows(1).getAs[Double]("deviation") - 4.0) < 1e-12)
    assert(math.abs(rows(2).getAs[Double]("deviation") - 4.0) < 1e-12)
    assert(!PortfolioValidation.allInRange(report))
    assert(PortfolioValidation.allInRange(report.filter(col("entity_id") === 1)))
  }

  test("full-pipeline golden check: sf0.001 final scores stay in sane bands") {
    implicit val s = spark
    val scores = ScorePipeline.fullScores(spark, "/root/testdata/sf0.001")
    val n = scores.count()
    // every entity scored, bounded, with a CI that brackets the score
    assert(n > 0)
    val bad = scores.filter(
      col("final_score") < 0 || col("final_score") > 100 ||
        col("ci_lower") > col("final_score") || col("ci_upper") < col("final_score"))
    assert(bad.isEmpty)
  }

  test("board scorer: additive components, cap, confidence") {
    // single-line phrases: the word-boundary matcher (correctly) does not
    // match phrases broken across hard line wraps — real ingest normalizes
    // whitespace first via HtmlText.htmlToText
    val text = "The board's Technology Committee oversees AI Strategy. " +
      "Jane Smith and John Does serve as independent directors; " +
      "our Chief Data Officer reports quarterly. " +
      "Artificial Intelligence expertise is a priority. " +
      "The Risk Committee reviews technology matters."
    val out = BoardScorer.scoreBoardText(Seq(Tuple1(text)).toDF("text"), "text")
      .select("board_score", "board_confidence", "n_members").collect().head
    // 20 base +15 tech +20 AI +15 CDO +10 indep +10 risk-tech +10 strategy = 100
    assert(out.getDouble(0) === 100.0)
    assert(out.getDouble(1) > 0.5 && out.getDouble(1) <= 0.95)
    val none = BoardScorer.scoreBoardText(Seq(Tuple1("nothing here")).toDF("text"), "text")
      .select("board_score").collect().head.getDouble(0)
    assert(none === 20.0)
  }
}
