package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.scoring.ScorePipeline

/** Serving layer (reference §3.3: GET /api/v1/scoring/results — Redis-cached
  * Snowflake window query scoring.py:224-241). In the Spark engine the
  * serving queries are views over the scored output; REST/cache are out of
  * engine scope (SURVEY.md §3.3 decision).
  */
object Views {

  /** Register the scored outputs as temp views + the two canonical serving
    * queries (`latest_scores`, `leaderboard`) as SQL-addressable views. */
  def register(spark: SparkSession, dir: String): Unit = {
    ScorePipeline.fullScores(spark, dir).createOrReplaceTempView("org_air_scores")
    spark.sql("""
      CREATE OR REPLACE TEMP VIEW leaderboard AS
      SELECT entity_id, final_score, final_band, ci_lower, ci_upper
      FROM org_air_scores
      ORDER BY final_score DESC, entity_id ASC""")
  }

  /** The full GET /scoring/results response shape (scoring.py:224-241 +
    * the _parse_breakdown nested parse :85-161), registered as a view:
    * window-latest per company + dimension_breakdown_json → nested struct
    * + band + top-N by composite. Oracle-certified end to end as
    * q_serving_results (ServingQueries). */
  def registerServingResults(spark: SparkSession, dir: String): Unit =
    graft.queries.ServingQueries.queries.find(_.name == "q_serving_results").get
      .build(spark, dir).createOrReplaceTempView("serving_results")

  /** W1 latest-per-key over an append-history table (the serving read for
    * a store with one row per (entity, run)). */
  def latestPerEntity(history: DataFrame, entityCol: String,
      orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
      .orderBy(orderCols.map(c => col(c).desc): _*)
    history.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** O3 leaderboard: top-n by score with deterministic ties. */
  def leaderboard(scores: DataFrame, scoreCol: String, entityCol: String,
      n: Int): DataFrame =
    scores.orderBy(col(scoreCol).desc, col(entityCol).asc).limit(n)
}
