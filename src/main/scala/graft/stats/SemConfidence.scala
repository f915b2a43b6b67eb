package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SEM confidence interval, Spearman–Brown path (reference:
  * app/scoring_engine/sem_confidence.py:316-383; correlation matrix :344-368).
  *
  *   r̄   = mean pairwise Pearson r over the k dimension columns, clamped [0, 0.99]
  *   ρ   = k·r̄ / (1 + (k−1)·r̄)            (Spearman–Brown prophecy)
  *   σ   = max(1, stddev_samp)              (per entity, over its item scores)
  *   SEM = max(0.5, σ·√(1−ρ));  CI = x ± 1.96·SEM
  *
  * The correlation matrix is computed as k·(k−1)/2 `corr` aggregates in ONE
  * pass over the wide score table (single agg, no MLlib assembly needed at
  * this width); at 100 TB this is a full scan + scalar reduce — optimal.
  */
object SemConfidence {

  /** wide: one row per entity, one column per dimension in `dims`.
    * Returns a 1-row DataFrame (avg_r, rho, n_items). */
  def reliability(wide: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.size >= 2, "need ≥2 item columns")
    val pairs = dims.combinations(2).toSeq
    val corrCols = pairs.map { case Seq(a, b) => corr(col(a), col(b)) }
    val sumCorr = corrCols.reduce(_ + _)
    val k = dims.size
    wide.agg((sumCorr / lit(pairs.size.toDouble)).as("raw_r"))
      .select(least(lit(0.99), greatest(lit(0.0), col("raw_r"))).as("avg_r"))
      .withColumn("rho",
        (lit(k.toDouble) * col("avg_r")) / (lit(1.0) + lit((k - 1).toDouble) * col("avg_r")))
      .withColumn("n_items", lit(k))
  }

  /** Adds sem/ci columns given per-entity `sigma` and scalar `rho` columns
    * (attach `reliability` output via a broadcast crossJoin). */
  def semBounds(df: DataFrame, scoreCol: String, sigmaCol: String,
      rhoCol: String, z: Double = 1.96): DataFrame = {
    val sem = greatest(lit(0.5),
      greatest(lit(1.0), col(sigmaCol)) * sqrt(lit(1.0) - col(rhoCol)))
    df.withColumn("sem", sem)
      .withColumn("ci_lower", col(scoreCol) - lit(z) * col("sem"))
      .withColumn("ci_upper", col(scoreCol) + lit(z) * col("sem"))
  }
}
