package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Pairwise-complete Pearson r as ONE agg expression built from guarded
    * raw moments. Spark 4's ANSI-mode `corr` throws DIVIDE_BY_ZERO on a
    * constant column (Corr.evaluateExpression divides by a zero co-moment);
    * this returns null instead — the same degenerate-case contract as
    * DuckDB's corr and numpy's NaN (which the reference filters out). */
  private def pairCorr(aName: String, bName: String): Column = {
    val a = col(aName).cast("double"); val b = col(bName).cast("double")
    val both = a.isNotNull && b.isNotNull
    val av = when(both, a); val bv = when(both, b)
    val n = count(when(both, lit(1))).cast("double")
    val sa = sum(av); val sb = sum(bv)
    val saa = sum(av * av); val sbb = sum(bv * bv); val sab = sum(av * bv)
    val vx = saa - sa * sa / n
    val vy = sbb - sb * sb / n
    val cv = sab - sa * sb / n
    when(n >= 2, when(vx > 0 && vy > 0, cv / sqrt(vx * vy)))
  }

  /** wide: one row per entity, one column per dimension in `dims`.
    * Returns a 1-row DataFrame (avg_r, rho, n_items).
    *
    * Averages only the VALID pairwise correlations (a constant dimension
    * yields a null r, which must not poison the mean), falls back to
    * 0.50 when none are valid, and clamps BOTH avg_r and rho to [0, 0.99] —
    * sem_confidence.py:349-362 exactly. */
  def reliability(wide: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.size >= 2, "need ≥2 item columns")
    val pairs = dims.combinations(2).toSeq
    val corrCols = pairs.zipWithIndex.map { case (Seq(a, b), i) =>
      pairCorr(a, b).as(s"c$i")
    }
    val k = dims.size
    val validN = pairs.indices.map(i => when(col(s"c$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    val validSum = pairs.indices.map(i => coalesce(col(s"c$i"), lit(0.0)))
      .reduce(_ + _)
    wide.agg(corrCols.head, corrCols.tail: _*)
      .select(least(lit(0.99), greatest(lit(0.0),
        when(validN > 0, validSum / validN.cast("double")).otherwise(lit(0.50))))
        .as("avg_r"))
      .withColumn("rho",
        least(lit(0.99), greatest(lit(0.0),
          (lit(k.toDouble) * col("avg_r"))
            / (lit(1.0) + lit((k - 1).toDouble) * col("avg_r")))))
      .withColumn("n_items", lit(k))
  }

  /** Adds sem/ci columns given per-entity `sigma` and scalar `rho` columns
    * (attach `reliability` output via a broadcast crossJoin). CI bounds are
    * clamped to [0, 100] like the reference (sem_confidence.py:367-368 —
    * the reference also rounds to 2 decimals there; rounding is left to the
    * presentation layer here, the queries round at 4). */
  def semBounds(df: DataFrame, scoreCol: String, sigmaCol: String,
      rhoCol: String, z: Double = 1.96): DataFrame = {
    val sem = greatest(lit(0.5),
      greatest(lit(1.0), col(sigmaCol))
        * sqrt(greatest(lit(0.0), lit(1.0) - col(rhoCol))))
    df.withColumn("sem", sem)
      .withColumn("ci_lower",
        least(lit(100.0), greatest(lit(0.0), col(scoreCol) - lit(z) * col("sem"))))
      .withColumn("ci_upper",
        least(lit(100.0), greatest(lit(0.0), col(scoreCol) + lit(z) * col("sem"))))
  }
}
