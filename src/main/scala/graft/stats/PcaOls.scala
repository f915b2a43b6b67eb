package graft.stats

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.Matrix
import org.apache.spark.ml.stat.Correlation
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SEM confidence, PCA+OLS path (reference: app/scoring_engine/
  * sem_confidence.py:35-183):
  *   1. standardize the k item columns (ddof=1);
  *   2. Pearson correlation matrix → principal eigenvector; |PC1|
  *      normalized to sum 1 → loadings;
  *   3. composite factor η = X · loadings (RAW scores — sem_confidence.py:119);
  *   4. OLS y = a + b·η closed-form (residual σ ddof=2, R²);
  *   5. prediction SE = σ·√(1/n + (x0−x̄)²/Sxx); CI = ŷ ± z·SE.
  *
  * Distribution strategy: correlation + all sums are single-pass
  * DataFrame/MLlib aggregates (scale-safe); only the k×k eigen-solve runs
  * on the driver (k = #dimensions, tiny by construction).
  */
object PcaOls {

  final case class Fit(intercept: Double, slope: Double, sigma: Double,
      r2: Double, n: Long, etaMean: Double, sxx: Double,
      loadings: Array[Double])

  /** Power iteration for the dominant eigenvector of a symmetric PSD
    * matrix (correlation matrices qualify); deterministic start. */
  private def principalEigenvector(m: Matrix): Array[Double] = {
    val k = m.numCols
    var v = Array.fill(k)(1.0 / math.sqrt(k))
    var i = 0
    while (i < 200) {
      val next = Array.tabulate(k)(r =>
        (0 until k).map(c => m(r, c) * v(c)).sum)
      val norm = math.sqrt(next.map(x => x * x).sum)
      v = if (norm == 0) v else next.map(_ / norm)
      i += 1
    }
    v
  }

  /** Fit y ~ PC1(items). `items` are the feature columns; `yCol` the target. */
  def fit(df: DataFrame, items: Seq[String], yCol: String): Fit = {
    require(items.size >= 2, "need ≥2 item columns")
    // 1. standardize (sample stddev) via one agg pass
    val statsRow = df.agg(
      items.flatMap(c => Seq(avg(col(c)).as(s"m_$c"), stddev_samp(col(c)).as(s"s_$c"))).head,
      items.flatMap(c => Seq(avg(col(c)).as(s"m_$c"), stddev_samp(col(c)).as(s"s_$c"))).tail: _*)
      .collect().head
    val means = items.map(c => statsRow.getAs[Double](s"m_$c"))
    val sds = items.map(c => math.max(statsRow.getAs[Double](s"s_$c"), 1e-12))
    val std = items.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      d.withColumn(s"z_$c", (col(c) - means(i)) / sds(i))
    }
    // 2. correlation matrix (MLlib) → PC1 → |loadings| normalized to sum 1
    val assembled = new VectorAssembler()
      .setInputCols(items.map(c => s"z_$c").toArray).setOutputCol("features")
      .transform(std)
    val corrM = Correlation.corr(assembled, "features").head.getAs[Matrix](0)
    val pc1 = principalEigenvector(corrM).map(math.abs)
    val lsum = pc1.sum
    val loadings = if (lsum == 0) pc1.map(_ => 1.0 / pc1.length) else pc1.map(_ / lsum)
    // 3. η as a column expression — over the RAW item columns (loadings come
    //    from standardized data, but sem_confidence.py:113-120 does
    //    `eta = X @ loadings` on raw X; standardized-η is a different linear
    //    combination and shifts the OLS fit)
    val eta = items.zipWithIndex
      .map { case (c, i) => col(c) * lit(loadings(i)) }
      .reduce(_ + _)
    val withEta = std.withColumn("eta", eta)
    // 4. closed-form OLS via one agg (Σx, Σy, Σxy, Σx², Σy², n)
    val s = withEta.agg(
      count(lit(1)).as("n"), sum("eta").as("sx"), sum(col(yCol)).as("sy"),
      sum(col("eta") * col(yCol)).as("sxy"),
      sum(col("eta") * col("eta")).as("sxx"),
      sum(col(yCol) * col(yCol)).as("syy")).collect().head
    val n = s.getAs[Long]("n").toDouble
    val (sx, sy, sxy, sxx2, syy) = (s.getAs[Double]("sx"), s.getAs[Double]("sy"),
      s.getAs[Double]("sxy"), s.getAs[Double]("sxx"), s.getAs[Double]("syy"))
    val xbar = sx / n; val ybar = sy / n
    val sxxC = sxx2 - n * xbar * xbar // centered Σ(x−x̄)²
    val sxyC = sxy - n * xbar * ybar
    val syyC = syy - n * ybar * ybar
    val slope = if (sxxC == 0) 0.0 else sxyC / sxxC
    val intercept = ybar - slope * xbar
    val sse = math.max(0.0, syyC - slope * sxyC)
    val sigma = math.sqrt(sse / math.max(1.0, n - 2)) // residual ddof=2
    val r2 = if (syyC == 0) 0.0 else 1.0 - sse / syyC
    Fit(intercept, slope, sigma, r2, n.toLong, xbar, sxxC, loadings.toArray)
  }

  /** Per-row prediction + CI columns from a Fit (sem_confidence.py:104-120);
    * CI bounds clamped to [0, 100] like the reference (:156-157). */
  def predictWithCI(df: DataFrame, fit: Fit, etaCol: String,
      z: Double = 1.96): DataFrame = {
    val se = lit(fit.sigma) * sqrt(lit(1.0 / fit.n) +
      pow(col(etaCol) - lit(fit.etaMean), 2) / lit(math.max(fit.sxx, 1e-12)))
    df.withColumn("y_hat", lit(fit.intercept) + lit(fit.slope) * col(etaCol))
      .withColumn("pred_se", se)
      .withColumn("ci_lower",
        least(lit(100.0), greatest(lit(0.0), col("y_hat") - lit(z) * se)))
      .withColumn("ci_upper",
        least(lit(100.0), greatest(lit(0.0), col("y_hat") + lit(z) * se)))
  }
}
