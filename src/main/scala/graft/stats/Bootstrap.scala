package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.Random

/** Seeded bootstrap confidence interval (reference:
  * app/scoring_engine/sem_confidence.py:185-261 — 400 resamples, seed 42,
  * percentile 2.5/97.5).
  *
  * Parity note (SURVEY.md §7.3): Python's Mersenne stream is not
  * reproducible from Scala, so parity is defined at the statistical-contract
  * level; this implementation is deterministic under its own seed.
  *
  * The reference bootstraps n≈10 history rows — driver-side math is the
  * correct scale call there. For >memory histories `distributedMeanCI`
  * runs all R replicates in ONE scan via poissonized resampling.
  */
object Bootstrap {
  final case class CI(lower: Double, upper: Double, se: Double)

  def percentileCI(values: Array[Double], statistic: Array[Double] => Double,
      resamples: Int = 400, seed: Long = 42L, alpha: Double = 0.05): CI = {
    require(values.nonEmpty)
    if (values.length < 2) {
      val v = statistic(values)
      return CI(v - 5.0, v + 5.0, 0.0) // degenerate → ±5 fallback band
    }
    val rng = new Random(seed)
    val stats = Array.fill(resamples) {
      val sample = Array.fill(values.length)(values(rng.nextInt(values.length)))
      statistic(sample)
    }.sorted
    def pct(p: Double): Double = {
      val idx = p * (stats.length - 1)
      val lo = math.floor(idx).toInt; val hi = math.ceil(idx).toInt
      val frac = idx - lo
      stats(lo) * (1 - frac) + stats(hi) * frac
    }
    val mean = stats.sum / stats.length
    val se = math.sqrt(stats.map(s => (s - mean) * (s - mean)).sum / (stats.length - 1))
    CI(pct(alpha / 2), pct(1 - alpha / 2), se)
  }

  /** Poisson(λ=1) cumulative thresholds for inverse-CDF sampling (k ≤ 8
    * covers 1 − 1e-6 of the mass). */
  private val poissonCdf = Array(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253)

  /** Cross-engine uniform in (0,1) for (key, replicate): three 32-bit LCG
    * rounds over pre-masked integers — pure integer arithmetic with all
    * products < 2^49 (no Long overflow under ANSI for ANY key), so DuckDB
    * evaluates the identical expression to the identical double and an
    * oracle can replay the exact resample weights (q_bootstrap_ci).
    *
    * The key must be NUMERIC (cast upstream; a non-castable key yields a
    * null uniform and an exception below, not a silent bias). Negative
    * keys are folded into [0, m) here — `((k % m) + m) % m` — which is the
    * identity for the non-negative ids the oracle twins use, so the SQL
    * side stays the plain `% m`. */
  private[stats] def lcgUniform(key: org.apache.spark.sql.Column,
      r: org.apache.spark.sql.Column, seed: Long): org.apache.spark.sql.Column = {
    val m = 4294967296L
    val k = ((key.cast("long") % m) + m) % m
    val x1 = (k * 69069L + lit(seed % m)) % m
    val x2 = (x1 * 69069L + r * 2654435761L + 1L) % m
    val x3 = (x2 * 69069L + 1L) % m
    (x3.cast("double") + lit(0.5)) / 4294967296.0
  }

  /** M15, distributed variant: bootstrap CI of the MEAN over a DataFrame
    * column, all `resamples` replicates in ONE scan.
    *
    * Multinomial resampling is a driver-side loop (R passes); for large n
    * the per-row replicate weight converges to Poisson(1), so each row
    * draws a deterministic Poisson weight per replicate — an integer-LCG
    * hash of (key, replicate, seed), partition-order independent AND
    * reproducible in plain SQL — and each replicate's statistic is a
    * weighted agg. The explode is CPU-only fan-out; map-side partial
    * aggregation means the shuffle carries R partial sums per partition,
    * not R copies of the data. Only the R replicate statistics (tiny)
    * reach the driver.
    *
    * Fewer than 2 input rows → the reference's degenerate ±5 band around
    * the observed value (sem_confidence.py:224-228,332-341). */
  def distributedMeanCI(df: DataFrame, valueCol: String, keyCol: String,
      resamples: Int = 400, seed: Long = 42L, alpha: Double = 0.05): CI = {
    // fail fast on contract violations that would otherwise BIAS the CI
    // silently: a non-numeric or null key makes the LCG uniform null, and
    // a null uniform would fall into the max-weight branch of the Poisson
    // inverse-CDF (every replicate identical — zero-width interval)
    require(df.schema(keyCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"keyCol '$keyCol' must be numeric for deterministic resampling " +
        s"(got ${df.schema(keyCol).dataType.simpleString})")
    require(df.filter(col(keyCol).isNull && col(valueCol).isNotNull).isEmpty,
      s"null $keyCol with non-null $valueCol — cannot assign resample weights")
    val vals = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val n2 = vals.limit(2).count()
    require(n2 > 0, "bootstrap needs at least one value")
    if (n2 < 2) {
      val v = vals.agg(avg("v")).collect().head.getDouble(0)
      return CI(v - 5.0, v + 5.0, 0.0)
    }
    val u = lcgUniform(col(keyCol), col("r"), seed)
    val w = poissonCdf.zipWithIndex.foldRight(lit(poissonCdf.length): org.apache.spark.sql.Column) {
      case ((cdf, k), rest) => when(u < cdf, k).otherwise(rest)
    }
    val reps = df.select(col(valueCol).cast("double").as("v"), col(keyCol))
      .filter(col("v").isNotNull) // a null v would add weight to ws but not wv
      .withColumn("r", explode(expr(s"sequence(0, ${resamples - 1})")))
      .withColumn("w", w.cast("double"))
      .groupBy("r")
      .agg(sum(col("w") * col("v")).as("wv"), sum("w").as("ws"))
      .filter(col("ws") > 0)
      .select((col("wv") / col("ws")).as("stat"))
    val stats = reps.collect().map(_.getDouble(0)).sorted
    require(stats.nonEmpty, "all bootstrap replicates degenerate")
    def pct(p: Double): Double = {
      val idx = p * (stats.length - 1)
      val lo = math.floor(idx).toInt; val hi = math.ceil(idx).toInt
      val frac = idx - lo
      stats(lo) * (1 - frac) + stats(hi) * frac
    }
    val mean = stats.sum / stats.length
    val se = math.sqrt(stats.map(s => (s - mean) * (s - mean)).sum
      / math.max(1, stats.length - 1))
    CI(pct(alpha / 2), pct(1 - alpha / 2), se)
  }
}
