package graft.stats

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
  * correct scale call. The distributed variant for huge histories is
  * `df.sample(withReplacement = true, 1.0, seed + i)` per replicate, with the
  * statistic as an `agg` — documented here, implemented when a >memory
  * history exists.
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
}
