package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("reliability: perfectly correlated items → avg_r clamped 0.99, rho near 1") {
    val wide = (1 to 30).map(i => (i.toDouble, i * 2.0, i * 3.0)).toDF("a", "b", "c")
    val r = SemConfidence.reliability(wide, Seq("a", "b", "c")).collect().head
    assert(math.abs(r.getAs[Double]("avg_r") - 0.99) < 1e-9)
    // Spearman–Brown would give 3·0.99/(1+2·0.99) ≈ 0.9966, but the
    // reference clamps rho itself to 0.99 (sem_confidence.py:362)
    val rho = r.getAs[Double]("rho")
    assert(math.abs(rho - 0.99) < 1e-9)
    assert(r.getAs[Int]("n_items") === 3)
  }

  test("reliability: null corrs from a constant dim excluded; all-null → 0.50 fallback") {
    // c is constant → corr(a,c) and corr(b,c) are null; only corr(a,b)=1
    // participates (→ clamped 0.99), instead of nulling the whole mean
    val wide = (1 to 30).map(i => (i.toDouble, i * 2.0, 5.0)).toDF("a", "b", "c")
    val r = SemConfidence.reliability(wide, Seq("a", "b", "c")).collect().head
    assert(math.abs(r.getAs[Double]("avg_r") - 0.99) < 1e-9)
    // every pair invalid → reference falls back to avg_r = 0.50
    val allConst = (1 to 30).map(_ => (1.0, 2.0)).toDF("a", "b")
    val r2 = SemConfidence.reliability(allConst, Seq("a", "b")).collect().head
    assert(math.abs(r2.getAs[Double]("avg_r") - 0.50) < 1e-12)
  }

  test("reliability: independent noise → avg_r near 0, rho small") {
    val rng = new scala.util.Random(11)
    val wide = (1 to 500).map(_ => (rng.nextGaussian(), rng.nextGaussian(), rng.nextGaussian()))
      .toDF("a", "b", "c")
    val r = SemConfidence.reliability(wide, Seq("a", "b", "c")).collect().head
    assert(r.getAs[Double]("avg_r") >= 0.0) // clamped at 0
    assert(r.getAs[Double]("avg_r") < 0.2)
  }

  test("semBounds: sigma floor 1, SEM floor 0.5, z=1.96 interval") {
    val df = Seq((70.0, 0.2, 0.99), (70.0, 4.0, 0.75)).toDF("x", "sigma", "rho")
    val out = SemConfidence.semBounds(df, "x", "sigma", "rho").collect()
    // row 0: σ→1, √(1−.99)=.1 → sem=max(.5,.1)=.5
    assert(math.abs(out(0).getAs[Double]("sem") - 0.5) < 1e-12)
    assert(math.abs(out(0).getAs[Double]("ci_lower") - (70 - 1.96 * 0.5)) < 1e-12)
    // row 1: σ=4, √.25=.5 → sem=2
    assert(math.abs(out(1).getAs[Double]("sem") - 2.0) < 1e-12)
    assert(math.abs(out(1).getAs[Double]("ci_upper") - (70 + 1.96 * 2.0)) < 1e-12)
  }

  test("distributed bootstrap agrees with driver-side bootstrap within CI tolerance") {
    val rng = new scala.util.Random(7)
    val values = Array.fill(300)(50.0 + rng.nextGaussian() * 10.0)
    val driver = Bootstrap.percentileCI(values, a => a.sum / a.length)
    val df = values.zipWithIndex.toSeq.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val dist = Bootstrap.distributedMeanCI(df, "v", "id")
    // different resampling schemes (multinomial vs poissonized) → same
    // sampling distribution asymptotically; assert same location and width
    // to within a couple of standard errors
    val mean = values.sum / values.length
    assert(dist.lower < mean && mean < dist.upper)
    assert(math.abs(dist.lower - driver.lower) < 3 * driver.se)
    assert(math.abs(dist.upper - driver.upper) < 3 * driver.se)
    assert(dist.se / driver.se > 0.5 && dist.se / driver.se < 2.0)
    // the RESAMPLING is hash-keyed so the drawn weights are identical under
    // any partitioning; the weighted double-sum itself is order-sensitive at
    // the last ulp, so equality holds to fp-summation tolerance
    val again = Bootstrap.distributedMeanCI(df.repartition(7), "v", "id")
    assert(math.abs(again.lower - dist.lower) < 1e-9)
    assert(math.abs(again.upper - dist.upper) < 1e-9)
  }

  test("bootstrap: deterministic under seed; CI brackets the mean; degenerate ±5") {
    val xs = Array(4.0, 7.0, 6.0, 5.0, 9.0, 3.0, 8.0, 6.0, 5.0, 7.0)
    def mean(a: Array[Double]) = a.sum / a.length
    val c1 = Bootstrap.percentileCI(xs, mean)
    val c2 = Bootstrap.percentileCI(xs, mean)
    assert(c1 == c2)
    assert(c1.lower <= mean(xs) && mean(xs) <= c1.upper)
    assert(c1.se > 0.0)
    val d = Bootstrap.percentileCI(Array(5.0), mean)
    assert(d.lower === 0.0 && d.upper === 10.0 && d.se === 0.0)
  }
}
