package graft.stats

import graft.SparkSpec

class PcaOlsSpec extends SparkSpec {
  import spark.implicits._

  private def data(n: Int, noise: Double) = {
    val rng = new scala.util.Random(5)
    (1 to n).map { _ =>
      val f = rng.nextGaussian()
      (f + noise * rng.nextGaussian(), f + noise * rng.nextGaussian(),
        f + noise * rng.nextGaussian(), 50 + 10 * f + noise * rng.nextGaussian())
    }
  }

  test("correlated items → loadings near-uniform, slope recovers signal, high R²") {
    val df = data(400, 0.1).toDF("a", "b", "c", "y")
    val fit = PcaOls.fit(df, Seq("a", "b", "c"), "y")
    assert(math.abs(fit.loadings.sum - 1.0) < 1e-9)
    fit.loadings.foreach(l => assert(math.abs(l - 1.0 / 3) < 0.05))
    assert(fit.r2 > 0.9)
    assert(fit.slope > 0.0)
    assert(fit.n === 400)
  }

  test("prediction CI: SE grows away from the mean; interval brackets y_hat") {
    val df = data(200, 0.3).toDF("a", "b", "c", "y")
    val fit = PcaOls.fit(df, Seq("a", "b", "c"), "y")
    val std = Seq((-3.0), (0.0), (3.0)).toDF("eta")
    val out = PcaOls.predictWithCI(std, fit, "eta").collect()
    val ses = out.map(_.getAs[Double]("pred_se"))
    assert(ses(1) < ses(0) && ses(1) < ses(2)) // min SE near η mean ≈ 0
    out.foreach { r =>
      assert(r.getAs[Double]("ci_lower") < r.getAs[Double]("y_hat"))
      assert(r.getAs[Double]("y_hat") < r.getAs[Double]("ci_upper"))
    }
  }

  test("pure-noise target → R² near 0, slope near 0") {
    val rng = new scala.util.Random(9)
    val df = (1 to 300).map(_ => (rng.nextGaussian(), rng.nextGaussian(),
      rng.nextGaussian(), rng.nextGaussian())).toDF("a", "b", "c", "y")
    val fit = PcaOls.fit(df, Seq("a", "b", "c"), "y")
    assert(fit.r2 < 0.1)
    assert(math.abs(fit.slope) < 0.5)
  }
}
