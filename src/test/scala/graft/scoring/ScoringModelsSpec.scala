package graft.scoring

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import scala.util.Random

/** Unit + property coverage of the scoring stack, mirroring the reference's
  * own test layers (SURVEY.md §5: VR bounds/zero-weights, synergy
  * cap/activation/negative, HHI range, composite banding, TC monotonicity)
  * plus pure-Scala reference implementations checked against the Spark
  * column expressions on randomized inputs.
  */
class ScoringModelsSpec extends SparkSpec {
  import spark.implicits._

  private def clamp(x: Double, lo: Double, hi: Double) = math.max(lo, math.min(hi, x))

  // ---- VR model -----------------------------------------------------------

  /** pure mirror of VrModel.score (vr_model.py:50-96 semantics). */
  private def vrRef(rows: Seq[(Double, Double, Double)]): Double = {
    val eff = rows.map { case (_, w, c) => w * math.max(c, 0.2) }
    val den = eff.sum
    if (den == 0.0) 0.0
    else clamp(rows.zip(eff).map { case ((s, _, _), e) => s * e }.sum / den, 0.0, 100.0)
  }

  test("VR matches pure reference on randomized inputs and stays in [0,100]") {
    val rng = new Random(7)
    val entities = (0 until 40).map { e =>
      val dims = (0 until 5).map { d =>
        (s"e$e", s"d$d", rng.nextDouble() * 120 - 10, rng.nextDouble(), rng.nextDouble())
      }
      (s"e$e", dims)
    }
    val df = entities.flatMap(_._2).toDF("entity_id", "dimension", "score", "weight", "confidence")
    val got = VrModel.score(df).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    entities.foreach { case (e, dims) =>
      val expect = vrRef(dims.map(t => (t._3, t._4, t._5)))
      assert(math.abs(got(e) - expect) < 1e-9, s"entity $e")
      assert(got(e) >= 0.0 && got(e) <= 100.0)
    }
  }

  test("VR zero total weight → 0.0") {
    val df = Seq(("e", "d1", 50.0, 0.0, 0.9), ("e", "d2", 80.0, 0.0, 0.9))
      .toDF("entity_id", "dimension", "score", "weight", "confidence")
    assert(VrModel.score(df).collect().head.getDouble(1) === 0.0)
  }

  test("VR monotone under uniform uplift (reference Hypothesis property)") {
    val base = Seq(("e", "a", 40.0, 0.3, 0.5), ("e", "b", 60.0, 0.7, 0.8))
      .toDF("entity_id", "dimension", "score", "weight", "confidence")
    val up = Seq(("e", "a", 50.0, 0.3, 0.5), ("e", "b", 70.0, 0.7, 0.8))
      .toDF("entity_id", "dimension", "score", "weight", "confidence")
    val v0 = VrModel.score(base).collect().head.getDouble(1)
    val v1 = VrModel.score(up).collect().head.getDouble(1)
    assert(v1 >= v0)
  }

  test("CV penalty: population stddev (ddof=0), identical scores → factor 1") {
    val same = Seq(("e", "a", 50.0, 1.0, 0.5), ("e", "b", 50.0, 1.0, 0.5))
      .toDF("entity_id", "dimension", "score", "weight", "confidence")
    val r = VrModel.cvPenalty(same).collect().head
    assert(math.abs(r.getAs[Double]("cv_factor") - 1.0) < 1e-12)
    // population vs sample: two points 40/60 → σ_pop=10, μ=50, cv=0.2, factor=0.95
    val spread = Seq(("e", "a", 40.0, 1.0, 0.5), ("e", "b", 60.0, 1.0, 0.5))
      .toDF("entity_id", "dimension", "score", "weight", "confidence")
    val f = VrModel.cvPenalty(spread).collect().head.getAs[Double]("cv_factor")
    assert(math.abs(f - 0.95) < 1e-12)
  }

  // ---- Synergy ------------------------------------------------------------

  private val rules = Seq(
    ScoringConfig.SynergyRule("a", "b", "positive", 60.0, 10.0),
    ScoringConfig.SynergyRule("a", "c", "positive", 60.0, 10.0),
    ScoringConfig.SynergyRule("b", "c", "negative", 60.0, 4.0))

  private def synergyOf(a: Double, b: Double, c: Double): Double = {
    val df = Seq(("e", a, b, c)).toDF("entity_id", "a", "b", "c")
    Synergy.ruleSynergy(df, rules).select("synergy_bonus").as[Double].collect().head
  }

  test("rule synergy: activation, negative rule, cap at ±15") {
    assert(synergyOf(70, 70, 70) === 20.0.min(ScoringConfig.SynergyCap)) // two positives capped 20→15
    assert(synergyOf(70, 70, 10) === 10.0 - 4.0) // one positive + negative(b≥60,c<60)
    assert(synergyOf(10, 10, 10) === 0.0)
    assert(synergyOf(70, 10, 70) === 10.0) // a/c positive only
  }

  test("formula synergy bounds and alignment semantics (synergy.py:132-156)") {
    val df = Seq((100.0, 100.0), (0.0, 100.0), (50.0, 50.0)).toDF("vr", "hr")
    val out = df.select(Synergy.formulaSynergy(col("vr"), col("hr"), lit(1.0)).as("s"))
      .as[Double].collect()
    assert(out(0) === 100.0) // perfect alignment, max product
    assert(out(1) === 0.0)   // alignment 0
    assert(math.abs(out(2) - 25.0) < 1e-12) // 50·50/100 · 1 · 1
  }

  // ---- Talent penalty (HHI) ----------------------------------------------

  test("HHI ∈ [1/k, 1]; concentrated → 1; uniform → 1/k") {
    val uniform = (1 to 4).flatMap(c => Seq.fill(10)(("e", s"c$c")))
      .toDF("entity_id", "category")
    val h1 = TalentPenalty.hhi(uniform).collect().head.getAs[Double]("hhi")
    assert(math.abs(h1 - 0.25) < 1e-12)
    val conc = Seq.fill(20)(("e", "only")).toDF("entity_id", "category")
    val h2 = TalentPenalty.hhi(conc).collect().head.getAs[Double]("hhi")
    assert(h2 === 1.0)
  }

  test("penalty factor thresholds incl. min-sample gate (talent_penalty.py:143-188)") {
    val df = Seq(
      (10L, 0.9), // below min sample → 1.0
      (20L, 0.75), // severe → 0.85
      (20L, 0.5), // mild → 0.95
      (20L, 0.2)) // none → 1.0
      .toDF("n_total", "hhi")
    val out = df.select(TalentPenalty.penaltyFactor(col("hhi"), col("n_total")).as("p"))
      .as[Double].collect()
    assert(out.toSeq == Seq(1.0, 0.85, 0.95, 1.0))
  }

  // ---- Rubric -------------------------------------------------------------

  /** pure mirror of RubricScorer (rubric_scorer.py:169-217). */
  private def rubricRef(hits: Int, metric: Double): (Double, Double) = {
    val levels = RubricScorer.DefaultRubric
    val hit = levels.find(l => hits >= l.minMatches && metric >= l.quantThreshold)
    val score = hit match {
      case Some(l) => l.lo + (l.hi - l.lo) * math.min(1.0, hits.toDouble / (l.minMatches + 2))
      case None => 10.0
    }
    val conf =
      if (hits >= 1) math.min(0.95, 0.50 + 0.08 * hits + 0.30 * metric) else 0.40
    (score, conf)
  }

  test("rubric score/confidence match pure reference across the grid") {
    val grid = for (h <- 0 to 12; m <- 0 to 10)
      yield ("e", s"d${h}_$m", h, m / 10.0)
    val df = grid.toDF("entity_id", "dimension", "hits", "metric")
    val out = RubricScorer.score(df)
      .select("hits", "metric", "score", "confidence").collect()
    out.foreach { case Row(h: Int, m: Double, s: Double, c: Double) =>
      val (es, ec) = rubricRef(h, m)
      assert(math.abs(s - es) < 1e-9, s"score hits=$h metric=$m")
      assert(math.abs(c - ec) < 1e-9, s"conf hits=$h metric=$m")
    }
  }

  // ---- Composite + banding ------------------------------------------------

  test("composite preferred/legacy formulas and band boundaries (composite.py)") {
    val df = Seq((80.0, 60.0, 70.0)).toDF("vr", "hr", "syn")
    val c = df.select(Composite.preferred(col("vr"), col("hr"), col("syn")).as("c"))
      .as[Double].collect().head
    // (1−.12)·(.6·80+.4·60) + .12·70 = .88·72 + 8.4 = 71.76
    assert(math.abs(c - 71.76) < 1e-12)
    val l = df.select(Composite.legacy(lit(90.0), lit(20.0), lit(0.95)).as("l"))
      .as[Double].collect().head
    assert(math.abs(l - 100.0) < 1e-12) // (90+20)·0.95=104.5 → clamp 100
    // band boundaries inclusive at 20/40/60/80
    val bands = Seq(20.0, 20.000001, 40.0, 60.0, 80.0, 80.000001, 0.0)
      .toDF("s").select(Composite.band(col("s")).as("b")).as[String].collect()
    assert(bands.toSeq == Seq("Nascent", "Developing", "Developing", "Progressing",
      "Advanced", "Leading", "Nascent"))
  }

  // ---- Position factor / HR / priors / TC --------------------------------

  test("position factor clamps to ±1 and matches closed form") {
    val df = Seq((90.0, 50.0, 1.0), (10.0, 90.0, 0.0), (50.0, 50.0, 0.5))
      .toDF("vr", "avg", "pctl")
    val out = df.select(PositionFactor.compute(col("vr"), col("avg"), col("pctl")).as("pf"))
      .as[Double].collect()
    assert(math.abs(out(0) - (0.6 * 0.8 + 0.4 * 1.0)) < 1e-12)
    assert(math.abs(out(1) - (0.6 * -1.0 + 0.4 * -1.0)) < 1e-12)
    assert(math.abs(out(2)) < 1e-12)
    out.foreach(v => assert(v >= -1.0 && v <= 1.0))
  }

  test("HR factor: neutral below min jobs; clamped [0,2] (hr_baselines.py:102-191)") {
    val jobs = (Seq.fill(2)("low") ++ Seq.fill(10)("mid") ++ Seq.fill(40)("high"))
      .map(Tuple1(_)).toDF("entity_id")
    val out = HrBaselines.hrFactor(jobs, lit(75.0)).collect()
      .map(r => r.getAs[String]("entity_id") ->
        (r.getAs[Long]("jobs_count"), r.getAs[Double]("hr_factor"))).toMap
    assert(out("low")._2 === 1.0) // 2 jobs < 3 → neutral
    val avg = (2 + 10 + 40) / 3.0
    assert(math.abs(out("mid")._2 - clamp(1 + 0.5 * (10 / avg - 1) / 1.0, 0, 2)) < 1e-9)
    assert(math.abs(out("high")._2 - clamp(1 + 0.5 * (40 / avg - 1) / 1.0, 0, 2)) < 1e-9)
    out.values.foreach { case (_, f) => assert(f >= 0.0 && f <= 2.0) }
  }

  test("talent-risk adjustment anti-monotone in TC (reference Hypothesis property)") {
    val df = (0 to 20).map(i => Tuple1(i / 20.0)).toDF("tc")
    val out = df.select(TalentConcentration.riskAdjustment(col("tc")).as("a"))
      .as[Double].collect()
    out.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-12) }
    out.foreach(v => assert(v >= 0.0 && v <= 1.0))
  }

  test("prior blend: w=0 identity, w=1 target; evidence weight clamps") {
    val df = Seq((30.0, 80.0)).toDF("x", "t")
    val b0 = df.select(PriorBlend.blend(col("x"), col("t"), lit(0.0)).as("b"))
      .as[Double].collect().head
    val b1 = df.select(PriorBlend.blend(col("x"), col("t"), lit(1.0)).as("b"))
      .as[Double].collect().head
    assert(b0 === 30.0 && b1 === 80.0)
    val w = Seq(0L, 10L, 100L).toDF("j")
      .select(PriorBlend.evidenceWeight(col("j")).as("w")).as[Double].collect()
    assert(w(0) === 0.95 && math.abs(w(1) - 0.5) < 1e-12 && w(2) === 0.35)
  }

  // ---- EvidenceMapper -----------------------------------------------------

  test("evidence mapper: weighted score + capped confidence; empty-weight defaults") {
    val ev = Seq(
      ("e", "d", 80.0, 0.9, 1.0, 2.0),
      ("e", "d", 40.0, 0.5, 0.5, 1.0))
      .toDF("entity_id", "dimension", "raw_score", "confidence", "relevance", "weight")
    val r = EvidenceMapper.dimensionScores(ev).collect().head
    val num = 80 * 2 * 0.9 * 1.0 + 40 * 1 * 0.5 * 0.5
    val den = 2 * 0.9 * 1.0 + 1 * 0.5 * 0.5
    assert(math.abs(r.getAs[Double]("score") - num / den) < 1e-9)
    assert(math.abs(r.getAs[Double]("confidence") - math.min(0.95, den / 3.0)) < 1e-9)
    val empty = Seq(("e", "d", 80.0, 0.9, 1.0, 0.0))
      .toDF("entity_id", "dimension", "raw_score", "confidence", "relevance", "weight")
    val r2 = EvidenceMapper.dimensionScores(empty).collect().head
    assert(r2.getAs[Double]("score") === 50.0 && r2.getAs[Double]("confidence") === 0.5)
  }
}
