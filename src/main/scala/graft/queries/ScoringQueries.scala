package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.scoring._
import Det.{dround, oround}

/** The scoring stack (SURVEY.md §2.4 A8-A12, §2.9 M1-M11) exposed as
  * oracle-checked queries over the driver testdata. Entities = event users,
  * dimensions = event types — the same set-based decorrelated DAG shape the
  * 100 TB design needs (reference loops per company;
  * scripts/run_scoring_engine.py:608-609).
  *
  * Float outputs go through Det.dround/oround (identical binary arithmetic
  * in both engines) and every query carries a total order.
  */
object ScoringQueries extends QueryModule {

  /** CASE expression mirroring ScorePipeline.DimWeights for oracle SQL
    * (CAST keeps DuckDB from inferring DECIMAL for the literals). */
  private val weightCase: String =
    "CASE event_type " + ScorePipeline.DimWeights
      .map { case (d, w) => s"WHEN '$d' THEN CAST($w AS DOUBLE)" }.mkString(" ") +
      " ELSE CAST(0.0 AS DOUBLE) END"

  /** Shared oracle CTE: per-(entity, dimension) score/confidence/weight —
    * mirrors ScorePipeline.dimensionInputs exactly. */
  private val dimsCte: String = s"""
    dims AS (
      SELECT user_id AS entity_id, event_type AS dimension,
             least(100.0, greatest(0.0,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0 / count(*))) AS score,
             least(0.95, 0.3 + count(*) / 50.0)      AS confidence,
             $weightCase AS weight
      FROM events GROUP BY 1, 2)"""

  // -- the per-dimension feature rows (A10-shape input)
  private val dimensionInputs = QueryDef(
    "q_dimension_inputs",
    (s, dir) =>
      ScorePipeline.dimensionInputs(s, dir)
        .select(col("entity_id"), col("dimension"),
          dround(col("score"), 4).as("score"),
          dround(col("confidence"), 4).as("confidence"),
          col("weight"))
        .orderBy("entity_id", "dimension"),
    Some(s"""
      WITH $dimsCte
      SELECT entity_id, dimension,
             ${oround("score", 4)} AS score,
             ${oround("confidence", 4)} AS confidence,
             weight
      FROM dims ORDER BY entity_id, dimension"""))

  // -- A11/A12: VR confidence-floored weighted mean + CV penalty
  private val vrCv = QueryDef(
    "q_vr_cv_scores",
    (s, dir) => {
      val dims = ScorePipeline.dimensionInputs(s, dir)
      VrModel.score(dims)
        .join(VrModel.cvPenalty(dims), "entity_id")
        .select(col("entity_id"), dround(col("vr_score"), 4).as("vr_score"),
          dround(col("cv"), 4).as("cv"), dround(col("cv_factor"), 4).as("cv_factor"))
        .orderBy("entity_id")
    },
    Some(s"""
      WITH $dimsCte,
        v AS (SELECT entity_id,
             least(100.0, greatest(0.0,
               CASE WHEN sum(weight * greatest(confidence, 0.2)) <> 0
                    THEN sum(score * weight * greatest(confidence, 0.2))
                         / sum(weight * greatest(confidence, 0.2))
                    ELSE 0.0 END)) AS vr_score,
             CASE WHEN abs(avg(score)) > 0
                  THEN stddev_pop(score) / abs(avg(score))
                  ELSE 0.0 END AS cv
           FROM dims GROUP BY entity_id)
      SELECT entity_id,
             ${oround("vr_score", 4)} AS vr_score,
             ${oround("cv", 4)} AS cv,
             ${oround("least(1.0, greatest(0.0, 1.0 - 0.25 * cv))", 4)} AS cv_factor
      FROM v ORDER BY entity_id"""))

  /** penalty-factor CASE over an `hhi`/`n_total` row (oracle mirror of
    * TalentPenalty.penaltyFactor with the default config). */
  private val penaltyCase: String = """
    CAST(CASE WHEN n_total < 15 THEN 1.0
              WHEN hhi >= 0.70 THEN 0.85
              WHEN hhi >= 0.40 THEN 0.95
              ELSE 1.0 END AS DOUBLE)"""

  private val hhiCte: String = """
    hh AS (SELECT entity_id, n_total, hhi
           FROM (SELECT entity_id, CAST(sum(n_cat) AS BIGINT) AS n_total,
                        sum(n_cat * n_cat) / (CAST(sum(n_cat) AS DOUBLE) * sum(n_cat)) AS hhi
                 FROM (SELECT user_id AS entity_id, event_type AS category,
                              count(*) AS n_cat
                       FROM events GROUP BY 1, 2)
                 GROUP BY entity_id))"""

  // -- A8/M10: HHI concentration + penalty factor
  private val hhiPenalty = QueryDef(
    "q_hhi_penalty",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id").as("entity_id"), col("event_type").as("category"))
      TalentPenalty.hhi(ev)
        .withColumn("penalty_factor", TalentPenalty.penaltyFactor(col("hhi"), col("n_total")))
        .select(col("entity_id"), col("n_total"), dround(col("hhi"), 6).as("hhi"),
          col("penalty_factor"))
        .orderBy("entity_id")
    },
    Some(s"""
      WITH $hhiCte
      SELECT entity_id, n_total,
             ${oround("hhi", 6)} AS hhi,
             $penaltyCase AS penalty_factor
      FROM hh ORDER BY entity_id"""))

  // -- M1: rubric scorer over (hits, metric) features derived from events
  private val rubricScores = QueryDef(
    "q_rubric_scores",
    (s, dir) => {
      val feats = Tables.events(s, dir)
        .groupBy(col("user_id").as("entity_id"), col("event_type").as("dimension"))
        .agg(count(lit(1)).as("hits"),
             least(lit(1.0), avg("value") / lit(100.0)).as("metric"))
      RubricScorer.score(feats)
        .select(col("entity_id"), col("dimension"), col("hits"),
          dround(col("metric"), 4).as("metric"),
          dround(col("score"), 4).as("score"),
          dround(col("confidence"), 4).as("confidence"))
        .orderBy("entity_id", "dimension")
    },
    // when-cascade mirror of RubricScorer.DefaultRubric (L5→L1, fallback 10/.40)
    Some(s"""
      WITH f AS (SELECT user_id AS entity_id, event_type AS dimension,
                        count(*) AS hits,
                        least(1.0, avg(value) / 100.0) AS metric
                 FROM events GROUP BY 1, 2),
        r AS (SELECT entity_id, dimension, hits, metric,
             CASE
               WHEN hits >= 8 AND metric >= 0.80 THEN 80.0 + 20.0 * least(1.0, hits / 10.0)
               WHEN hits >= 6 AND metric >= 0.60 THEN 60.0 + 20.0 * least(1.0, hits / 8.0)
               WHEN hits >= 4 AND metric >= 0.40 THEN 40.0 + 20.0 * least(1.0, hits / 6.0)
               WHEN hits >= 2 AND metric >= 0.20 THEN 20.0 + 20.0 * least(1.0, hits / 4.0)
               WHEN hits >= 1 AND metric >= 0.00 THEN  0.0 + 20.0 * least(1.0, hits / 3.0)
               ELSE 10.0 END AS score,
             CASE WHEN hits >= 1
                  THEN least(0.95, 0.50 + 0.08 * hits + 0.30 * metric)
                  ELSE 0.40 END AS confidence
           FROM f)
      SELECT entity_id, dimension, hits,
             ${oround("metric", 4)} AS metric,
             ${oround("score", 4)} AS score,
             ${oround("confidence", 4)} AS confidence
      FROM r ORDER BY entity_id, dimension"""))

  // -- M2/A10: evidence-weighted dimension scores over per-event evidence rows
  private val evidenceDims = QueryDef(
    "q_evidence_weighted_dims",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id").as("entity_id"), col("event_type").as("dimension"),
          least(lit(100.0), greatest(lit(0.0), col("value"))).as("raw_score"),
          least(lit(0.9), greatest(lit(0.1), col("value") / lit(500.0))).as("confidence"),
          ((get_json_object(col("props"), "$.k").cast("double") % 5 + 1) / lit(5.0))
            .as("relevance"),
          lit(1.0).as("weight"))
      EvidenceMapper.dimensionScores(ev)
        .select(col("entity_id"), col("dimension"),
          dround(col("score"), 4).as("score"),
          dround(col("confidence"), 4).as("confidence"))
        .orderBy("entity_id", "dimension")
    },
    Some(s"""
      WITH e AS (SELECT user_id AS entity_id, event_type AS dimension,
                        least(100.0, greatest(0.0, value)) AS raw_score,
                        least(0.9, greatest(0.1, value / 500.0)) AS confidence,
                        (CAST(regexp_extract(props, '"k":${"\\"}s*(-?${"\\"}d+)', 1) AS DOUBLE) % 5 + 1) / 5.0 AS relevance,
                        1.0 AS weight
                 FROM events),
        g AS (SELECT entity_id, dimension,
             CASE WHEN sum(weight * confidence * relevance) > 0
                  THEN sum(raw_score * weight * confidence * relevance)
                       / sum(weight * confidence * relevance)
                  ELSE 50.0 END AS score,
             CASE WHEN sum(weight) > 0
                  THEN least(0.95, sum(weight * confidence * relevance) / sum(weight))
                  ELSE 0.5 END AS confidence
           FROM e GROUP BY 1, 2)
      SELECT entity_id, dimension,
             ${oround("score", 4)} AS score,
             ${oround("confidence", 4)} AS confidence
      FROM g ORDER BY entity_id, dimension"""))

  // -- A19/M9: talent-concentration score + risk adjustment
  private val talentConcentration = QueryDef(
    "q_talent_concentration",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      ev.groupBy(col("user_id").as("entity_id"))
        .agg(count(lit(1)).as("n_people"),
          countDistinct("event_type").as("n_skills"),
          (sum(when(col("event_type") === "purchase", 1).otherwise(0))
            .cast("double") / count(lit(1))).as("leadership_ratio"))
        .withColumn("tc", TalentConcentration.tcScore(
          col("leadership_ratio"), col("n_people"), col("n_skills"), lit(0.5)))
        .withColumn("risk_adjustment", TalentConcentration.riskAdjustment(col("tc")))
        .select(col("entity_id"), col("n_people"), col("n_skills"),
          dround(col("leadership_ratio"), 4).as("leadership_ratio"),
          dround(col("tc"), 4).as("tc"),
          dround(col("risk_adjustment"), 4).as("risk_adjustment"))
        .orderBy("entity_id")
    },
    Some(s"""
      WITH t AS (SELECT user_id AS entity_id, count(*) AS n_people,
                        count(DISTINCT event_type) AS n_skills,
                        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
                          / count(*) AS leadership_ratio
                 FROM events GROUP BY 1),
           c AS (SELECT *,
                   least(1.0, greatest(0.0,
                     0.4 * leadership_ratio
                     + 0.3 * least(1.0, 1.0 / (sqrt(CAST(n_people AS DOUBLE)) + 0.1))
                     + 0.2 * greatest(0.0, 1.0 - CAST(n_skills AS DOUBLE) / 15.0)
                     + 0.1 * 0.5)) AS tc
                 FROM t)
      SELECT entity_id, n_people, n_skills,
             ${oround("leadership_ratio", 4)} AS leadership_ratio,
             ${oround("tc", 4)} AS tc,
             ${oround("least(1.0, greatest(0.0, 1.0 - 0.15 * greatest(0.0, tc - 0.25)))", 4)} AS risk_adjustment
      FROM c ORDER BY entity_id"""))

  // -- M4/A1/A2: HR factor from per-entity jobs counts vs portfolio average
  private val hrFactor = QueryDef(
    "q_hr_factor",
    (s, dir) => {
      val jobs = Tables.events(s, dir).filter(col("event_type") === "click")
        .select(col("user_id").as("entity_id"))
      HrBaselines.hrFactor(jobs, lit(75.0))
        .select(col("entity_id"), col("jobs_count"),
          dround(col("portfolio_avg"), 4).as("portfolio_avg"),
          dround(col("hr_factor"), 4).as("hr_factor"))
        .orderBy("entity_id")
    },
    Some(s"""
      WITH c AS (SELECT user_id AS entity_id, count(*) AS jobs_count
                 FROM events WHERE event_type = 'click' GROUP BY 1),
           a AS (SELECT avg(jobs_count) AS portfolio_avg FROM c),
           j AS (SELECT entity_id, jobs_count, portfolio_avg,
                   CASE WHEN jobs_count < 3 OR portfolio_avg = 0 THEN 1.0
                        ELSE least(2.0, greatest(0.0,
                          1.0 + 0.5 * (jobs_count / portfolio_avg - 1.0)
                              / least(1.3, greatest(0.7, 75.0 / 75.0)))) END AS hr_factor
                 FROM c, a)
      SELECT entity_id, jobs_count,
             ${oround("portfolio_avg", 4)} AS portfolio_avg,
             ${oround("hr_factor", 4)} AS hr_factor
      FROM j ORDER BY entity_id"""))

  /** wide-pivot mirror for the oracle: one score column per dimension. */
  private val wideCols: String = ScorePipeline.Dimensions
    .map(d => s"coalesce(max(CASE WHEN dimension = '$d' THEN score END), 0.0) AS s_$d")
    .mkString(",\n                ")

  /** synergy-rule mirror of ScorePipeline.Rules for the oracle. */
  private val synergyCase: String = ScorePipeline.Rules.map { r =>
    r.kind match {
      case "positive" =>
        s"(CASE WHEN s_${r.dimA} >= ${r.threshold} AND s_${r.dimB} >= ${r.threshold} THEN CAST(${r.magnitude} AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)"
      case "negative" =>
        s"(CASE WHEN s_${r.dimA} >= ${r.threshold} AND s_${r.dimB} < ${r.threshold} THEN CAST(-${r.magnitude} AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)"
    }
  }.mkString(" + ")

  // -- M7: rule synergy over the pivoted per-dimension scores
  private val synergyBonus = QueryDef(
    "q_synergy_bonus",
    (s, dir) => {
      val dims = ScorePipeline.dimensionInputs(s, dir)
      val wide = dims.groupBy("entity_id")
        .pivot("dimension", ScorePipeline.Dimensions)
        .agg(first("score"))
        .na.fill(0.0, ScorePipeline.Dimensions)
      Synergy.ruleSynergy(wide, ScorePipeline.Rules)
        .select(col("entity_id"), dround(col("synergy_bonus"), 4).as("synergy_bonus"))
        .orderBy("entity_id")
    },
    Some(s"""
      WITH $dimsCte,
           wide AS (SELECT entity_id,
                $wideCols
              FROM dims GROUP BY entity_id)
      SELECT entity_id,
             ${oround(s"least(15.0, greatest(-15.0, $synergyCase))", 4)} AS synergy_bonus
      FROM wide ORDER BY entity_id"""))

  /** Reusable oracle CTE chain for the composite DAG (dims → … → calc4). */
  private[queries] val compositeCtes: String = s"""$dimsCte,
        vr AS (SELECT entity_id,
             least(100.0, greatest(0.0,
               CASE WHEN sum(weight * greatest(confidence, 0.2)) <> 0
                    THEN sum(score * weight * greatest(confidence, 0.2))
                         / sum(weight * greatest(confidence, 0.2))
                    ELSE 0.0 END)) AS vr_score,
             least(1.0, greatest(0.0,
               1.0 - 0.25 * (CASE WHEN abs(avg(score)) > 0
                                  THEN stddev_pop(score) / abs(avg(score))
                                  ELSE 0.0 END))) AS cv_factor
           FROM dims GROUP BY entity_id),
        $hhiCte,
        hp AS (SELECT entity_id, hhi, $penaltyCase AS penalty_factor FROM hh),
        wide AS (SELECT entity_id,
                $wideCols
              FROM dims GROUP BY entity_id),
        syn AS (SELECT entity_id,
             least(15.0, greatest(-15.0, $synergyCase)) AS synergy_bonus
           FROM wide),
        ranked AS (SELECT v.*,
             -- rank on the 1e-4-QUANTIZED score with percent_rank tie
             -- semantics (no entity tie-break): matches the engine's
             -- bucketed rank() over Det.dround(vr_score, 4); raw-double
             -- ordering diverges across engines on ulp-level near-ties
             percent_rank() OVER (ORDER BY ${oround("vr_score", 4)} ASC) AS pctl,
             -- 1e-6 integer-grid mean (order-free, engine-identical) — a
             -- raw avg() here diverged from Spark by one ulp and flipped a
             -- 1e-4-boundary final_score at the 10× scale factor
             CAST(sum(CAST(floor(vr_score * 1e6 + 0.5) AS BIGINT)) OVER ()
                  AS DOUBLE) / 1e6 / count(*) OVER () AS sector_avg
           FROM vr v),
        calc AS (SELECT r.entity_id, r.vr_score, r.cv_factor, h.hhi,
             h.penalty_factor, sy.synergy_bonus,
             least(1.0, greatest(-1.0,
               0.6 * least(1.0, greatest(-1.0, (r.vr_score - r.sector_avg) / 50.0))
               + 0.4 * least(1.0, greatest(-1.0, (r.pctl - 0.5) * 2.0)))) AS position_factor,
             r.vr_score * r.cv_factor * h.penalty_factor AS vr_adjusted
           FROM ranked r JOIN hp h USING (entity_id) JOIN syn sy USING (entity_id)),
        calc2 AS (SELECT *,
             least(100.0, greatest(0.0, 75.0 * (1.0 + 0.15 * position_factor))) AS hr_score
           FROM calc),
        calc3 AS (SELECT *,
             least(100.0, greatest(0.0,
               (vr_adjusted * hr_score / 100.0)
               * least(1.0, greatest(0.0, 1.0 - abs(vr_adjusted - hr_score) / 100.0))
               * 1.0)) AS synergy_score
           FROM calc2),
        calc4 AS (SELECT *,
             least(100.0, greatest(0.0,
               0.88 * (0.6 * vr_adjusted + 0.4 * hr_score) + 0.12 * synergy_score))
               AS composite_score,
             least(100.0, greatest(0.0,
               (vr_score + synergy_bonus) * penalty_factor)) AS composite_legacy
           FROM calc3)"""

  // -- M3-M11 end-to-end: the flagship composite DAG (§3.1), all stages fused
  private val composite = QueryDef(
    "q_composite_scores",
    (s, dir) =>
      ScorePipeline.compositeScores(s, dir)
        .select(col("entity_id"),
          dround(col("vr_score"), 4).as("vr_score"),
          dround(col("cv_factor"), 4).as("cv_factor"),
          dround(col("hhi"), 6).as("hhi"),
          col("penalty_factor"),
          dround(col("synergy_bonus"), 4).as("synergy_bonus"),
          dround(col("position_factor"), 4).as("position_factor"),
          dround(col("hr_score"), 4).as("hr_score"),
          dround(col("synergy_score"), 4).as("synergy_score"),
          dround(col("composite_score"), 4).as("composite_score"),
          dround(col("composite_legacy"), 4).as("composite_legacy"),
          col("score_band"))
        .orderBy("entity_id"),
    Some(s"""
      WITH $compositeCtes
      SELECT entity_id,
             ${oround("vr_score", 4)} AS vr_score,
             ${oround("cv_factor", 4)} AS cv_factor,
             ${oround("hhi", 6)} AS hhi,
             penalty_factor,
             ${oround("synergy_bonus", 4)} AS synergy_bonus,
             ${oround("position_factor", 4)} AS position_factor,
             ${oround("hr_score", 4)} AS hr_score,
             ${oround("synergy_score", 4)} AS synergy_score,
             ${oround("composite_score", 4)} AS composite_score,
             ${oround("composite_legacy", 4)} AS composite_legacy,
             CASE WHEN composite_score <= 20.0 THEN 'Nascent'
                  WHEN composite_score <= 40.0 THEN 'Developing'
                  WHEN composite_score <= 60.0 THEN 'Progressing'
                  WHEN composite_score <= 80.0 THEN 'Advanced'
                  ELSE 'Leading' END AS score_band
      FROM calc4 ORDER BY entity_id"""))

  // -- the COMPLETE lifecycle (M3-M13): composite + TC risk adjustment +
  //    prior blend + SEM confidence interval — the org_air_scores row
  private val fullScores = QueryDef(
    "q_full_scores",
    (s, dir) =>
      ScorePipeline.fullScores(s, dir)
        .select(col("entity_id"),
          dround(col("composite_score"), 4).as("composite_score"),
          dround(col("tc"), 4).as("tc"),
          dround(col("risk_adjustment"), 4).as("risk_adjustment"),
          col("jobs_count"),
          dround(col("prior_weight"), 4).as("prior_weight"),
          dround(col("vr_blended"), 4).as("vr_blended"),
          dround(col("final_score"), 4).as("final_score"),
          dround(col("sem"), 4).as("sem"),
          dround(col("ci_lower"), 4).as("ci_lower"),
          dround(col("ci_upper"), 4).as("ci_upper"),
          col("final_band"))
        .orderBy("entity_id"),
    Some {
      val wideC = ScorePipeline.Dimensions
        .map(d => s"max(CASE WHEN dimension = '$d' THEN score END) AS s_$d")
        .mkString(",\n                 ")
      s"""
      WITH $compositeCtes,
        tcc AS (SELECT entity_id,
                  least(1.0, greatest(0.0,
                    0.4 * leadership_ratio
                    + 0.3 * least(1.0, 1.0 / (sqrt(CAST(n_people AS DOUBLE)) + 0.1))
                    + 0.2 * greatest(0.0, 1.0 - CAST(n_skills AS DOUBLE) / 15.0)
                    + 0.1 * 0.5)) AS tc
                FROM (SELECT user_id AS entity_id, count(*) AS n_people,
                        count(DISTINCT event_type) AS n_skills,
                        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
                          / count(*) AS leadership_ratio
                      FROM events GROUP BY 1)),
        tca AS (SELECT entity_id, tc,
                  least(1.0, greatest(0.0,
                    1.0 - 0.15 * greatest(0.0, tc - 0.25))) AS risk_adjustment
                FROM tcc),
        jobs AS (SELECT user_id AS entity_id, count(*) AS jobs_count
                 FROM events WHERE event_type = 'click' GROUP BY 1),
        sg AS (SELECT entity_id, stddev_samp(score) AS sigma FROM dims GROUP BY entity_id),
        widec AS (SELECT entity_id,
                 $wideC
                 FROM dims GROUP BY entity_id),
        rel AS (SELECT rho FROM ${OracleSem.relSubquery(ScorePipeline.Dimensions, "widec")}),
        fa AS (SELECT c4.entity_id, c4.composite_score, c4.vr_score,
                   t.tc, t.risk_adjustment,
                   coalesce(j.jobs_count, 0) AS jobs_count,
                   least(0.95, greatest(0.35, 1.0 - coalesce(j.jobs_count, 0) / 20.0)) AS prior_weight,
                   sg.sigma
                 FROM calc4 c4 JOIN tca t USING (entity_id)
                   LEFT JOIN jobs j USING (entity_id)
                   JOIN sg USING (entity_id)),
        f2 AS (SELECT fa.*, rel.rho,
                 CASE WHEN entity_id % 10 = 0
                      THEN (1.0 - prior_weight) * vr_score + prior_weight * 60.0
                      ELSE vr_score END AS vr_blended,
                 least(100.0, greatest(0.0, composite_score * risk_adjustment)) AS final_score
               FROM fa, rel),
        f3 AS (SELECT *,
                 greatest(0.5, greatest(1.0, sigma)
                   * sqrt(greatest(0.0, 1.0 - rho))) AS sem
               FROM f2)
      SELECT entity_id,
             ${oround("composite_score", 4)} AS composite_score,
             ${oround("tc", 4)} AS tc,
             ${oround("risk_adjustment", 4)} AS risk_adjustment,
             jobs_count,
             ${oround("prior_weight", 4)} AS prior_weight,
             ${oround("vr_blended", 4)} AS vr_blended,
             ${oround("final_score", 4)} AS final_score,
             ${oround("sem", 4)} AS sem,
             ${oround("least(100.0, greatest(0.0, final_score - 1.96 * sem))", 4)} AS ci_lower,
             ${oround("least(100.0, greatest(0.0, final_score + 1.96 * sem))", 4)} AS ci_upper,
             CASE WHEN final_score <= 20.0 THEN 'Nascent'
                  WHEN final_score <= 40.0 THEN 'Developing'
                  WHEN final_score <= 60.0 THEN 'Progressing'
                  WHEN final_score <= 80.0 THEN 'Advanced'
                  ELSE 'Leading' END AS final_band
      FROM f3 ORDER BY entity_id"""
    })

  // -- RFM customer segmentation: recency / frequency / monetary quintile
  //    scores with exact global quintile cuts (HistQuantiles two-pass —
  //    the audited bounded-window machinery, no ntile funnel), reported
  //    as a census per (r, f, m) cell with the classic segment labels.
  //    Cuts are interpolated quantile_cont values; band membership is a
  //    strict `>` against them in BOTH engines, so ties land identically.
  //    One scan to per-customer aggregates; everything after runs on
  //    grid-bounded frames and 1-row broadcasts.
  private val rfmScores = QueryDef(
    "q_rfm_scores",
    (s, dir) => {
      import graft.operators.HistQuantiles
      val day = datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
      val cust = graft.Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(max(day).cast("long").as("lastday"),
          count(lit(1)).as("f"),
          sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("m"))
      Cached.withPinned(cust) { case Seq(cust) => // r15: pin + plan-truncate
        val horizon = cust.agg(max("lastday").as("maxday"))
        val withR = cust.crossJoin(broadcast(horizon))
          .withColumn("r", col("maxday") - col("lastday"))
        val probes = Seq(0.2, 0.4, 0.6, 0.8)
        // ONE grouped-quantile pass for all 12 thresholds (round-10
        // rework): the three metrics stack into (metric, v) rows and
        // share a single histogram shuffle — the previous shape ran one
        // full HistQuantiles pass per metric (3 scans + 3 shuffles)
        val stacked = withR.selectExpr(
          "stack(3, 'r', r, 'f', f, 'm', m) AS (metric, v)")
        val qs = HistQuantiles.groupedQuantiles(stacked, "metric",
          col("v"), probes)
        val thrCols = for {
          pfx <- Seq("r", "f", "m"); p <- probes
        } yield min(when(col("metric") === pfx && col("q") === p,
          col("value"))).as(s"$pfx${(p * 100).round}")
        val thr = qs.agg(thrCols.head, thrCols.tail: _*)
        def band(c: String, pfx: String) =
          lit(1) + (col(c) > col(s"${pfx}20")).cast("int") +
            (col(c) > col(s"${pfx}40")).cast("int") +
            (col(c) > col(s"${pfx}60")).cast("int") +
            (col(c) > col(s"${pfx}80")).cast("int")
        withR.crossJoin(broadcast(thr))
          .withColumn("r_score", lit(6) - band("r", "r"))
          .withColumn("f_score", band("f", "f"))
          .withColumn("m_score", band("m", "m"))
          .withColumn("segment",
            when(col("r_score") >= 4 && col("f_score") >= 4
              && col("m_score") >= 4, "champions")
              .when(col("r_score") <= 2 && col("f_score") >= 4, "at_risk_loyal")
              .when(col("r_score") >= 4 && col("f_score") <= 2, "new_promising")
              .otherwise("mid_tier"))
          .groupBy("r_score", "f_score", "m_score", "segment")
          .agg(count(lit(1)).as("n_cust"))
          .orderBy("r_score", "f_score", "m_score")
      }
    },
    Some(s"""
      WITH cust AS (SELECT o_custkey,
                      max(date_diff('day', DATE '1970-01-01',
                        CAST(o_orderdate AS DATE))) AS lastday,
                      CAST(count(*) AS BIGINT) AS f,
                      CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS m
                    FROM orders GROUP BY 1),
        horizon AS (SELECT max(lastday) AS maxday FROM cust),
        wr AS (SELECT cust.*, horizon.maxday - lastday AS r
               FROM cust, horizon),
        cuts AS (SELECT
                   quantile_cont(r, 0.2) AS r20, quantile_cont(r, 0.4) AS r40,
                   quantile_cont(r, 0.6) AS r60, quantile_cont(r, 0.8) AS r80,
                   quantile_cont(f, 0.2) AS f20, quantile_cont(f, 0.4) AS f40,
                   quantile_cont(f, 0.6) AS f60, quantile_cont(f, 0.8) AS f80,
                   quantile_cont(m, 0.2) AS m20, quantile_cont(m, 0.4) AS m40,
                   quantile_cont(m, 0.6) AS m60, quantile_cont(m, 0.8) AS m80
                 FROM wr),
        scored AS (SELECT
                     6 - (1 + CAST(r > r20 AS INT) + CAST(r > r40 AS INT)
                       + CAST(r > r60 AS INT) + CAST(r > r80 AS INT))
                       AS r_score,
                     1 + CAST(f > f20 AS INT) + CAST(f > f40 AS INT)
                       + CAST(f > f60 AS INT) + CAST(f > f80 AS INT)
                       AS f_score,
                     1 + CAST(m > m20 AS INT) + CAST(m > m40 AS INT)
                       + CAST(m > m60 AS INT) + CAST(m > m80 AS INT)
                       AS m_score
                   FROM wr, cuts)
      SELECT r_score, f_score, m_score,
             CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                    THEN 'champions'
                  WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk_loyal'
                  WHEN r_score >= 4 AND f_score <= 2 THEN 'new_promising'
                  ELSE 'mid_tier' END AS segment,
             CAST(count(*) AS BIGINT) AS n_cust
      FROM scored GROUP BY 1, 2, 3
      ORDER BY r_score, f_score, m_score"""))

  override def queries: Seq[QueryDef] = Seq(
    dimensionInputs, vrCv, hhiPenalty, rubricScores, evidenceDims,
    talentConcentration, hrFactor, synergyBonus, composite, fullScores,
    rfmScores)
}
