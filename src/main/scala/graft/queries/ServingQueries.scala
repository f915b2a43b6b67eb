package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** The REST serving read path (reference §3.3): `GET /scoring/results` is
  * a window-latest over the score history + a nested
  * `dimension_breakdown_json` parse + band shaping + top-N by composite —
  * pe-org-air-platform/app/routers/scoring.py:224-241 (the Snowflake
  * window query) and :85-161 (`_parse_breakdown`/`_to_out`, JSON →
  * nested DimensionBreakdown list).
  *
  * The engine half of that endpoint is certified here end to end: an
  * org_air_scores-shaped history (one row per scoring run, breakdown as a
  * JSON STRING column exactly as the reference stores it) → latest run
  * per company (scored_at DESC, run id DESC — scoring.py:227) → top-N by
  * composite with deterministic ties → `from_json` back to the nested
  * struct → one flat row per (company, dimension), the response body's
  * rows. Both engines build AND parse their own JSON, so what the oracle
  * certifies is the round-trip semantics, not a byte-identical string.
  *
  * Scale shape: one window (partitioned by company — no global sort), a
  * TakeOrdered top-N, and a per-row JSON parse on N·dims rows only
  * (parse AFTER the limit, never over the full history). Determinism:
  * every score is an integer cent/1e-4 grid long inside the JSON; the
  * only float ops are final single long/long divisions (IEEE-exact in
  * both engines).
  */
object ServingQueries extends QueryModule {

  private val ServeLimit = 50

  /** Breakdown constants: (dimension, sector-weight cents, raw-score hash
    * multipliers a·value_c + b·event_id, evidence offset). The raw-score
    * mix is a deterministic synthetic stand-in for the VR model's per-run
    * dimension scores — the SERVING semantics (window/JSON/band/top-N)
    * are what this query certifies; q_vr_cv_scores/q_full_scores certify
    * the scoring math itself. */
  private val Dims = Seq(
    ("capability", 50L, 3L, 7L, 1L),
    ("adoption", 30L, 5L, 11L, 2L),
    ("governance", 20L, 13L, 17L, 3L))

  private val BreakdownSchema =
    "STRUCT<vr: STRUCT<dimension_breakdown: ARRAY<STRUCT<" +
      "dimension: STRING, raw_score_c: BIGINT, sector_weight_c: BIGINT, " +
      "weighted_score_c: BIGINT, evidence_count: BIGINT>>>>"

  private val servingResults = QueryDef(
    "q_serving_results",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .withColumn("value_c", expr("CAST(round(value * 100) AS BIGINT)"))
      // one scoring run per event; double-mod keeps the grid non-negative
      // with identical semantics in both engines (truncated % in each)
      val withRaw = Dims.zipWithIndex.foldLeft(ev) {
        case (df, ((_, _, a, b, _), i)) =>
          df.withColumn(s"raw$i",
            expr(s"((value_c * $a + event_id * $b) % 10000 + 10000) % 10000"))
      }
      val dimJsonStructs = Dims.zipWithIndex.map { case ((name, w, _, _, eo), i) =>
        s"""named_struct(
           'dimension', '$name',
           'raw_score_c', raw$i,
           'sector_weight_c', ${w}L,
           'weighted_score_c', raw$i * ${w}L,
           'evidence_count', (event_id + ${eo}L) % 7L + 1L)"""
      }
      val store = withRaw
        .withColumn("vr_c", expr(
          Dims.zipWithIndex.map { case ((_, w, _, _, _), i) => s"raw$i * ${w}L" }
            .mkString("(", " + ", ") div 100L")))
        .withColumn("syn_c", expr("event_id % 500L"))
        .withColumn("tp_c", expr("user_id % 300L"))
        .withColumn("composite_c", col("vr_c") + col("syn_c") - col("tp_c"))
        .withColumn("score_band",
          when(col("composite_c") >= 7000L, "leader")
            .when(col("composite_c") >= 4000L, "challenger")
            .when(col("composite_c") >= 1000L, "emerging")
            .otherwise("watch"))
        .withColumn("breakdown_json", expr(
          s"""to_json(named_struct('vr', named_struct(
              'dimension_breakdown', array(${dimJsonStructs.mkString(", ")}))))"""))
        .select(col("user_id").as("company_id"),
          col("event_id").as("scoring_run_id"),
          col("ts_us").as("scored_at_us"),
          col("vr_c"), col("syn_c"), col("tp_c"), col("composite_c"),
          col("score_band"), col("breakdown_json"))
      // serving read: latest run per company, then top-N by composite with
      // a deterministic tie-break — scoring.py:224-241
      val w = Window.partitionBy("company_id")
        .orderBy(col("scored_at_us").desc, col("scoring_run_id").desc)
      val latest = store.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      val top = latest
        .orderBy(col("composite_c").desc, col("company_id").asc)
        .limit(ServeLimit)
      // nested-struct parse AFTER the limit: N·dims rows pay the parse
      top
        .withColumn("parsed", from_json(col("breakdown_json"),
          org.apache.spark.sql.types.DataType.fromDDL(BreakdownSchema)))
        .select(col("company_id"), col("scoring_run_id"), col("scored_at_us"),
          (col("vr_c").cast("double") / 100).as("vr_score"),
          (col("syn_c").cast("double") / 100).as("synergy_bonus"),
          (col("tp_c").cast("double") / 100).as("talent_penalty"),
          (col("composite_c").cast("double") / 100).as("composite_score"),
          col("score_band"),
          explode(col("parsed.vr.dimension_breakdown")).as("d"))
        .select(col("company_id"), col("scoring_run_id"), col("scored_at_us"),
          col("vr_score"), col("synergy_bonus"), col("talent_penalty"),
          col("composite_score"), col("score_band"),
          col("d.dimension").as("dimension"),
          (col("d.raw_score_c").cast("double") / 100).as("raw_score"),
          (col("d.sector_weight_c").cast("double") / 100).as("sector_weight"),
          (col("d.weighted_score_c").cast("double") / 10000).as("weighted_score"),
          col("d.evidence_count").as("evidence_count"))
        .orderBy(col("composite_score").desc, col("company_id").asc,
          col("dimension").asc)
    },
    Some {
      val dimJson = Dims.zipWithIndex.map { case ((name, w, _, _, eo), i) =>
        s"""json_object('dimension', '$name',
            'raw_score_c', raw$i,
            'sector_weight_c', $w,
            'weighted_score_c', raw$i * $w,
            'evidence_count', (event_id + $eo) % 7 + 1)"""
      }.mkString(", ")
      val rawDefs = Dims.zipWithIndex.map { case ((_, _, a, b, _), i) =>
        s"((CAST(round(value * 100) AS BIGINT) * $a + event_id * $b) % 10000 + 10000) % 10000 AS raw$i"
      }.mkString(",\n               ")
      val vrSum = Dims.zipWithIndex.map { case ((_, w, _, _, _), i) => s"raw$i * $w" }
        .mkString(" + ")
      s"""
      WITH runs AS (
        SELECT event_id, user_id, epoch_us(ts) AS scored_at_us,
               $rawDefs
        FROM events),
      store AS (
        SELECT user_id AS company_id, event_id AS scoring_run_id,
               scored_at_us,
               ($vrSum) // 100 AS vr_c,
               event_id % 500 AS syn_c,
               user_id % 300 AS tp_c,
               ($vrSum) // 100 + event_id % 500 - user_id % 300 AS composite_c,
               CASE WHEN ($vrSum) // 100 + event_id % 500 - user_id % 300 >= 7000 THEN 'leader'
                    WHEN ($vrSum) // 100 + event_id % 500 - user_id % 300 >= 4000 THEN 'challenger'
                    WHEN ($vrSum) // 100 + event_id % 500 - user_id % 300 >= 1000 THEN 'emerging'
                    ELSE 'watch' END AS score_band,
               json_object('vr', json_object('dimension_breakdown',
                 json_array($dimJson))) AS breakdown_json
        FROM runs),
      latest AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY company_id
                    ORDER BY scored_at_us DESC, scoring_run_id DESC) AS rn
          FROM store)
        WHERE rn = 1),
      top AS (
        SELECT * FROM latest
        ORDER BY composite_c DESC, company_id ASC
        LIMIT $ServeLimit)
      SELECT company_id, scoring_run_id, scored_at_us,
             CAST(vr_c AS DOUBLE) / 100 AS vr_score,
             CAST(syn_c AS DOUBLE) / 100 AS synergy_bonus,
             CAST(tp_c AS DOUBLE) / 100 AS talent_penalty,
             CAST(composite_c AS DOUBLE) / 100 AS composite_score,
             score_band,
             json_extract_string(breakdown_json,
               '$$.vr.dimension_breakdown[' || i || '].dimension') AS dimension,
             CAST(CAST(json_extract(breakdown_json,
               '$$.vr.dimension_breakdown[' || i || '].raw_score_c') AS BIGINT)
               AS DOUBLE) / 100 AS raw_score,
             CAST(CAST(json_extract(breakdown_json,
               '$$.vr.dimension_breakdown[' || i || '].sector_weight_c') AS BIGINT)
               AS DOUBLE) / 100 AS sector_weight,
             CAST(CAST(json_extract(breakdown_json,
               '$$.vr.dimension_breakdown[' || i || '].weighted_score_c') AS BIGINT)
               AS DOUBLE) / 10000 AS weighted_score,
             CAST(json_extract(breakdown_json,
               '$$.vr.dimension_breakdown[' || i || '].evidence_count') AS BIGINT)
               AS evidence_count
      FROM top, (SELECT unnest([0, 1, 2]) AS i)
      ORDER BY composite_score DESC, company_id ASC, dimension ASC"""
    })

  def queries: Seq[QueryDef] = Seq(servingResults)
}
