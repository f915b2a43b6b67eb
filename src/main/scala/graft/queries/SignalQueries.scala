package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import Det.{dround, oround}

/** Signal-summary scorers (SURVEY.md A13-A16, M19): the reference's
  * job/patent/tech/review summarizers re-expressed as set-based aggregates.
  * Events stand in for signal items; "now" is the deterministic corpus
  * max(ts) (the reference uses wall-clock; an injected clock is the
  * SURVEY §7.3 testability rule).
  *
  * Scale shape: each summary is one groupBy over the signal scan with
  * map-side-combinable aggregates plus a broadcast 1-row "now"; no windows,
  * no self-joins.
  */
object SignalQueries extends QueryModule {

  /** k = the JSON metadata integer (reference metadata:score analog). */
  private def kCol = get_json_object(col("props"), "$.k").cast("long")
  private val kSql = """CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT)"""

  // -- A14: job-signal summary — ai/senior ratios, location diversity,
  //    exact-median age, weighted 0-100 score
  private val jobSummary = QueryDef(
    "q_signal_summary_jobs",
    (s, dir) => {
      val ev = Tables.events(s, dir).filter(col("event_type") === "click")
        .withColumn("k", kCol)
      val now = ev.agg(max("ts_us").as("now_us"))
      val perJob = ev.crossJoin(broadcast(now))
        .withColumn("age_days", (col("now_us") - col("ts_us")) / lit(86400000000.0))
        .withColumn("is_ai", (col("k") % 3 === 0).cast("int"))
        .withColumn("is_senior", (col("k") % 5 === 0).cast("int"))
        .withColumn("location", col("k") % 8)
      val agg = perJob.groupBy(col("user_id").as("entity_id"))
        .agg(count(lit(1)).as("n_jobs"),
          avg("is_ai").as("ai_ratio"),
          avg("is_senior").as("senior_ratio"),
          countDistinct("location").as("n_locations"),
          expr("percentile(age_days, 0.5)").as("median_age_days"))
        .withColumn("loc_diversity", least(lit(1.0), col("n_locations") / lit(8.0)))
        .withColumn("recency",
          least(lit(1.0), greatest(lit(0.0), lit(1.0) - col("median_age_days") / lit(180.0))))
        .withColumn("score", lit(100.0) *
          (lit(0.55) * col("ai_ratio") + lit(0.20) * col("senior_ratio")
            + lit(0.15) * col("loc_diversity") + lit(0.10) * col("recency")))
      agg.select(col("entity_id"), col("n_jobs"),
          dround(col("ai_ratio"), 4).as("ai_ratio"),
          dround(col("senior_ratio"), 4).as("senior_ratio"),
          col("n_locations"),
          dround(col("median_age_days"), 4).as("median_age_days"),
          dround(col("score"), 4).as("score"))
        .orderBy("entity_id")
    },
    Some(s"""
      WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, $kSql AS k
                  FROM events WHERE event_type = 'click'),
        now_t AS (SELECT max(ts_us) AS now_us FROM ev),
        per AS (SELECT user_id AS entity_id,
                  (now_us - ts_us) / 86400000000.0 AS age_days,
                  CASE WHEN k % 3 = 0 THEN 1 ELSE 0 END AS is_ai,
                  CASE WHEN k % 5 = 0 THEN 1 ELSE 0 END AS is_senior,
                  k % 8 AS location
                FROM ev, now_t),
        agg AS (SELECT entity_id, count(*) AS n_jobs,
                  avg(is_ai) AS ai_ratio, avg(is_senior) AS senior_ratio,
                  count(DISTINCT location) AS n_locations,
                  quantile_cont(age_days, 0.5) AS median_age_days
                FROM per GROUP BY entity_id),
        sc AS (SELECT *,
                 least(1.0, n_locations / 8.0) AS loc_diversity,
                 least(1.0, greatest(0.0, 1.0 - median_age_days / 180.0)) AS recency
               FROM agg)
      SELECT entity_id, n_jobs,
             ${oround("ai_ratio", 4)} AS ai_ratio,
             ${oround("senior_ratio", 4)} AS senior_ratio,
             n_locations,
             ${oround("median_age_days", 4)} AS median_age_days,
             ${oround("100.0 * (0.55 * ai_ratio + 0.20 * senior_ratio + 0.15 * loc_diversity + 0.10 * recency)", 4)} AS score
      FROM sc ORDER BY entity_id"""))

  // -- A15: patent-signal summary — ai_ratio, volume normalizer, recency
  private val patentSummary = QueryDef(
    "q_signal_summary_patents",
    (s, dir) => {
      val ev = Tables.events(s, dir).filter(col("event_type") === "purchase")
        .withColumn("k", kCol)
      val now = ev.agg(max("ts_us").as("now_us"))
      val agg = ev.crossJoin(broadcast(now))
        .withColumn("age_days", (col("now_us") - col("ts_us")) / lit(86400000000.0))
        .withColumn("is_ai", (col("k") % 2 === 0).cast("int"))
        .groupBy(col("user_id").as("entity_id"))
        .agg(count(lit(1)).as("n_patents"),
          avg("is_ai").as("ai_ratio"),
          expr("percentile(age_days, 0.5)").as("median_age_days"))
        .withColumn("volume", least(lit(1.0), col("n_patents") / lit(20.0)))
        .withColumn("recency",
          least(lit(1.0), greatest(lit(0.0), lit(1.0) - col("median_age_days") / lit(365.0))))
        .withColumn("score", lit(100.0) *
          (lit(0.70) * col("ai_ratio") + lit(0.20) * col("volume") + lit(0.10) * col("recency")))
      agg.select(col("entity_id"), col("n_patents"),
          dround(col("ai_ratio"), 4).as("ai_ratio"),
          dround(col("median_age_days"), 4).as("median_age_days"),
          dround(col("score"), 4).as("score"))
        .orderBy("entity_id")
    },
    Some(s"""
      WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, $kSql AS k
                  FROM events WHERE event_type = 'purchase'),
        now_t AS (SELECT max(ts_us) AS now_us FROM ev),
        agg AS (SELECT user_id AS entity_id, count(*) AS n_patents,
                  avg(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS ai_ratio,
                  quantile_cont((now_us - ts_us) / 86400000000.0, 0.5) AS median_age_days
                FROM ev, now_t GROUP BY user_id),
        sc AS (SELECT *,
                 least(1.0, n_patents / 20.0) AS volume,
                 least(1.0, greatest(0.0, 1.0 - median_age_days / 365.0)) AS recency
               FROM agg)
      SELECT entity_id, n_patents,
             ${oround("ai_ratio", 4)} AS ai_ratio,
             ${oround("median_age_days", 4)} AS median_age_days,
             ${oround("100.0 * (0.70 * ai_ratio + 0.20 * volume + 0.10 * recency)", 4)} AS score
      FROM sc ORDER BY entity_id"""))

  // -- A16: tech-stack extraction — distinct vocabulary matches per doc,
  //    score = min(100, unique/10·100), rolled up per lang
  private val TechVocab = Seq("spark", "hash", "stream", "batch", "window", "merge")
  private val techStack = QueryDef(
    "q_tech_stack_score",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val uniq = TechVocab.map(t =>
        when(graft.text.KeywordMatch.wordBoundary(col("text"), t), 1).otherwise(0))
        .reduce(_ + _)
      val scored = d.withColumn("n_tech", uniq)
        .withColumn("tech_score", least(lit(100.0), col("n_tech") * lit(10.0)))
      scored.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          dround(avg("n_tech"), 4).as("avg_tech_terms"),
          dround(avg("tech_score"), 4).as("avg_tech_score"),
          sum(when(col("n_tech") >= 3, 1).otherwise(0)).as("n_tech_heavy"))
        .orderBy("lang")
    },
    Some {
      val uniq = TechVocab.map(t =>
        s"(CASE WHEN regexp_matches(text, '(?i)\\b$t\\b') THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""
      WITH d AS (SELECT lang, ($uniq) AS n_tech FROM documents),
        sc AS (SELECT lang, n_tech,
                 least(100.0, n_tech * 10.0) AS tech_score
               FROM d)
      SELECT lang, count(*) AS n_docs,
             ${oround("avg(n_tech)", 4)} AS avg_tech_terms,
             ${oround("avg(tech_score)", 4)} AS avg_tech_score,
             CAST(sum(CASE WHEN n_tech >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_tech_heavy
      FROM sc GROUP BY lang ORDER BY lang"""
    })

  // -- A13/M16: recency+employee-weighted review culture scores
  private val reviewCulture = QueryDef(
    "q_review_culture_scores",
    (s, dir) => {
      val ev = Tables.events(s, dir).filter(col("event_type") === "view")
        .withColumn("k", kCol)
      val now = ev.agg(max("ts_us").as("now_us"))
      val w = ev.crossJoin(broadcast(now))
        .withColumn("age_days", (col("now_us") - col("ts_us")) / lit(86400000000.0))
        .withColumn("rating",
          least(lit(5.0), greatest(lit(0.0), col("value") / lit(20.0))))
        // integer weight grid (×10 of the reference's {1.2,1.0,0.6,0.5} —
        // ratios cancel in every formula below): integer sums are exact in
        // double arithmetic regardless of aggregation order, so Spark and
        // the oracle agree bit-for-bit
        .withColumn("wgt",
          when(col("age_days") < 730, lit(2.0)).otherwise(lit(1.0)) *
            when(col("k") % 2 === 0, lit(6.0)).otherwise(lit(5.0)))
      val agg = w.groupBy(col("user_id").as("entity_id"))
        .agg(count(lit(1)).as("n_reviews"),
          sum("wgt").as("wsum"),
          sum(when(col("rating") >= 4.0, col("wgt")).otherwise(0.0)).as("pos"),
          sum(when(col("rating") <= 2.0, col("wgt")).otherwise(0.0)).as("neg"),
          sum(when(col("k") % 4 === 0, col("wgt")).otherwise(0.0)).as("data_mentions"),
          sum(when(col("k") % 4 === 1, col("wgt")).otherwise(0.0)).as("ai_mentions"))
        .withColumn("innovation",
          least(lit(100.0), greatest(lit(0.0),
            (col("pos") - col("neg")) / col("wsum") * lit(50.0) + lit(50.0))))
        .withColumn("data_culture", col("data_mentions") / col("wsum") * lit(100.0))
        .withColumn("ai_culture", col("ai_mentions") / col("wsum") * lit(100.0))
        .withColumn("overall",
          lit(0.30) * col("innovation") + lit(0.25) * col("innovation")
            + lit(0.25) * col("data_culture") + lit(0.20) * col("ai_culture"))
      agg.select(col("entity_id"), col("n_reviews"),
          dround(col("innovation"), 4).as("innovation"),
          dround(col("data_culture"), 4).as("data_culture"),
          dround(col("ai_culture"), 4).as("ai_culture"),
          dround(col("overall"), 4).as("overall"))
        .orderBy("entity_id")
    },
    Some(s"""
      WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, value, $kSql AS k
                  FROM events WHERE event_type = 'view'),
        now_t AS (SELECT max(ts_us) AS now_us FROM ev),
        w AS (SELECT user_id AS entity_id,
                least(5.0, greatest(0.0, value / 20.0)) AS rating,
                (CASE WHEN (now_us - ts_us) / 86400000000.0 < 730 THEN 2.0 ELSE 1.0 END)
                  * (CASE WHEN k % 2 = 0 THEN 6.0 ELSE 5.0 END) AS wgt,
                k
              FROM ev, now_t),
        agg AS (SELECT entity_id, count(*) AS n_reviews, sum(wgt) AS wsum,
                  sum(CASE WHEN rating >= 4.0 THEN wgt ELSE 0.0 END) AS pos,
                  sum(CASE WHEN rating <= 2.0 THEN wgt ELSE 0.0 END) AS neg,
                  sum(CASE WHEN k % 4 = 0 THEN wgt ELSE 0.0 END) AS data_mentions,
                  sum(CASE WHEN k % 4 = 1 THEN wgt ELSE 0.0 END) AS ai_mentions
                FROM w GROUP BY entity_id),
        sc AS (SELECT *,
                 least(100.0, greatest(0.0, (pos - neg) / wsum * 50.0 + 50.0)) AS innovation,
                 data_mentions / wsum * 100.0 AS data_culture,
                 ai_mentions / wsum * 100.0 AS ai_culture
               FROM agg)
      SELECT entity_id, n_reviews,
             ${oround("innovation", 4)} AS innovation,
             ${oround("data_culture", 4)} AS data_culture,
             ${oround("ai_culture", 4)} AS ai_culture,
             ${oround("0.30 * innovation + 0.25 * innovation + 0.25 * data_culture + 0.20 * ai_culture", 4)} AS overall
      FROM sc ORDER BY entity_id"""))

  // -- M19: both published normalizer variants over per-type counts
  private val normalizers = QueryDef(
    "q_signal_normalizers",
    (s, dir) => {
      val caps1 = Map("click" -> 50.0, "view" -> 40.0, "purchase" -> 20.0, "signup" -> 10.0)
      val caps2 = Map("click" -> 20.0, "view" -> 30.0, "purchase" -> 5.0, "signup" -> 10.0)
      def capCol(m: Map[String, Double]) = m.tail.foldLeft(
        when(col("event_type") === m.head._1, m.head._2)) {
        case (c, (t, v)) => c.when(col("event_type") === t, v)
      }.otherwise(lit(100.0))
      val ev = Tables.events(s, dir)
      ev.groupBy(col("user_id").as("entity_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("score_v1",
          least(lit(100.0), col("n") / capCol(caps1) * lit(100.0)))
        .withColumn("score_v2",
          least(lit(100.0), col("n") / capCol(caps2) * lit(100.0)))
        .select(col("entity_id"), col("event_type"), col("n"),
          dround(col("score_v1"), 4).as("score_v1"),
          dround(col("score_v2"), 4).as("score_v2"))
        .orderBy("entity_id", "event_type")
    },
    Some(s"""
      WITH c AS (SELECT user_id AS entity_id, event_type, count(*) AS n
                 FROM events GROUP BY 1, 2),
        sc AS (SELECT entity_id, event_type, n,
                 CASE event_type WHEN 'click' THEN 50.0 WHEN 'view' THEN 40.0
                      WHEN 'purchase' THEN 20.0 WHEN 'signup' THEN 10.0
                      ELSE 100.0 END AS cap1,
                 CASE event_type WHEN 'click' THEN 20.0 WHEN 'view' THEN 30.0
                      WHEN 'purchase' THEN 5.0 WHEN 'signup' THEN 10.0
                      ELSE 100.0 END AS cap2
               FROM c)
      SELECT entity_id, event_type, n,
             ${oround("least(100.0, n / cap1 * 100.0)", 4)} AS score_v1,
             ${oround("least(100.0, n / cap2 * 100.0)", 4)} AS score_v2
      FROM sc ORDER BY entity_id, event_type"""))

  override def queries: Seq[QueryDef] = Seq(
    jobSummary, patentSummary, techStack, reviewCulture, normalizers)
}
