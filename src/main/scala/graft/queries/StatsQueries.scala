package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.scoring.ScorePipeline
import graft.sources.Upsert
import graft.stats.SemConfidence
import Det.{dround, oround}

/** Statistical confidence (M13/M17) and sink-semantics (S9/S12) operators
  * as oracle-checked queries. */
object StatsQueries extends QueryModule {

  private val dims = ScorePipeline.Dimensions

  /** oracle CTE: entity × dimension score pivot (mirrors dimensionInputs →
    * pivot first("score"), missing → NULL so corr/stddev skip them). */
  private val wideCte: String = {
    val cols = dims.map(d => s"max(CASE WHEN dimension = '$d' THEN score END) AS s_$d")
      .mkString(",\n                 ")
    s"""
    dimscores AS (
      SELECT user_id AS entity_id, event_type AS dimension,
             least(100.0, greatest(0.0, avg(value))) AS score
      FROM events GROUP BY 1, 2),
    wide AS (SELECT entity_id,
                 $cols
             FROM dimscores GROUP BY entity_id)"""
  }

  // -- M13/M17: inter-item correlations → Spearman–Brown reliability
  private val semReliability = QueryDef(
    "q_sem_reliability",
    (s, dir) => {
      val wide = ScorePipeline.dimensionInputs(s, dir)
        .groupBy("entity_id").pivot("dimension", dims).agg(first("score"))
      SemConfidence.reliability(wide, dims)
        .select(dround(col("avg_r"), 4).as("avg_r"),
          dround(col("rho"), 4).as("rho"), col("n_items"))
    },
    Some {
      val k = dims.size
      s"""
      WITH $wideCte,
        r AS (SELECT avg_r, rho FROM ${OracleSem.relSubquery(dims, "wide")})
      SELECT ${oround("avg_r", 4)} AS avg_r,
             ${oround("rho", 4)} AS rho,
             $k AS n_items
      FROM r"""
    })

  // -- M13: per-entity SEM bounds (σ floor 1, SEM floor 0.5, z = 1.96)
  private val semBounds = QueryDef(
    "q_sem_bounds",
    (s, dir) => {
      val inputs = ScorePipeline.dimensionInputs(s, dir)
      val wide = inputs.groupBy("entity_id").pivot("dimension", dims).agg(first("score"))
      val rel = SemConfidence.reliability(wide, dims).select("rho")
      val perEntity = inputs.groupBy("entity_id")
        .agg(avg("score").as("mean_score"), stddev_samp(col("score")).as("sigma"))
        .crossJoin(broadcast(rel))
      SemConfidence.semBounds(perEntity, "mean_score", "sigma", "rho")
        .select(col("entity_id"),
          dround(col("mean_score"), 4).as("mean_score"),
          dround(col("sigma"), 4).as("sigma"),
          dround(col("sem"), 4).as("sem"),
          dround(col("ci_lower"), 4).as("ci_lower"),
          dround(col("ci_upper"), 4).as("ci_upper"))
        .orderBy("entity_id")
    },
    Some {
      s"""
      WITH $wideCte,
        rel AS (SELECT rho FROM ${OracleSem.relSubquery(dims, "wide")}),
        pe AS (SELECT entity_id, avg(score) AS mean_score,
                      stddev_samp(score) AS sigma
               FROM dimscores GROUP BY entity_id),
        sb AS (SELECT entity_id, mean_score, sigma,
                      greatest(0.5, greatest(1.0, sigma)
                        * sqrt(greatest(0.0, 1.0 - rho))) AS sem
               FROM pe, rel)
      SELECT entity_id,
             ${oround("mean_score", 4)} AS mean_score,
             ${oround("sigma", 4)} AS sigma,
             ${oround("sem", 4)} AS sem,
             ${oround("least(100.0, greatest(0.0, mean_score - 1.96 * sem))", 4)} AS ci_lower,
             ${oround("least(100.0, greatest(0.0, mean_score + 1.96 * sem))", 4)} AS ci_upper
      FROM sb ORDER BY entity_id"""
    })

  // -- S9: keyed last-wins upsert (MERGE semantics as a batch op): replay
  //    the event stream split into base/incoming halves, keep the latest
  //    row per (user, type)
  private val upsertLastWins = QueryDef(
    "q_upsert_last_wins",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("event_id"), col("ts_us"))
      val base = ev.filter(col("event_id") % 2 === 0)
      val incoming = ev.filter(col("event_id") % 2 === 1)
      Upsert.lastWins(base, incoming, Seq("user_id", "event_type"),
          Seq("ts_us", "event_id"))
        .orderBy("user_id", "event_type")
    },
    Some("""
      SELECT user_id, event_type, event_id, ts_us
      FROM (SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
                   row_number() OVER (
                     PARTITION BY user_id, event_type
                     ORDER BY epoch_us(ts) DESC, event_id DESC,
                              (event_id % 2) DESC) AS rn
            FROM events)
      WHERE rn = 1
      ORDER BY user_id, event_type"""))

  // -- S12: content-hash ingest gate — incoming minus already-seen hashes
  private val dedupGate = QueryDef(
    "q_dedup_gate",
    (s, dir) => {
      // persist: both gate sides derive from the same hashed scan — cache
      // avoids computing 1M sha2 twice (at 100 TB the hash column is
      // materialized at ingest, not recomputed per read)
      val ev = Tables.events(s, dir)
        .withColumn("content_hash", sha2(concat_ws("#",
          col("user_id"), col("event_type"),
          get_json_object(col("props"), "$.k")), 256))
        .select("event_id", "event_type", "content_hash")
        .persist()
      val seen = ev.filter(col("event_id") % 2 === 0)
      val incoming = ev.filter(col("event_id") % 2 === 1)
      Upsert.dedupGate(incoming, seen, "content_hash")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_new"),
          countDistinct("content_hash").as("n_new_distinct"))
        .orderBy("event_type")
    },
    Some("""
      WITH h AS (SELECT event_id, event_type,
                   sha256(user_id || '#' || event_type || '#'
                          || regexp_extract(props, '"k":\s*(-?\d+)', 1)) AS content_hash
                 FROM events),
        seen AS (SELECT DISTINCT content_hash FROM h WHERE event_id % 2 = 0),
        incoming AS (SELECT * FROM h WHERE event_id % 2 = 1)
      SELECT event_type, count(*) AS n_new,
             count(DISTINCT content_hash) AS n_new_distinct
      FROM incoming
      WHERE content_hash NOT IN (SELECT content_hash FROM seen)
      GROUP BY event_type ORDER BY event_type"""))

  override def queries: Seq[QueryDef] = Seq(
    semReliability, semBounds, upsertLastWins, dedupGate)
}
