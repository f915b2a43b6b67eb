package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.scoring.ScorePipeline
import graft.sources.Upsert
import graft.stats.{Bootstrap, PcaOls, SemConfidence}
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
             least(100.0, greatest(0.0,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0 / count(*))) AS score
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
      // mean on the 1e-6 integer grid: avg() of 5 doubles is summation-
      // order-dependent at the ulp level, and at the 10× scale factor one
      // entity's mean sat exactly on the 1e-4 output boundary (the same
      // class as the sector_avg residual; same fix — sum exact integer-
      // valued doubles, divide once, mirrored in the oracle)
      val perEntity = inputs.groupBy("entity_id")
        .agg((sum(floor(col("score") * 1e6 + 0.5).cast("long")).cast("double")
            / lit(1e6) / count(lit(1)).cast("double")).as("mean_score"),
          stddev_samp(col("score")).as("sigma"))
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
        pe AS (SELECT entity_id,
                      CAST(sum(CAST(floor(score * 1e6 + 0.5) AS BIGINT))
                        AS DOUBLE) / 1e6 / count(*) AS mean_score,
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
      // the gate key is the BINARY digest (32 B), not the hex string
      // (64 B + string comparisons): join keys and dedup state carry no
      // human-readable requirement, and at 100 TB the gate's shuffle and
      // broadcast sizes halve for free. Counts are representation-blind,
      // so the hex-based oracle is unchanged.
      //
      // NO persist of the hashed scan: the event_id%2 predicate pushes
      // below the sha2 projection, so each gate side hashes only its own
      // half — two scans cost the same total digest work as one, with
      // none of the cache-eviction/GC churn a 6M-row × 32 B binary cache
      // caused across a 108-query JVM (measured 17.4× at 10× data). At
      // 100 TB the hash column is materialized at ingest, not recomputed
      // per read — which is a storage decision, not an execution cache.
      val ev = Tables.events(s, dir)
        .withColumn("content_hash", unhex(sha2(concat_ws("#",
          col("user_id"), col("event_type"),
          get_json_object(col("props"), "$.k")), 256)))
        .select("event_id", "event_type", "content_hash")
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

  // -- M14: SEM via PCA+OLS (sem_confidence.py:35-183) as an ORACLE-CHECKED
  //    query. The whole chain — correlation matrix, dominant eigenvector,
  //    |PC1| loadings, composite factor η over RAW scores, closed-form OLS,
  //    per-entity prediction SE and clamped CI — is mirrored operation-for-
  //    operation in DuckDB SQL: the 200-step power iteration runs as a
  //    RECURSIVE CTE with the SAME left-associated arithmetic as
  //    PcaOls.principalEigenvector, so both engines converge to the same
  //    eigenvector to machine precision and every output survives the
  //    4-decimal grid. Only the k×k eigen step is driver-side (k=5, tiny);
  //    all data passes are single-scan aggregates — the 100 TB shape.
  /** Shared input frame for the two stat-CI queries: entity × dimension
    * pivot (0-filled) plus `y` = the plain mean of the item scores
    * ("predict overall readiness from the factor" — the reference's
    * regression shape). */
  private def wideWithY(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val wide = ScorePipeline.dimensionInputs(s, dir)
      .groupBy("entity_id").pivot("dimension", dims).agg(first("score"))
      .na.fill(0.0, dims)
    wide.withColumn("y", dims.map(col).reduce(_ + _) / lit(dims.size.toDouble))
  }

  /** Oracle twin of `wideWithY` (CTEs `dimscores` → `w` → `wy`), shared
    * verbatim by both stat-CI oracles so the twins cannot drift apart. */
  private val wideYCtes: String = s"""
        dimscores AS (
          SELECT user_id AS entity_id, event_type AS dimension,
                 least(100.0, greatest(0.0,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                     / 100.0 / count(*))) AS score
          FROM events GROUP BY 1, 2),
        w AS (SELECT entity_id,
                coalesce(max(CASE WHEN dimension = 'click' THEN score END), 0.0) AS s1,
                coalesce(max(CASE WHEN dimension = 'view' THEN score END), 0.0) AS s2,
                coalesce(max(CASE WHEN dimension = 'purchase' THEN score END), 0.0) AS s3,
                coalesce(max(CASE WHEN dimension = 'signup' THEN score END), 0.0) AS s4,
                coalesce(max(CASE WHEN dimension = 'error' THEN score END), 0.0) AS s5
              FROM dimscores GROUP BY entity_id),
        wy AS (SELECT *, (((((s1 + s2) + s3) + s4) + s5) / 5.0) AS y FROM w)"""

  private val pcaOlsCi = QueryDef(
    "q_pca_ols_ci",
    (s, dir) => {
      val df = wideWithY(s, dir)
      val fit = PcaOls.fit(df, dims, "y")
      val eta = dims.zipWithIndex
        .map { case (c, i) => col(c) * lit(fit.loadings(i)) }.reduce(_ + _)
      PcaOls.predictWithCI(df.withColumn("eta", eta), fit, "eta")
        .select(col("entity_id"),
          dround(col("eta"), 4).as("eta"),
          dround(col("y"), 4).as("y"),
          dround(col("y_hat"), 4).as("y_hat"),
          dround(col("pred_se"), 4).as("pred_se"),
          dround(col("ci_lower"), 4).as("ci_lower"),
          dround(col("ci_upper"), 4).as("ci_upper"))
        .orderBy("entity_id")
    },
    Some {
      // dims order is ScorePipeline.Dimensions: click, view, purchase,
      // signup, error → v1..v5 / l1..l5 in that order everywhere.
      s"""
      WITH RECURSIVE $wideYCtes,
        cm AS (SELECT corr(s1, s2) AS m12, corr(s1, s3) AS m13,
                      corr(s1, s4) AS m14, corr(s1, s5) AS m15,
                      corr(s2, s3) AS m23, corr(s2, s4) AS m24,
                      corr(s2, s5) AS m25, corr(s3, s4) AS m34,
                      corr(s3, s5) AS m35, corr(s4, s5) AS m45
               FROM wy),
        pi AS (
          SELECT 0 AS i, 1.0/sqrt(5.0) AS v1, 1.0/sqrt(5.0) AS v2,
                 1.0/sqrt(5.0) AS v3, 1.0/sqrt(5.0) AS v4, 1.0/sqrt(5.0) AS v5
          UNION ALL
          SELECT i + 1,
                 CASE WHEN nrm = 0 THEN v1 ELSE nx1/nrm END,
                 CASE WHEN nrm = 0 THEN v2 ELSE nx2/nrm END,
                 CASE WHEN nrm = 0 THEN v3 ELSE nx3/nrm END,
                 CASE WHEN nrm = 0 THEN v4 ELSE nx4/nrm END,
                 CASE WHEN nrm = 0 THEN v5 ELSE nx5/nrm END
          FROM (SELECT b.*,
                  sqrt(((((nx1*nx1 + nx2*nx2) + nx3*nx3) + nx4*nx4) + nx5*nx5)) AS nrm
                FROM (SELECT pi.i, pi.v1, pi.v2, pi.v3, pi.v4, pi.v5,
                        ((((1.0*v1 + m12*v2) + m13*v3) + m14*v4) + m15*v5) AS nx1,
                        ((((m12*v1 + 1.0*v2) + m23*v3) + m24*v4) + m25*v5) AS nx2,
                        ((((m13*v1 + m23*v2) + 1.0*v3) + m34*v4) + m35*v5) AS nx3,
                        ((((m14*v1 + m24*v2) + m34*v3) + 1.0*v4) + m45*v5) AS nx4,
                        ((((m15*v1 + m25*v2) + m35*v3) + m45*v4) + 1.0*v5) AS nx5
                      FROM pi, cm WHERE i < 200) b) c),
        ld AS (SELECT
                 CASE WHEN lsum = 0 THEN CAST(0.2 AS DOUBLE) ELSE a1/lsum END AS l1,
                 CASE WHEN lsum = 0 THEN CAST(0.2 AS DOUBLE) ELSE a2/lsum END AS l2,
                 CASE WHEN lsum = 0 THEN CAST(0.2 AS DOUBLE) ELSE a3/lsum END AS l3,
                 CASE WHEN lsum = 0 THEN CAST(0.2 AS DOUBLE) ELSE a4/lsum END AS l4,
                 CASE WHEN lsum = 0 THEN CAST(0.2 AS DOUBLE) ELSE a5/lsum END AS l5
               FROM (SELECT abs(v1) AS a1, abs(v2) AS a2, abs(v3) AS a3,
                       abs(v4) AS a4, abs(v5) AS a5,
                       ((((abs(v1) + abs(v2)) + abs(v3)) + abs(v4)) + abs(v5)) AS lsum
                     FROM pi WHERE i = 200)),
        we AS (SELECT wy.*,
                 ((((s1*l1 + s2*l2) + s3*l3) + s4*l4) + s5*l5) AS eta
               FROM wy, ld),
        ols AS (SELECT CAST(count(*) AS DOUBLE) AS nd, sum(eta) AS sx,
                       sum(y) AS sy, sum(eta*y) AS sxy,
                       sum(eta*eta) AS sxx, sum(y*y) AS syy
                FROM we),
        fit1 AS (SELECT nd, sx/nd AS xbar, sy/nd AS ybar, sxy, sxx, syy FROM ols),
        fit2 AS (SELECT nd, xbar, ybar,
                   sxx - nd*xbar*xbar AS sxxc,
                   sxy - nd*xbar*ybar AS sxyc,
                   syy - nd*ybar*ybar AS syyc
                 FROM fit1),
        fit3 AS (SELECT nd, xbar, ybar,
                   CASE WHEN sxxc = 0 THEN CAST(0.0 AS DOUBLE) ELSE sxyc/sxxc END AS slope,
                   sxxc, sxyc, syyc
                 FROM fit2),
        fit AS (SELECT nd, xbar, slope, sxxc,
                  ybar - slope*xbar AS intercept,
                  sqrt(greatest(0.0, syyc - slope*sxyc) / greatest(1.0, nd - 2)) AS sigma
                FROM fit3),
        pred AS (SELECT entity_id, eta, y,
                   intercept + slope*eta AS y_hat,
                   sigma * sqrt(1.0/nd + ((eta - xbar)*(eta - xbar)) / greatest(sxxc, 1e-12)) AS pred_se
                 FROM we, fit)
      SELECT entity_id,
             ${oround("eta", 4)} AS eta,
             ${oround("y", 4)} AS y,
             ${oround("y_hat", 4)} AS y_hat,
             ${oround("pred_se", 4)} AS pred_se,
             ${oround("least(100.0, greatest(0.0, y_hat - 1.96 * pred_se))", 4)} AS ci_lower,
             ${oround("least(100.0, greatest(0.0, y_hat + 1.96 * pred_se))", 4)} AS ci_upper
      FROM pred ORDER BY entity_id"""
    })

  // -- M15: distributed bootstrap CI of the mean (sem_confidence.py:185-261)
  //    as an ORACLE-CHECKED query. The poissonized one-scan resampling is
  //    fully deterministic: each (entity, replicate) draws its weight from
  //    an integer-LCG uniform (pure int64 arithmetic — bit-identical in any
  //    engine), so DuckDB replays the exact 400 replicate statistics and
  //    the same interpolated percentile bounds. CI clamped to [0,100] like
  //    the reference (:247-248); ±5 degenerate fallback lives in the
  //    operator (needs <2 rows — not reachable on this data, spec-covered).
  private val bootstrapCi = QueryDef(
    "q_bootstrap_ci",
    (s, dir) => {
      import s.implicits._
      val ci = Bootstrap.distributedMeanCI(
        wideWithY(s, dir).select("entity_id", "y"), "y", "entity_id")
      Seq((ci.lower, ci.upper, ci.se)).toDF("l", "u", "s")
        .select(
          dround(least(lit(100.0), greatest(lit(0.0), col("l"))), 4).as("ci_lower"),
          dround(least(lit(100.0), greatest(lit(0.0), col("u"))), 4).as("ci_upper"),
          dround(col("s"), 4).as("se"))
    },
    Some {
      s"""
      WITH $wideYCtes,
        ex AS (SELECT entity_id, y, unnest(generate_series(0, 399)) AS r FROM wy),
        uu AS (SELECT r, y,
                 (((((((entity_id % 4294967296) * 69069 + 42) % 4294967296)
                     * 69069 + r * 2654435761 + 1) % 4294967296)
                     * 69069 + 1) % 4294967296) AS x3
               FROM ex),
        pu AS (SELECT r, y,
                 CAST(CASE WHEN u < 0.36787944117144233 THEN 0
                           WHEN u < 0.7357588823428847 THEN 1
                           WHEN u < 0.9196986029286058 THEN 2
                           WHEN u < 0.9810118431238462 THEN 3
                           WHEN u < 0.9963401531726563 THEN 4
                           WHEN u < 0.9994058151824183 THEN 5
                           WHEN u < 0.9999167588507119 THEN 6
                           WHEN u < 0.9999897508033253 THEN 7
                           ELSE 8 END AS DOUBLE) AS wt
               FROM (SELECT r, y, (x3 + 0.5) / 4294967296.0 AS u FROM uu)),
        reps AS (SELECT r, sum(wt * y) AS wv, sum(wt) AS ws
                 FROM pu GROUP BY r HAVING sum(wt) > 0),
        st AS (SELECT wv/ws AS stat,
                 row_number() OVER (ORDER BY wv/ws) AS rn,
                 count(*) OVER () AS rr
               FROM reps),
        par AS (SELECT (0.05/2) * (rr - 1) AS ilo,
                       (1.0 - 0.05/2) * (rr - 1) AS ihi
                FROM st LIMIT 1),
        pick AS (SELECT
            max(CASE WHEN rn = CAST(floor(ilo) AS BIGINT) + 1 THEN stat END) AS slo1,
            max(CASE WHEN rn = CAST(ceil(ilo) AS BIGINT) + 1 THEN stat END) AS slo2,
            max(CASE WHEN rn = CAST(floor(ihi) AS BIGINT) + 1 THEN stat END) AS shi1,
            max(CASE WHEN rn = CAST(ceil(ihi) AS BIGINT) + 1 THEN stat END) AS shi2,
            max(ilo) AS ilo, max(ihi) AS ihi
          FROM st, par),
        mn AS (SELECT sum(stat) / max(rr) AS mean_stat FROM st),
        sev AS (SELECT sqrt(sum((stat - mean_stat)*(stat - mean_stat))
                            / greatest(1, max(rr) - 1)) AS se
                FROM st, mn),
        fin AS (SELECT
            slo1 * (1.0 - (ilo - floor(ilo))) + slo2 * (ilo - floor(ilo)) AS lo_raw,
            shi1 * (1.0 - (ihi - floor(ihi))) + shi2 * (ihi - floor(ihi)) AS hi_raw,
            se
          FROM pick, sev)
      SELECT ${oround("least(100.0, greatest(0.0, lo_raw))", 4)} AS ci_lower,
             ${oround("least(100.0, greatest(0.0, hi_raw))", 4)} AS ci_upper,
             ${oround("se", 4)} AS se
      FROM fin"""
    })

  /** Columns profiled by q_table_profile: (name, isNumeric). String
    * columns profile their LENGTH distribution so every stat row is
    * numeric and one `stack` covers both kinds. */
  private val ProfileCols = Seq(
    ("o_orderkey", true), ("o_custkey", true), ("o_totalprice", true),
    ("o_orderstatus", false), ("o_orderpriority", false))

  // -- single-pass table profiler (ANALYZE-style data-quality audit): null
  //    count, exact distinct count, min/max/mean per column, computed in
  //    ONE aggregate over one scan and unpivoted (stack) to long form.
  //    Money means run on the integer-cent grid (order-free, engine-
  //    identical); key/length means are exact integer-sum ÷ count.
  //    Scale notes: multiple exact countDistincts expand the scan (one
  //    Expand row per distinct-agg) — the profiler a 100 TB pipeline
  //    schedules nightly swaps them for approx_count_distinct (HLL, one
  //    pass, no Expand; SketchSpec certifies its error envelope). The
  //    stack() runs over ONE aggregated row — free.
  private val tableProfile = QueryDef(
    "q_table_profile",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      def numExpr(c: String) =
        if (c == "o_totalprice") expr(s"round($c * 100)").cast("long")
        else col(c).cast("long")
      val aggs = ProfileCols.flatMap { case (c, isNum) =>
        val v = if (isNum) numExpr(c) else length(col(c)).cast("long")
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
          countDistinct(col(c)).as(s"${c}__nd"),
          min(v).as(s"${c}__mn"), max(v).as(s"${c}__mx"),
          sum(v).as(s"${c}__sm"), count(v).as(s"${c}__ct"))
      }
      val wide = o.agg(aggs.head, aggs.tail: _*)
      val descale = Map("o_totalprice" -> 100.0).withDefaultValue(1.0)
      val stackArgs = ProfileCols.map { case (c, _) =>
        val d = descale(c)
        s"'$c', ${c}__nn, ${c}__nd, CAST(${c}__mn AS DOUBLE) / $d," +
          s" CAST(${c}__mx AS DOUBLE) / $d," +
          s" CAST(${c}__sm AS DOUBLE) / $d / ${c}__ct"
      }.mkString(", ")
      wide.selectExpr(s"stack(${ProfileCols.size}, $stackArgs) AS " +
          "(col_name, n_null, n_distinct, min_v, max_v, mean_v)")
        .select(col("col_name"), col("n_null"), col("n_distinct"),
          dround(col("min_v"), 4).as("min_v"),
          dround(col("max_v"), 4).as("max_v"),
          dround(col("mean_v"), 4).as("mean_v"))
        .orderBy("col_name")
    },
    Some {
      val rows = ProfileCols.map { case (c, isNum) =>
        val v =
          if (c == "o_totalprice") s"CAST(round($c * 100) AS BIGINT)"
          else if (isNum) s"CAST($c AS BIGINT)"
          else s"CAST(length($c) AS BIGINT)"
        val d = if (c == "o_totalprice") "100.0" else "1.0"
        s"""SELECT '$c' AS col_name,
             CAST(count(*) - count($c) AS BIGINT) AS n_null,
             CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             ${oround(s"CAST(min($v) AS DOUBLE) / $d", 4)} AS min_v,
             ${oround(s"CAST(max($v) AS DOUBLE) / $d", 4)} AS max_v,
             ${oround(
               s"CAST(CAST(sum($v) AS BIGINT) AS DOUBLE) / $d / count($v)",
               4)} AS mean_v
           FROM orders"""
      }
      rows.mkString("", "\n      UNION ALL\n      ",
        "\n      ORDER BY col_name")
    })

  /** Relative-error band certified by q_table_profile_hll: Spark's
    * approx_count_distinct at rsd=0.05 guarantees ~5% standard error; the
    * certified band is 3σ (±15%), floored at ±3 for tiny cardinalities. */
  private val HllRsd = 0.05
  private val HllBand = 3 * HllRsd

  // -- the NIGHTLY-profiler variant q_table_profile's own scale note calls
  //    for: exact countDistinct per column costs one Expand row per
  //    distinct-agg (the scan multiplies by #columns profiled — the
  //    100 TB killer for wide audits); approx_count_distinct (HLL++) is
  //    one pass, no Expand, mergeable state. Cross-engine HLL estimates
  //    can't hash-match (different sketch implementations), so this is
  //    CERTIFIED like q_approx_quantile_bounds: the exact count rides
  //    along and an integer flag proves the estimate landed inside the
  //    ±3σ band; the oracle emits the same exact counts with flag 1, so
  //    the hash gate fails iff the sketch ever leaves its envelope.
  //    Plan shape (round-10 rework, measured 8.6 s → see bench): the
  //    certification rider is per-column UNION branches, NOT one
  //    multi-distinct aggregate — a single distinct-agg per branch plans
  //    as a two-level hash agg with NO Expand, each branch scans exactly
  //    one parquet column, and the HLL buffers never ride an Expand
  //    replica. (The pure 100 TB nightly profiler drops the exact rider
  //    and is genuinely one pass.)
  private val tableProfileHll = QueryDef(
    "q_table_profile_hll",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val branches = ProfileCols.map { case (c, _) =>
        o.agg(countDistinct(col(c)).as("n_exact"),
            approx_count_distinct(col(c), HllRsd).as("apx"))
          .select(lit(c).as("col_name"), col("n_exact"), col("apx"))
      }
      branches.reduce(_ unionByName _)
        .select(col("col_name"), col("n_exact"),
          (abs(col("apx") - col("n_exact")).cast("double") <=
            greatest(lit(3.0), lit(HllBand) * col("n_exact")))
            .cast("long").as("within_bounds"))
        .orderBy("col_name")
    },
    Some {
      val rows = ProfileCols.map { case (c, _) =>
        s"""SELECT '$c' AS col_name,
             CAST(count(DISTINCT $c) AS BIGINT) AS n_exact,
             CAST(1 AS BIGINT) AS within_bounds
           FROM orders"""
      }
      rows.mkString("", "\n      UNION ALL\n      ",
        "\n      ORDER BY col_name")
    })

  // -- robust outlier detection (median/MAD) per event type — the quality
  //    filter that survives heavy tails where mean/stddev z-scores drown.
  //    `value` lives on the cent grid, so the group median (quantile_cont
  //    semantics) lands on the EXACT half-cent grid and MAD on the
  //    quarter-cent grid — every comparison below is exact binary
  //    arithmetic in both engines, no ulp risk. Scale notes: percentile()
  //    buffers per group (bounded here by #event_types ≈ 6 groups); a
  //    100 TB run swaps it for the HistQuantiles histogram plan partitioned
  //    by group — the grid trick is what makes BOTH exact.
  private val madOutliers = QueryDef(
    "q_mad_outliers",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      val med = ev.groupBy("event_type")
        .agg(expr("percentile(c, 0.5)").as("med_c"),
          count(lit(1)).as("n"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("c") - col("med_c")))
      val mad = dev.groupBy("event_type")
        .agg(expr("percentile(adev, 0.5)").as("mad_c"))
      dev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"), col("n"), col("med_c"), col("mad_c"))
        .agg(sum(when(col("adev") > col("mad_c") * 3, 1L).otherwise(0L))
          .as("n_outliers"))
        .select(col("event_type"), col("n"),
          dround(col("med_c") / 100, 4).as("median_value"),
          dround(col("mad_c") / 100, 4).as("mad"),
          col("n_outliers"),
          dround(col("n_outliers") / col("n") * 100, 4).as("outlier_pct"))
        .orderBy("event_type")
    },
    Some(s"""
      WITH ev AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
                  FROM events),
        med AS (SELECT event_type, quantile_cont(c, 0.5) AS med_c,
                  count(*) AS n
                FROM ev GROUP BY event_type),
        dev AS (SELECT e.event_type, abs(e.c - m.med_c) AS adev, m.med_c,
                  m.n
                FROM ev e JOIN med m ON e.event_type = m.event_type),
        mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad_c
                FROM dev GROUP BY event_type),
        fin AS (SELECT d.event_type, d.n, d.med_c, a.mad_c,
                  CAST(sum(CASE WHEN d.adev > a.mad_c * 3 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers
                FROM dev d JOIN mad a ON d.event_type = a.event_type
                GROUP BY d.event_type, d.n, d.med_c, a.mad_c)
      SELECT event_type, n,
             ${oround("med_c / 100", 4)} AS median_value,
             ${oround("mad_c / 100", 4)} AS mad,
             n_outliers,
             ${oround("CAST(n_outliers AS DOUBLE) / n * 100", 4)}
               AS outlier_pct
      FROM fin ORDER BY event_type"""))

  // -- snapshot reconciliation (data diff): classify every key across two
  //    table versions as added / removed / changed / unchanged and report
  //    counts + the money delta per class — the CDC-validation companion
  //    to the MERGE sink (S9): after an upsert lands, this is the query
  //    that PROVES what changed. One full-outer join on the key, classes
  //    from null-side and column comparison, cent-grid deltas. The two
  //    snapshots here are derived deterministically from orders (modulus
  //    carve-outs), so both engines see identical versions.
  private val tableDiff = QueryDef(
    "q_table_diff",
    (s, dir) => {
      val base = Tables.orders(s, dir).select(col("o_orderkey"),
        col("o_orderstatus"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      // old snapshot: keys ≡0 (mod 83) absent (they become "added");
      // new snapshot: keys ≡0 (mod 89) deleted, keys ≡0 (mod 97) get a
      // changed status
      val oldS = base.filter(col("o_orderkey") % 83 =!= 0)
        .select(col("o_orderkey").as("k"),
          col("o_orderstatus").as("old_status"), col("cents").as("old_c"))
      val newS = base.filter(col("o_orderkey") % 89 =!= 0)
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 97 === 0, lit("X"))
            .otherwise(col("o_orderstatus")))
        .select(col("o_orderkey").as("k"),
          col("o_orderstatus").as("new_status"), col("cents").as("new_c"))
      oldS.join(newS, Seq("k"), "full_outer")
        .withColumn("diff_class",
          when(col("old_c").isNull, "added")
            .when(col("new_c").isNull, "removed")
            .when(col("old_status") =!= col("new_status") ||
              col("old_c") =!= col("new_c"), "changed")
            .otherwise("unchanged"))
        .groupBy("diff_class")
        .agg(count(lit(1)).as("n"),
          sum(coalesce(col("new_c"), lit(0L))
            - coalesce(col("old_c"), lit(0L))).as("delta_cents"))
        .select(col("diff_class"), col("n"),
          dround(col("delta_cents") / 100.0, 2).as("price_delta"))
        .orderBy("diff_class")
    },
    Some(s"""
      WITH base AS (SELECT o_orderkey, o_orderstatus,
                      CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                    FROM orders),
        old_s AS (SELECT o_orderkey AS k, o_orderstatus AS old_status,
                    cents AS old_c
                  FROM base WHERE o_orderkey % 83 <> 0),
        new_s AS (SELECT o_orderkey AS k,
                    CASE WHEN o_orderkey % 97 = 0 THEN 'X'
                         ELSE o_orderstatus END AS new_status,
                    cents AS new_c
                  FROM base WHERE o_orderkey % 89 <> 0),
        d AS (SELECT coalesce(o.k, n.k) AS k,
                CASE WHEN o.old_c IS NULL THEN 'added'
                     WHEN n.new_c IS NULL THEN 'removed'
                     WHEN o.old_status <> n.new_status
                       OR o.old_c <> n.new_c THEN 'changed'
                     ELSE 'unchanged' END AS diff_class,
                coalesce(n.new_c, 0) - coalesce(o.old_c, 0) AS delta
              FROM old_s o FULL OUTER JOIN new_s n ON o.k = n.k)
      SELECT diff_class, count(*) AS n,
             ${oround("CAST(sum(delta) AS BIGINT) / 100.0", 2)}
               AS price_delta
      FROM d GROUP BY diff_class ORDER BY diff_class"""))

  // -- rank-transform (quantile) normalization: each user's mean event
  //    value mapped to its within-type percent_rank — the distribution-
  //    free feature normalizer. A bare per-type window would funnel every
  //    user of a type through ONE task at 100 TB, so the rank runs as the
  //    bucketed two-pass prefix sum (ScorePipeline's percentile pattern):
  //    rank within (type, dollar-bucket) in parallel + cumulative bucket
  //    offsets (the only per-type window runs over ~100 BUCKET rows).
  //    The DuckDB oracle uses plain percent_rank(), so the hash compare
  //    PROVES the distributed formulation reproduces it exactly —
  //    including tie semantics (means quantized to the 1e-4 grid; equal
  //    means share a bucket and a within-bucket rank).
  private val quantileNormalize = QueryDef(
    "q_quantile_normalize",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val pu = Tables.events(s, dir)
        .groupBy("event_type", "user_id")
        .agg((sum(expr("CAST(round(value * 100) AS BIGINT)"))
          .cast("double") / count(lit(1))).as("mean_c"))
        .withColumn("qm", dround(col("mean_c"), 4))
        .withColumn("bkt", floor(col("qm") / 100).cast("long"))
      Cached.withPinned(pu) { case Seq(pu) => // r15: pin + plan-truncate
        val counts = pu.groupBy("event_type", "bkt")
          .agg(count(lit(1)).as("bn"))
        val offs = counts.withColumn("off", coalesce(
            sum("bn").over(Window.partitionBy("event_type").orderBy("bkt")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("event_type", "bkt", "off")
        val totals = counts.groupBy("event_type").agg(sum("bn").as("n"))
        val wIn = Window.partitionBy("event_type", "bkt")
          .orderBy(col("qm").asc)
        pu.withColumn("rin", rank().over(wIn))
          .join(broadcast(offs), Seq("event_type", "bkt"))
          .join(broadcast(totals), Seq("event_type"))
          .withColumn("qn", when(col("n") === 1, lit(0.0))
            .otherwise((col("off") + col("rin") - 1).cast("double")
              / (col("n") - 1)))
          .filter(col("user_id") < 40)
          .select(col("event_type"), col("user_id"),
            dround(col("mean_c") / 100, 4).as("mean_value"),
            dround(col("qn"), 6).as("qnorm"))
          .orderBy("event_type", "user_id")
      }
    },
    Some(s"""
      WITH per_user AS (
        SELECT event_type, user_id,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                 / count(*) AS mean_c
        FROM events GROUP BY event_type, user_id),
        ranked AS (SELECT event_type, user_id, mean_c,
                     percent_rank() OVER (PARTITION BY event_type
                       ORDER BY ${oround("mean_c", 4)} ASC) AS qn
                   FROM per_user)
      SELECT event_type, user_id,
             ${oround("mean_c / 100", 4)} AS mean_value,
             ${oround("qn", 6)} AS qnorm
      FROM ranked WHERE user_id < 40
      ORDER BY event_type, user_id"""))

  // -- Benford leading-digit audit (data-quality family, next to the
  //    profiler and MAD outliers): the classic fabricated-data smell test
  //    over a money column. Digit counts are exact longs; shares are one
  //    long/long division; the Benford expectations are IDENTICAL double
  //    literals in both engines (computing log10(1+1/d) at runtime would
  //    hostage the hash gate to libm differences). Natural price data
  //    won't follow Benford exactly — the JUDGMENT column is the ranked
  //    deviation, which is what an auditor sorts by.
  private val BenfordExpected = Seq(
    1 -> 0.30103, 2 -> 0.176091, 3 -> 0.124939, 4 -> 0.09691,
    5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992, 8 -> 0.051153,
    9 -> 0.045757)

  private val benfordAudit = QueryDef(
    "q_benford_audit",
    (s, dir) => {
      val expDf = {
        import s.implicits._
        BenfordExpected.toDF("digit", "expected")
      }
      val o = Tables.orders(s, dir)
        .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
        .withColumn("digit",
          substring(col("cents").cast("string"), 1, 1).cast("int"))
      val total = o.count() // one metadata-cheap action; exact N for shares
      o.groupBy("digit").agg(count(lit(1)).as("n"))
        .join(broadcast(expDf), "digit")
        .select(col("digit"), col("n"),
          dround(col("n").cast("double") / total, 6).as("share"),
          col("expected"),
          dround(abs(col("n").cast("double") / total - col("expected")), 6)
            .as("abs_dev"))
        .orderBy("digit")
    },
    Some {
      val expRows = BenfordExpected
        .map { case (d, e) => s"($d, $e)" }.mkString(", ")
      s"""
      WITH exp(digit, expected) AS (VALUES $expRows),
        d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                       AS VARCHAR), 1, 1) AS INT) AS digit
              FROM orders),
        t AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM d),
        g AS (SELECT digit, count(*) AS n FROM d GROUP BY digit)
      SELECT g.digit, g.n,
             ${oround("g.n / t.total", 6)} AS share,
             CAST(e.expected AS DOUBLE) AS expected,
             ${oround("abs(g.n / t.total - e.expected)", 6)} AS abs_dev
      FROM g JOIN exp e ON g.digit = e.digit CROSS JOIN t
      ORDER BY g.digit"""
    })

  // -- Winsorized mean of order totals (clamp at the exact p05/p95): the
  //    robust-mean companion to q_mad_outliers' flagging — report what
  //    the mean WOULD be with tail influence capped. Quantile cuts come
  //    from HistQuantiles (audited two-pass); the cuts snap to integer
  //    cents via explicit floor(x+0.5) (NOT native round, which disagrees
  //    between engines on repr boundaries), so the clamped sum is an
  //    exact long.
  private val winsorizedMean = QueryDef(
    "q_winsorized_mean",
    (s, dir) => {
      import graft.operators.HistQuantiles
      val o = Tables.orders(s, dir)
        .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      Cached.withPinned(o) { case Seq(o) => // r15: pin + plan-truncate
        val cuts = HistQuantiles.quantiles(o, col("cents"), Seq(0.05, 0.95))
          .agg(min(when(col("q") === 0.05,
            floor(col("value") + 0.5).cast("long"))).as("lo"),
            min(when(col("q") === 0.95,
              floor(col("value") + 0.5).cast("long"))).as("hi"))
        o.crossJoin(broadcast(cuts))
          .agg(count(lit(1)).as("n"),
            sum("cents").as("raw_sum"),
            sum(least(greatest(col("cents"), col("lo")), col("hi")))
              .as("win_sum"),
            first("lo").as("lo"), first("hi").as("hi"))
          .select(col("n"),
            dround(col("raw_sum").cast("double") / col("n") / 100.0, 4)
              .as("raw_mean"),
            dround(col("win_sum").cast("double") / col("n") / 100.0, 4)
              .as("winsorized_mean"),
            dround(col("lo") / 100.0, 2).as("p05"),
            dround(col("hi") / 100.0, 2).as("p95"))
      }
    },
    Some(s"""
      WITH o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                 FROM orders),
        cuts AS (SELECT
                   CAST(floor(quantile_cont(cents, 0.05) + 0.5) AS BIGINT)
                     AS lo,
                   CAST(floor(quantile_cont(cents, 0.95) + 0.5) AS BIGINT)
                     AS hi
                 FROM o),
        agg AS (SELECT count(*) AS n,
                  CAST(sum(cents) AS BIGINT) AS raw_sum,
                  CAST(sum(least(greatest(cents, lo), hi)) AS BIGINT)
                    AS win_sum,
                  any_value(lo) AS lo, any_value(hi) AS hi
                FROM o, cuts)
      SELECT n,
             ${oround("CAST(raw_sum AS DOUBLE) / n / 100.0", 4)} AS raw_mean,
             ${oround("CAST(win_sum AS DOUBLE) / n / 100.0", 4)}
               AS winsorized_mean,
             ${oround("lo / 100.0", 2)} AS p05,
             ${oround("hi / 100.0", 2)} AS p95
      FROM agg"""))

  /** k-anonymity threshold: a quasi-identifier group smaller than this
    * re-identifies its members [Sweeney 2002]. */
  private val KAnonK = 5

  // -- k-anonymity audit over the customer table — the privacy gate a
  //    training-data release pipeline runs BEFORE shipping user-derived
  //    rows (the structural sibling of q_pii_redaction's content gate).
  //    Quasi-identifier = (market segment, nation, account-balance band):
  //    each attribute survives redaction individually, but their JOIN
  //    distribution is what re-identifies. Per segment: the k-anonymity
  //    level (min group size), how many groups sit below k=5, and how
  //    many rows those groups expose. One groupBy cascade — linear,
  //    map-side-combinable, no window, no join; banding runs on the cent
  //    grid with floor() (not DIV — negative balances must band downward
  //    identically in both engines).
  private val kAnonymity = QueryDef(
    "q_k_anonymity",
    (s, dir) => {
      val qi = Tables.customer(s, dir).select(
        col("c_mktsegment").as("seg"), col("c_nationkey").as("nat"),
        expr("CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT) / 100000.0)" +
          " AS BIGINT)").as("band"))
      qi.groupBy("seg", "nat", "band").agg(count(lit(1)).as("gn"))
        .groupBy("seg")
        .agg(sum("gn").as("n_rows"),
          count(lit(1)).as("n_groups"),
          min("gn").as("k_anonymity"),
          sum(when(col("gn") < KAnonK, 1L).otherwise(0L))
            .as("groups_below_k"),
          sum(when(col("gn") < KAnonK, col("gn")).otherwise(0L))
            .as("rows_at_risk"))
        .orderBy("seg")
    },
    Some(s"""
      WITH qi AS (SELECT c_mktsegment AS seg, c_nationkey AS nat,
                    CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT)
                      / 100000.0) AS BIGINT) AS band
                  FROM customer),
        g AS (SELECT seg, nat, band, CAST(count(*) AS BIGINT) AS gn
              FROM qi GROUP BY 1, 2, 3)
      SELECT seg, CAST(sum(gn) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(min(gn) AS BIGINT) AS k_anonymity,
             CAST(sum(CASE WHEN gn < $KAnonK THEN 1 ELSE 0 END) AS BIGINT)
               AS groups_below_k,
             CAST(sum(CASE WHEN gn < $KAnonK THEN gn ELSE 0 END) AS BIGINT)
               AS rows_at_risk
      FROM g GROUP BY seg ORDER BY seg"""))

  // -- Cohen's kappa [Cohen 1960] between two document-quality raters,
  //    per language — the inter-annotator-agreement gate a labeling /
  //    quality-filter pipeline runs before trusting either rule set
  //    (kappa corrects raw agreement for chance: two raters that both
  //    pass ~everything agree often but mean nothing). Raters here are
  //    two fixed deterministic rule sets over (token count, avg word
  //    length) — integer-grid comparisons, so the confusion cells are
  //    exact longs and kappa is one double expression on them. One
  //    groupBy over the corpus: linear, map-side-combinable, bounded
  //    output (#langs). Degenerate guard: p_e = 1 (both raters constant)
  //    defines kappa = 1 in both engines instead of 0/0.
  private val cohensKappa = QueryDef(
    "q_cohens_kappa",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("n_toks", size(split(col("text"), " ")).cast("long"))
        .withColumn("char_mass",
          (length(col("text")) - (col("n_toks") - 1)).cast("long"))
        .withColumn("a", (col("n_toks") >= 10 &&
          col("char_mass") <= col("n_toks") * 12).cast("long"))
        .withColumn("b", (col("n_toks") >= 8 &&
          col("char_mass") <= col("n_toks") * 11).cast("long"))
      d.groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("a").as("sa"), sum("b").as("sb"),
          sum(col("a") * col("b")).as("s11"))
        .withColumn("s00", col("n") - col("sa") - col("sb") + col("s11"))
        .withColumn("po",
          (col("s11") + col("s00")).cast("double") / col("n"))
        // chance term from RATIOS, never integer products: sa*sb and n*n
        // wrap silently past n ≈ 3e9 (the per-language counts the 100 TB
        // design point implies) while DuckDB raises on BIGINT overflow —
        // the engines would fail DIFFERENTLY at scale. (sa/n)*(sb/n) is
        // exact IEEE on both sides and never leaves [0, 1]. The expression
        // tree is kept textually identical in the oracle so the doubles
        // are bit-identical.
        .withColumn("pe",
          (col("sa").cast("double") / col("n"))
            * (col("sb").cast("double") / col("n"))
            + ((col("n") - col("sa")).cast("double") / col("n"))
            * ((col("n") - col("sb")).cast("double") / col("n")))
        .select(col("lang"), col("n"), col("sa").as("a_pass"),
          col("sb").as("b_pass"), col("s11").as("both_pass"),
          dround(col("po"), 6).as("p_observed"),
          dround(col("pe"), 6).as("p_chance"),
          dround(when(col("pe") === 1.0, lit(1.0))
            .otherwise((col("po") - col("pe")) / (lit(1.0) - col("pe"))), 6)
            .as("kappa"))
        .orderBy("lang")
    },
    Some(s"""
      WITH d AS (SELECT lang,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
                   CAST(length(text) - (len(string_split(text, ' ')) - 1)
                     AS BIGINT) AS char_mass
                 FROM documents),
        r AS (SELECT lang,
                CASE WHEN n_toks >= 10 AND char_mass <= n_toks * 12
                  THEN 1 ELSE 0 END AS a,
                CASE WHEN n_toks >= 8 AND char_mass <= n_toks * 11
                  THEN 1 ELSE 0 END AS b
              FROM d),
        agg AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(a) AS BIGINT) AS sa,
                  CAST(sum(b) AS BIGINT) AS sb,
                  CAST(sum(a * b) AS BIGINT) AS s11
                FROM r GROUP BY lang),
        k AS (SELECT lang, n, sa, sb, s11, n - sa - sb + s11 AS s00,
                CAST(s11 + (n - sa - sb + s11) AS DOUBLE) / n AS po,
                (CAST(sa AS DOUBLE) / n) * (CAST(sb AS DOUBLE) / n)
                  + (CAST(n - sa AS DOUBLE) / n) * (CAST(n - sb AS DOUBLE) / n)
                  AS pe
              FROM agg)
      SELECT lang, n, sa AS a_pass, sb AS b_pass, s11 AS both_pass,
             ${oround("po", 6)} AS p_observed,
             ${oround("pe", 6)} AS p_chance,
             ${oround(
               "CASE WHEN pe = 1.0 THEN 1.0 ELSE (po - pe) / (1.0 - pe) END",
               6)} AS kappa
      FROM k ORDER BY lang"""))

  override def queries: Seq[QueryDef] = Seq(
    semReliability, semBounds, upsertLastWins, dedupGate, pcaOlsCi,
    bootstrapCi, tableProfile, tableProfileHll, madOutliers, tableDiff,
    quantileNormalize, benfordAudit, winsorizedMean, kAnonymity,
    cohensKappa)
}
