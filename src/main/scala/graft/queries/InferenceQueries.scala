package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.GridCum
import Det.{dround, oround}

/** Statistical inference / distribution-comparison operators: the
  * hypothesis-test layer a data-curation pipeline runs to decide whether
  * two cohorts differ (A/B gates, drift detection between ingest batches,
  * inequality profiling of spend). Every test statistic is computed from
  * EXACT integer tallies on the cents grid (`round(x*100)`), so Spark and
  * the DuckDB oracle do bit-identical arithmetic; rank-based statistics
  * (KS, Mann-Whitney, Gini) use [[GridCum]]'s two-pass bucketed cumsum —
  * no global single-task window anywhere.
  *
  * Reference anchor: the reference validates score distributions across
  * portfolio cohorts (pe-org-air-platform sem_confidence / portfolio
  * validation); these are the same comparisons as reusable operators.
  */
object InferenceQueries extends QueryModule {

  private def centsEv = "CAST(round(value * 100) AS BIGINT)"

  /** hist of per-distinct-value counts for a two-sample pair. */
  private def pairHist(s: org.apache.spark.sql.SparkSession, dir: String,
      a: String, b: String) =
    Tables.events(s, dir)
      .filter(col("event_type").isin(a, b))
      .select(expr(centsEv).as("v"), col("event_type"))
      .groupBy("v")
      .agg(sum(when(col("event_type") === a, 1L).otherwise(0L)).as("n1"),
        sum(when(col("event_type") === b, 1L).otherwise(0L)).as("n2"))

  private def pairHistSql(a: String, b: String) =
    s"""h AS (SELECT v,
             CAST(sum(CASE WHEN event_type = '$a' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN event_type = '$b' THEN 1 ELSE 0 END) AS BIGINT) AS n2
           FROM (SELECT event_type, $centsEv AS v FROM events
                 WHERE event_type IN ('$a', '$b'))
           GROUP BY v)"""

  // -- Two-sample Kolmogorov–Smirnov distance between the purchase and
  //    view value distributions: D = max_v |F1(v) - F2(v)| over the
  //    shared cents grid, plus the value where the gap peaks.
  //
  //    Scale shape: tallies are per-distinct-cents (grid-bounded, not
  //    row-bounded); the CDF cumsum is GridCum's two-pass bucketed form;
  //    the argmax is a TakeOrdered(1). At 100 TB the only thing that
  //    grows is the per-value tally shuffle, which AQE coalesces.
  private val ksTwoSample = QueryDef(
    "q_ks_two_sample",
    (s, dir) => {
      val h = pairHist(s, dir, "purchase", "view")
      Cached.withPinned(h) { case Seq(h) => // r15: pin + plan-truncate
      val cum = GridCum.cum(h, Nil, "v", Seq("n1", "n2"))
      val tot = h.agg(sum("n1").as("n_a"), sum("n2").as("n_b"))
      cum.crossJoin(broadcast(tot))
        .withColumn("dd", abs(col("cum_n1").cast("double") / col("n_a")
          - col("cum_n2").cast("double") / col("n_b")))
        .orderBy(col("dd").desc, col("v").asc)
        .limit(1)
        .select(dround(col("dd"), 6).as("ks_d"),
          dround(col("v") / 100.0, 2).as("at_value"),
          col("n_a"), col("n_b"))
      }
    },
    Some(s"""
      WITH ${pairHistSql("purchase", "view")},
        c AS (SELECT v,
                CAST(sum(n1) OVER (ORDER BY v) AS DOUBLE) AS c1,
                CAST(sum(n2) OVER (ORDER BY v) AS DOUBLE) AS c2
              FROM h),
        t AS (SELECT CAST(sum(n1) AS BIGINT) AS n_a,
                     CAST(sum(n2) AS BIGINT) AS n_b FROM h),
        d AS (SELECT v, abs(c1 / t.n_a - c2 / t.n_b) AS dd FROM c, t)
      SELECT ${oround("dd", 6)} AS ks_d,
             ${oround("v / 100.0", 2)} AS at_value, t.n_a, t.n_b
      FROM d, t ORDER BY dd DESC, v ASC LIMIT 1"""))

  // -- Mann–Whitney U (Wilcoxon rank-sum) for click vs error values, with
  //    midranks for ties and the tie-corrected normal approximation.
  //
  //    All rank arithmetic stays in LONGS: 2*midrank = 2*cumBelow + t + 1
  //    is integral on the tie-group grid, so 2*R1 = Σ n1*(2*cumBelow+t+1)
  //    is an exact integer in both engines — no order-dependent double
  //    summation before the final scalar formulas.
  private val mannWhitney = QueryDef(
    "q_mannwhitney_u",
    (s, dir) => {
      val h = pairHist(s, dir, "click", "error")
      Cached.withPinned(h) { case Seq(h) => // r15: pin + plan-truncate
      val cum = GridCum.cum(h, Nil, "v", Seq("n1", "n2"))
        .withColumn("t", col("n1") + col("n2"))
        .withColumn("below", col("cum_n1") + col("cum_n2") - col("t"))
      val agg = cum.agg(
        sum(col("n1") * (col("below") * 2L + col("t") + 1L)).as("r2x"),
        sum(col("t") * col("t") * col("t") - col("t")).as("ties"),
        sum("n1").as("n_a"), sum("n2").as("n_b"))
      agg
        .withColumn("nn", col("n_a") + col("n_b"))
        .withColumn("u1", col("r2x").cast("double") / 2.0
          - col("n_a").cast("double") * (col("n_a") + 1L) / 2.0)
        .withColumn("mu", col("n_a").cast("double") * col("n_b") / 2.0)
        .withColumn("vr", col("n_a").cast("double") * col("n_b") / 12.0
          * ((col("nn") + 1L).cast("double")
            - col("ties").cast("double")
              / (col("nn").cast("double") * (col("nn") - 1L))))
        .select(dround(col("u1"), 2).as("u_stat"),
          dround((col("u1") - col("mu")) / sqrt(col("vr")), 4).as("z_score"),
          col("n_a"), col("n_b"))
      }
    },
    Some(s"""
      WITH ${pairHistSql("click", "error")},
        c AS (SELECT v, n1, n2, n1 + n2 AS t,
                CAST(sum(n1 + n2) OVER (ORDER BY v) AS BIGINT)
                  - (n1 + n2) AS below
              FROM h),
        a AS (SELECT CAST(sum(n1 * (below * 2 + t + 1)) AS BIGINT) AS r2x,
                     CAST(sum(t * t * t - t) AS BIGINT) AS ties,
                     CAST(sum(n1) AS BIGINT) AS n_a,
                     CAST(sum(n2) AS BIGINT) AS n_b
              FROM c),
        f AS (SELECT r2x, ties, n_a, n_b, n_a + n_b AS nn,
                CAST(r2x AS DOUBLE) / 2.0
                  - CAST(n_a AS DOUBLE) * (n_a + 1) / 2.0 AS u1,
                CAST(n_a AS DOUBLE) * n_b / 2.0 AS mu,
                CAST(n_a AS DOUBLE) * n_b / 12.0
                  * ((CAST(nn AS DOUBLE) + 1)
                    - CAST(ties AS DOUBLE)
                      / (CAST(nn AS DOUBLE) * (nn - 1))) AS vr
              FROM a)
      SELECT ${oround("u1", 2)} AS u_stat,
             ${oround("(u1 - mu) / sqrt(vr)", 4)} AS z_score, n_a, n_b
      FROM f"""))

  // -- Chi-square test of independence between event_type and day-of-week,
  //    with Cramér's V effect size. The contingency table is built on the
  //    FULL row×col grid (missing cells contribute (0-e)²/e = e), expected
  //    counts from broadcast marginals. Pure map-side-combinable counting:
  //    the scan aggregates to a 5×7 table no matter the input size.
  private val chiSquare = QueryDef(
    "q_chi_square_indep",
    (s, dir) => {
      val cells = Tables.events(s, dir)
        .select(col("event_type"),
          expr("((ts_us div 86400000000) + 4) % 7").as("dow"))
        .groupBy("event_type", "dow").agg(count(lit(1)).as("o"))
      Cached.withPinned(cells) { case Seq(cells) => // r15: pin + plan-truncate
      val rt = cells.groupBy("event_type").agg(sum("o").as("rt"))
      val ct = cells.groupBy("dow").agg(sum("o").as("ct"))
      val tot = cells.agg(sum("o").as("nn"),
        countDistinct("event_type").as("r"), countDistinct("dow").as("c"))
      val grid = rt.crossJoin(ct).crossJoin(broadcast(tot))
        .join(cells, Seq("event_type", "dow"), "left")
        .withColumn("e",
          col("rt").cast("double") * col("ct") / col("nn"))
        .withColumn("oo", coalesce(col("o"), lit(0L)).cast("double"))
      grid.groupBy("nn", "r", "c")
        .agg(sum((col("oo") - col("e")) * (col("oo") - col("e")) / col("e"))
          .as("chi2"))
        .select(dround(col("chi2"), 4).as("chi2"),
          ((col("r") - 1) * (col("c") - 1)).as("df"),
          dround(sqrt(col("chi2")
            / (col("nn") * least(col("r") - 1, col("c") - 1))), 4)
            .as("cramers_v"),
          col("nn").as("n"))
      }
    },
    Some(s"""
      WITH cells AS (SELECT event_type,
                       ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
                       CAST(count(*) AS BIGINT) AS o
                     FROM events GROUP BY 1, 2),
        rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt
               FROM cells GROUP BY 1),
        ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
        tot AS (SELECT CAST(sum(o) AS BIGINT) AS nn,
                       CAST(count(DISTINCT event_type) AS BIGINT) AS r,
                       CAST(count(DISTINCT dow) AS BIGINT) AS c
                FROM cells),
        grid AS (SELECT rt.event_type, ct.dow, rt.rt, ct.ct, tot.nn, tot.r,
                        tot.c,
                        CAST(rt.rt AS DOUBLE) * ct.ct / tot.nn AS e,
                        CAST(coalesce(cells.o, 0) AS DOUBLE) AS oo
                 FROM rt CROSS JOIN ct CROSS JOIN tot
                 LEFT JOIN cells ON cells.event_type = rt.event_type
                                AND cells.dow = ct.dow),
        agg AS (SELECT nn, r, c,
                  sum((oo - e) * (oo - e) / e) AS chi2
                FROM grid GROUP BY nn, r, c)
      SELECT ${oround("chi2", 4)} AS chi2,
             (r - 1) * (c - 1) AS df,
             ${oround("sqrt(chi2 / (nn * least(r - 1, c - 1)))", 4)}
               AS cramers_v,
             nn AS n
      FROM agg"""))

  // -- Welch's unequal-variance t-test: AUTOMOBILE vs FURNITURE account
  //    balances. One conditional-aggregation scan produces the six exact
  //    integer moments (counts + cents sums + cents² sums); every
  //    downstream number is scalar double arithmetic on those — identical
  //    in both engines. Long cents² sums hold to ~1e18; past that the
  //    moment columns switch to doubles (same formulas, last-ulp rounding
  //    absorbed by dround).
  private val welchT = QueryDef(
    "q_welch_ttest",
    (s, dir) => {
      val c = Tables.customer(s, dir)
        .filter(col("c_mktsegment").isin("AUTOMOBILE", "FURNITURE"))
        .select(col("c_mktsegment").as("seg"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cb"))
      val m = c.agg(
        sum(when(col("seg") === "AUTOMOBILE", 1L).otherwise(0L)).as("na"),
        sum(when(col("seg") === "AUTOMOBILE", col("cb")).otherwise(0L)).as("sa"),
        sum(when(col("seg") === "AUTOMOBILE", col("cb") * col("cb"))
          .otherwise(0L)).as("qa"),
        sum(when(col("seg") === "FURNITURE", 1L).otherwise(0L)).as("nb"),
        sum(when(col("seg") === "FURNITURE", col("cb")).otherwise(0L)).as("sb"),
        sum(when(col("seg") === "FURNITURE", col("cb") * col("cb"))
          .otherwise(0L)).as("qb"))
      m.withColumn("ma", col("sa").cast("double") / col("na"))
        .withColumn("mb", col("sb").cast("double") / col("nb"))
        .withColumn("va", (col("qa").cast("double")
          - col("sa").cast("double") * col("sa") / col("na"))
          / (col("na") - 1L))
        .withColumn("vb", (col("qb").cast("double")
          - col("sb").cast("double") * col("sb") / col("nb"))
          / (col("nb") - 1L))
        .withColumn("sea", col("va") / col("na"))
        .withColumn("seb", col("vb") / col("nb"))
        .select(col("na").as("n_a"), col("nb").as("n_b"),
          dround(col("ma") / 100.0, 4).as("mean_a"),
          dround(col("mb") / 100.0, 4).as("mean_b"),
          dround((col("ma") - col("mb")) / sqrt(col("sea") + col("seb")), 4)
            .as("t_stat"),
          dround((col("sea") + col("seb")) * (col("sea") + col("seb"))
            / (col("sea") * col("sea") / (col("na") - 1L)
              + col("seb") * col("seb") / (col("nb") - 1L)), 2).as("df"))
    },
    Some(s"""
      WITH c AS (SELECT c_mktsegment AS seg,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS cb
                 FROM customer
                 WHERE c_mktsegment IN ('AUTOMOBILE', 'FURNITURE')),
        m AS (SELECT
                CAST(sum(CASE WHEN seg = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS na,
                CAST(sum(CASE WHEN seg = 'AUTOMOBILE' THEN cb ELSE 0 END) AS BIGINT) AS sa,
                CAST(sum(CASE WHEN seg = 'AUTOMOBILE' THEN cb * cb ELSE 0 END) AS BIGINT) AS qa,
                CAST(sum(CASE WHEN seg = 'FURNITURE' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
                CAST(sum(CASE WHEN seg = 'FURNITURE' THEN cb ELSE 0 END) AS BIGINT) AS sb,
                CAST(sum(CASE WHEN seg = 'FURNITURE' THEN cb * cb ELSE 0 END) AS BIGINT) AS qb
              FROM c),
        f AS (SELECT na, nb,
                CAST(sa AS DOUBLE) / na AS ma,
                CAST(sb AS DOUBLE) / nb AS mb,
                (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / na)
                  / (na - 1) AS va,
                (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / nb)
                  / (nb - 1) AS vb
              FROM m),
        g AS (SELECT na, nb, ma, mb, va / na AS sea, vb / nb AS seb FROM f)
      SELECT na AS n_a, nb AS n_b,
             ${oround("ma / 100.0", 4)} AS mean_a,
             ${oround("mb / 100.0", 4)} AS mean_b,
             ${oround("(ma - mb) / sqrt(sea + seb)", 4)} AS t_stat,
             ${oround(
               "(sea + seb) * (sea + seb) / (sea * sea / (na - 1) + seb * seb / (nb - 1))",
               2)} AS df
      FROM g"""))

  // -- Per-nation Gini coefficient of customer lifetime spend: inequality
  //    profiling of the revenue base. Uses the rank-sum identity on tie
  //    groups — Σ rank·x over a tie run of m equal values x with cumBelow
  //    predecessors is x·(m·cumBelow + m(m+1)/2) — so the whole statistic
  //    reduces to per-distinct-(nation, spend) tallies + GridCum's bucketed
  //    cumsum. No per-customer window; arithmetic exact in longs until the
  //    final scalar division.
  private val giniSpend = QueryDef(
    "q_gini_spend",
    (s, dir) => {
      val spend = Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
      val byNation = spend
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("x")).agg(count(lit(1)).as("m"))
      Cached.withPinned(byNation) { case Seq(byNation) => // r15: pin + plan-truncate
      val cum = GridCum.cum(byNation, Seq("n_name"), "x", Seq("m"),
        bucketWidth = 1L << 22)
        .withColumn("below", col("cum_m") - col("m"))
        // `div`, not `/`: Column./ on longs is double division; m(m+1) is
        // even so the integer quotient is exact
        .withColumn("ix", expr("x * (m * below + (m * (m + 1)) div 2)"))
      cum.groupBy("n_name")
        // sx weights each distinct spend by its tie count — sum(x) alone
        // is only equal when every spend is unique (true at sf0.01, NOT
        // at sf1 where the key-shift clones customers 10×)
        .agg(sum("m").as("n_cust"), sum(expr("x * m")).as("sx"),
          sum("ix").as("six"))
        .select(col("n_name"), col("n_cust"),
          dround(lit(2.0) * col("six")
            / (col("n_cust").cast("double") * col("sx"))
            - (col("n_cust") + 1L).cast("double") / col("n_cust"), 6)
            .as("gini"))
        .orderBy("n_name")
      }
    },
    Some(s"""
      WITH spend AS (SELECT o_custkey,
                       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                         AS BIGINT) AS x
                     FROM orders GROUP BY 1),
        t AS (SELECT n_name, x, CAST(count(*) AS BIGINT) AS m
              FROM spend
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              GROUP BY 1, 2),
        c AS (SELECT n_name, x, m,
                CAST(sum(m) OVER (PARTITION BY n_name ORDER BY x)
                  AS BIGINT) - m AS below
              FROM t),
        a AS (SELECT n_name,
                CAST(sum(m) AS BIGINT) AS n_cust,
                CAST(sum(x * m) AS BIGINT) AS sx,
                CAST(sum(x * (m * below + m * (m + 1) // 2)) AS BIGINT) AS six
              FROM c GROUP BY 1)
      SELECT n_name, n_cust,
             ${oround(
               "2.0 * six / (CAST(n_cust AS DOUBLE) * sx) - CAST(n_cust + 1 AS DOUBLE) / n_cust",
               6)} AS gini
      FROM a ORDER BY n_name"""))

  // -- Sample autocorrelation of the daily event-value series at lags
  //    1 / 7 / 14 (drift + weekly seasonality detection). The raw stream
  //    collapses to one row per day (calendar-bounded) before anything
  //    quadratic-looking happens; lag pairing is an equi-join on day+k
  //    over that tiny frame, and the normalizer is the full-series moment.
  private val acfDaily = QueryDef(
    "q_acf_daily",
    (s, dir) => {
      import s.implicits._
      val daily = Tables.events(s, dir)
        .groupBy(expr("ts_us div 86400000000").as("day"))
        .agg(sum(expr(centsEv)).as("x"))
      Cached.withPinned(daily) { case Seq(daily) => // r15: pin + plan-truncate
        val mo = daily.agg(
          (sum("x").cast("double") / count(lit(1))).as("xbar"),
          count(lit(1)).as("nd"))
        val cen = daily.crossJoin(broadcast(mo))
        val den = cen
          .agg(sum((col("x") - col("xbar")) * (col("x") - col("xbar")))
            .as("den"))
        val lags = Seq(1, 7, 14).toDF("lag")
        val pairs = cen.crossJoin(broadcast(lags))
          .select(col("day") + col("lag"), col("lag"), col("x"), col("xbar"))
          .toDF("day", "lag", "x0", "xbar")
          .join(cen.select(col("day"), col("x").as("x1")), Seq("day"))
        pairs.groupBy("lag")
          .agg(count(lit(1)).as("n_pairs"),
            sum((col("x0") - col("xbar")) * (col("x1") - col("xbar")))
              .as("num"))
          .crossJoin(broadcast(den))
          .select(col("lag"), col("n_pairs"),
            dround(col("num") / col("den"), 6).as("acf"))
          .orderBy("lag")
      }
    },
    Some(s"""
      WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
                       CAST(sum($centsEv) AS BIGINT) AS x
                     FROM events GROUP BY 1),
        mo AS (SELECT CAST(sum(x) AS DOUBLE) / count(*) AS xbar FROM daily),
        den AS (SELECT sum((x - mo.xbar) * (x - mo.xbar)) AS den
                FROM daily, mo),
        lags AS (SELECT unnest([1, 7, 14]) AS lag),
        pairs AS (SELECT l.lag,
                    (a.x - mo.xbar) * (b.x - mo.xbar) AS p
                  FROM daily a
                  CROSS JOIN lags l
                  JOIN daily b ON b.day = a.day + l.lag
                  CROSS JOIN mo),
        agg AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
                  sum(p) AS num
                FROM pairs GROUP BY lag)
      SELECT lag, n_pairs, ${oround("num / den.den", 6)} AS acf
      FROM agg, den ORDER BY lag"""))

  // -- CUSUM changepoint scan per event type: standardize the daily-mean
  //    series by its own (μ, σ_pop), cumulate the z-scores in day order,
  //    and report where |S| peaks — the classic shift detector. Ranking
  //    happens on the ROUNDED |S| (6 dp) with a day tie-break so the
  //    argmax can't flip on last-ulp double noise between engines. All
  //    windows partition by event_type over calendar-bounded day frames.
  private val cusumChange = QueryDef(
    "q_cusum_changepoint",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(sum(expr(centsEv)).as("sc"), count(lit(1)).as("c"))
        .withColumn("x", col("sc").cast("double") / col("c") / 100.0)
      Cached.withPinned(daily) { case Seq(daily) => // r15: pin + plan-truncate
      val stats = daily.groupBy("event_type")
        .agg((sum("x") / count(lit(1))).as("mu"),
          count(lit(1)).as("n_days"),
          (sum(col("x") * col("x")) / count(lit(1))).as("m2"))
        .withColumn("sigma",
          sqrt(col("m2") - col("mu") * col("mu")))
        .drop("m2")
      val wS = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cus = daily.join(broadcast(stats), Seq("event_type"))
        .withColumn("z", (col("x") - col("mu")) / col("sigma"))
        .withColumn("s", sum("z").over(wS))
      val wPick = Window.partitionBy("event_type")
        .orderBy(dround(abs(col("s")), 6).desc, col("day").asc)
      cus.withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("day").as("cp_day"),
          dround(col("s"), 4).as("s_at_peak"),
          dround(abs(col("s")), 4).as("max_abs_s"), col("n_days"))
        .orderBy("event_type")
      }
    },
    Some(s"""
      WITH daily AS (SELECT event_type,
                       epoch_us(ts) // 86400000000 AS day,
                       CAST(sum($centsEv) AS BIGINT) AS sc,
                       CAST(count(*) AS BIGINT) AS c
                     FROM events GROUP BY 1, 2),
        d2 AS (SELECT event_type, day,
                 CAST(sc AS DOUBLE) / c / 100.0 AS x
               FROM daily),
        st AS (SELECT event_type,
                 sum(x) / count(*) AS mu,
                 CAST(count(*) AS BIGINT) AS n_days,
                 sqrt(sum(x * x) / count(*)
                   - (sum(x) / count(*)) * (sum(x) / count(*))) AS sigma
               FROM d2 GROUP BY 1),
        cus AS (SELECT d2.event_type, d2.day, st.n_days,
                  sum((d2.x - st.mu) / st.sigma)
                    OVER (PARTITION BY d2.event_type ORDER BY d2.day) AS s
                FROM d2 JOIN st ON d2.event_type = st.event_type),
        pick AS (SELECT *, row_number() OVER (PARTITION BY event_type
                   ORDER BY ${oround("abs(s)", 6)} DESC, day ASC) AS rn
                 FROM cus)
      SELECT event_type, day AS cp_day,
             ${oround("s", 4)} AS s_at_peak,
             ${oround("abs(s)", 4)} AS max_abs_s, n_days
      FROM pick WHERE rn = 1 ORDER BY event_type"""))

  // -- CUPED variance reduction (Deng et al. 2013) for an A/B readout:
  //    users split into arms by id parity, the experiment window split at
  //    the calendar midpoint, and each user's post-period spend adjusted
  //    by θ·(pre − mean(pre)) with θ = cov(pre, post)/var(pre) from the
  //    POOLED pre-period — the standard pre-experiment covariate trick.
  //    Every moment (Σpre, Σpost, Σpre², Σpre·post) accumulates as an
  //    exact long in cents; θ and the adjusted means are scalar double
  //    arithmetic on those (the Welch-t discipline). One scan to user
  //    aggregates, one tiny agg each for pooled and per-arm moments.
  private val cupedAb = QueryDef(
    "q_cuped_ab",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), expr("ts_us div 86400000000").as("day"),
          expr(centsEv).as("v"))
      Cached.withPinned(ev) { case Seq(ev) => // r15: pin + plan-truncate
        val mid = ev.agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
        val user = ev.crossJoin(broadcast(mid))
          .groupBy(col("user_id"), (col("user_id") % 2).as("arm"))
          .agg(sum(when(col("day") < col("mid"), col("v")).otherwise(0L)).as("pre"),
            sum(when(col("day") >= col("mid"), col("v")).otherwise(0L)).as("post"))
        val pooled = user.agg(count(lit(1)).as("n"),
          sum("pre").as("sx"), sum("post").as("sy"),
          sum(col("pre") * col("pre")).as("sxx"),
          sum(col("pre") * col("post")).as("sxy"))
          .withColumn("theta",
            (col("sxy").cast("double") - col("sx").cast("double") * col("sy") / col("n"))
              / (col("sxx").cast("double") - col("sx").cast("double") * col("sx") / col("n")))
          .withColumn("mpre", col("sx").cast("double") / col("n"))
          .select("theta", "mpre")
        user.groupBy("arm")
          .agg(count(lit(1)).as("n_users"), sum("pre").as("sa_pre"),
            sum("post").as("sa_post"))
          .crossJoin(broadcast(pooled))
          .select(col("arm"), col("n_users"),
            dround(col("sa_post").cast("double") / col("n_users") / 100.0, 4)
              .as("mean_post"),
            dround((col("sa_post").cast("double") / col("n_users")
              - col("theta") * (col("sa_pre").cast("double") / col("n_users")
                - col("mpre"))) / 100.0, 4).as("mean_adjusted"),
            dround(col("theta"), 6).as("theta"))
          .orderBy("arm")
      }
    },
    Some(s"""
      WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                    $centsEv AS v FROM events),
        mid AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM ev),
        u AS (SELECT user_id, user_id % 2 AS arm,
                CAST(sum(CASE WHEN day < mid.mid THEN v ELSE 0 END)
                  AS BIGINT) AS pre,
                CAST(sum(CASE WHEN day >= mid.mid THEN v ELSE 0 END)
                  AS BIGINT) AS post
              FROM ev, mid GROUP BY 1, 2),
        pooled AS (SELECT count(*) AS n,
                     CAST(sum(pre) AS BIGINT) AS sx,
                     CAST(sum(post) AS BIGINT) AS sy,
                     CAST(sum(pre * pre) AS BIGINT) AS sxx,
                     CAST(sum(pre * post) AS BIGINT) AS sxy
                   FROM u),
        th AS (SELECT (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
                 / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                   AS theta,
                 CAST(sx AS DOUBLE) / n AS mpre
               FROM pooled),
        a AS (SELECT arm, count(*) AS n_users,
                CAST(sum(pre) AS BIGINT) AS sa_pre,
                CAST(sum(post) AS BIGINT) AS sa_post
              FROM u GROUP BY arm)
      SELECT arm, n_users,
             ${oround("CAST(sa_post AS DOUBLE) / n_users / 100.0", 4)}
               AS mean_post,
             ${oround(
               "(CAST(sa_post AS DOUBLE) / n_users - theta * (CAST(sa_pre AS DOUBLE) / n_users - mpre)) / 100.0",
               4)} AS mean_adjusted,
             ${oround("theta", 6)} AS theta
      FROM a, th ORDER BY arm"""))

  // -- Kaplan–Meier survival estimate of user PURCHASE lifetime (days
  //    between first and last purchase, inclusive), with right-censoring
  //    for users still purchasing on the final observed day (the horizon:
  //    their true lifetime is only known to be ≥ the observed span). Risk sets come
  //    from GridCum cumulative counts over the DURATION grid (calendar-
  //    bounded, never row-bounded); the survival product Π(1 − dᵢ/nᵢ)
  //    accumulates as a cumulative sum of per-term logs snapped to the
  //    1e-9 integer grid (the bigram-MI discipline) — exact long cumsum
  //    in event-time order, exponentiated once at the end, so partition
  //    order cannot move the curve.
  private val survivalKm = QueryDef(
    "q_survival_km",
    (s, dir) => {
      val spans = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(expr("min(ts_us div 86400000000)").as("f"),
          expr("max(ts_us div 86400000000)").as("l"))
      Cached.withPinned(spans) { case Seq(spans) => // r15: pin + plan-truncate
        val horizon = spans.agg(max("l").as("maxd"))
        val durs = spans.crossJoin(broadcast(horizon))
          .select((col("l") - col("f") + 1L).as("t"),
            when(col("l") >= col("maxd"), 0L).otherwise(1L).as("ev"))
        val hist = durs.groupBy("t")
          .agg(count(lit(1)).as("m"), sum("ev").as("d"))
        val tot = hist.agg(sum("m").as("nn"))
        val cum = GridCum.cum(hist, Nil, "t", Seq("m"), bucketWidth = 64L)
          .crossJoin(broadcast(tot))
          .withColumn("n_risk", col("nn") - (col("cum_m") - col("m")))
          .filter(col("d") > 0L)
          // n_risk == d (everyone at risk dies at t, the last event time)
          // would be ln(0): snap the term to a −2000 log-floor whose exp
          // underflows to exactly 0.0 in both engines
          .withColumn("term_i", expr(
            """CASE WHEN n_risk > d THEN
                 CAST(round(ln(CAST(n_risk - d AS DOUBLE) / n_risk) * 1e9) AS BIGINT)
               ELSE CAST(-2000000000000 AS BIGINT) END"""))
        val wS = org.apache.spark.sql.expressions.Window
          .partitionBy(pmod(col("t"), lit(1L))).orderBy("t")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        cum.withColumn("ls", sum("term_i").over(wS))
          .select(col("t"), col("n_risk"), col("d").as("d_events"),
            dround(exp(col("ls").cast("double") / 1e9), 6).as("survival"))
          .orderBy("t")
      }
    },
    Some(s"""
      WITH spans AS (SELECT user_id,
                       min(epoch_us(ts) // 86400000000) AS f,
                       max(epoch_us(ts) // 86400000000) AS l
                     FROM events WHERE event_type = 'purchase' GROUP BY 1),
        horizon AS (SELECT max(l) AS maxd FROM spans),
        durs AS (SELECT l - f + 1 AS t,
                   CASE WHEN l >= horizon.maxd THEN 0 ELSE 1 END AS ev
                 FROM spans, horizon),
        hist AS (SELECT t, CAST(count(*) AS BIGINT) AS m,
                   CAST(sum(ev) AS BIGINT) AS d
                 FROM durs GROUP BY t),
        tot AS (SELECT CAST(sum(m) AS BIGINT) AS nn FROM hist),
        cum AS (SELECT t, m, d,
                  tot.nn - (CAST(sum(m) OVER (ORDER BY t) AS BIGINT) - m)
                    AS n_risk
                FROM hist, tot),
        ev AS (SELECT t, n_risk, d,
                 CASE WHEN n_risk > d THEN
                   CAST(round(ln(CAST(n_risk - d AS DOUBLE) / n_risk) * 1e9)
                     AS BIGINT)
                 ELSE CAST(-2000000000000 AS BIGINT) END AS term_i
               FROM cum WHERE d > 0),
        s AS (SELECT t, n_risk, d,
                CAST(sum(term_i) OVER (ORDER BY t) AS BIGINT) AS ls
              FROM ev)
      SELECT t, n_risk, d AS d_events,
             ${oround("exp(CAST(ls AS DOUBLE) / 1e9)", 6)} AS survival
      FROM s ORDER BY t"""))

  // -- Theil T inequality index per nation over customer lifetime spend:
  //    (1/n)·Σ (x/μ)·ln(x/μ), the entropy-based companion to
  //    q_gini_spend (decomposable across subgroups, which Gini is not).
  //    Works on per-distinct-(nation, spend) tallies; each tie group's
  //    term snaps to the 1e-9 grid BEFORE the multiplicity multiply and
  //    long sum (the bigram-MI discipline), so partition order cannot
  //    move the index.
  private val theilIndex = QueryDef(
    "q_theil_index",
    (s, dir) => {
      val byNation = Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("x")).agg(count(lit(1)).as("m"))
      Cached.withPinned(byNation) { case Seq(byNation) => // r15: pin + plan-truncate
        val stats = byNation.groupBy(col("n_name").as("sn"))
          .agg(sum("m").as("n"), sum(expr("x * m")).as("sx"))
        byNation.join(broadcast(stats), col("n_name") === col("sn"))
          .withColumn("mu", col("sx").cast("double") / col("n"))
          .withColumn("term_i", col("m") * expr(
            "CAST(round((x / mu) * ln(x / mu) * 1e9) AS BIGINT)"))
          .groupBy("n_name")
          .agg(first("n").as("n_cust"),
            dround(sum("term_i").cast("double") / 1e9 / first("n"), 6)
              .as("theil_t"))
          .orderBy("n_name")
      }
    },
    Some(s"""
      WITH spend AS (SELECT o_custkey,
                       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                         AS BIGINT) AS x
                     FROM orders GROUP BY 1),
        t AS (SELECT n_name, x, CAST(count(*) AS BIGINT) AS m
              FROM spend
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              GROUP BY 1, 2),
        st AS (SELECT n_name, CAST(sum(m) AS BIGINT) AS n,
                 CAST(sum(x * m) AS BIGINT) AS sx
               FROM t GROUP BY 1),
        terms AS (SELECT t.n_name, st.n,
                    t.m * CAST(round((t.x / (CAST(st.sx AS DOUBLE) / st.n))
                      * ln(t.x / (CAST(st.sx AS DOUBLE) / st.n)) * 1e9)
                      AS BIGINT) AS term_i
                  FROM t JOIN st ON t.n_name = st.n_name)
      SELECT n_name, any_value(n) AS n_cust,
             ${oround("CAST(sum(term_i) AS DOUBLE) / 1e9 / any_value(n)", 6)}
               AS theil_t
      FROM terms GROUP BY n_name ORDER BY n_name"""))

  // -- Lorenz-curve decile shares of global customer spend: what fraction
  //    of total revenue the k-th spend decile holds, with exact
  //    positional decile boundaries (⌊kn/10⌋) and tie groups split
  //    across boundaries by integer overlap arithmetic — members of a tie
  //    are interchangeable, so the overlap count is the exact allocation.
  //    Cumulative positions come from GridCum on the spend grid; the
  //    decile fan-out is a 10-row broadcast.
  private val lorenzDeciles = QueryDef(
    "q_lorenz_deciles",
    (s, dir) => {
      import s.implicits._
      val hist = Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
        .groupBy("x").agg(count(lit(1)).as("m"))
      Cached.withPinned(hist) { case Seq(hist) => // r15: pin + plan-truncate
        val tot = hist.agg(sum("m").as("n"), sum(expr("x * m")).as("sx"))
        val cum = GridCum.cum(hist, Nil, "x", Seq("m"), bucketWidth = 1L << 22)
          .withColumn("below", col("cum_m") - col("m"))
        val deciles = (0 until 10).toDF("k")
        cum.crossJoin(broadcast(tot)).crossJoin(broadcast(deciles))
          .withColumn("lo", expr("(k * n) div 10"))
          .withColumn("hi", expr("((k + 1) * n) div 10"))
          .withColumn("c", greatest(lit(0L),
            least(col("hi"), col("below") + col("m"))
              - greatest(col("lo"), col("below"))))
          .filter(col("c") > 0L)
          .groupBy("k")
          .agg(sum("c").as("n_cust"), sum(expr("c * x")).as("spend"))
          .crossJoin(broadcast(tot))
          .select(col("k").as("decile"), col("n_cust"),
            dround(col("spend").cast("double") / col("sx"), 6).as("share"))
          .orderBy("decile")
      }
    },
    Some(s"""
      WITH spend AS (SELECT o_custkey,
                       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                         AS BIGINT) AS x
                     FROM orders GROUP BY 1),
        h AS (SELECT x, CAST(count(*) AS BIGINT) AS m FROM spend GROUP BY x),
        tot AS (SELECT CAST(sum(m) AS BIGINT) AS n,
                       CAST(sum(x * m) AS BIGINT) AS sx FROM h),
        c AS (SELECT x, m,
                CAST(sum(m) OVER (ORDER BY x) AS BIGINT) - m AS below
              FROM h),
        fan AS (SELECT c.x, c.m, c.below, tot.n, tot.sx, d.k,
                  (d.k * tot.n) // 10 AS lo,
                  ((d.k + 1) * tot.n) // 10 AS hi
                FROM c, tot, (SELECT unnest(generate_series(0, 9)) AS k) d),
        alloc AS (SELECT k, n, sx,
                    greatest(0, least(hi, below + m) - greatest(lo, below))
                      AS cc, x
                  FROM fan),
        agg AS (SELECT k, CAST(sum(cc) AS BIGINT) AS n_cust,
                  CAST(sum(cc * x) AS BIGINT) AS spend,
                  any_value(sx) AS sx
                FROM alloc WHERE cc > 0 GROUP BY k)
      SELECT k AS decile, n_cust,
             ${oround("CAST(spend AS DOUBLE) / sx", 6)} AS share
      FROM agg ORDER BY decile"""))

  // -- Split-conformal prediction intervals for event values: predict
  //    each event's value by its type's training mean (integer-floored to
  //    keep the nonconformity scores on the cents grid), take the exact
  //    0.9 quantile of |v − pred| on a disjoint calibration split
  //    (HistQuantiles.groupedQuantile — per-type partitioned, no global
  //    funnel), and report empirical coverage of pred ± q90 on the test
  //    split. The distribution-free uncertainty layer over any point
  //    predictor; split by event_id so all three parts are disjoint and
  //    both engines replay them.
  private val conformalInterval = QueryDef(
    "q_conformal_interval",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), expr(centsEv).as("v"))
      Cached.withPinned(ev) { case Seq(ev) => // r15: pin + plan-truncate
        val pred = ev.filter(col("event_id") % 2 === 0)
          .groupBy("event_type")
          .agg(expr("sum(v) div count(1)").as("pred"))
        val calib = ev.filter(col("event_id") % 4 === 1)
          .join(broadcast(pred), "event_type")
          .select(col("event_type"), abs(col("v") - col("pred")).as("a"))
        val q90 = graft.operators.HistQuantiles
          .groupedQuantile(calib, "event_type", col("a"), 0.9)
          .withColumnRenamed("value", "q90")
        val nCal = calib.groupBy("event_type").agg(count(lit(1)).as("n_calib"))
        val test = ev.filter(col("event_id") % 4 === 3)
          .join(broadcast(pred), "event_type")
          .join(broadcast(q90), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_test"),
            sum(when(abs(col("v") - col("pred")).cast("double") <= col("q90"), 1L)
              .otherwise(0L)).as("covered"))
        test.join(broadcast(nCal), "event_type")
          .join(broadcast(q90), "event_type")
          .select(col("event_type"), col("n_calib"), col("n_test"),
            dround(col("q90") / 100.0, 4).as("q90"),
            dround(col("covered").cast("double") / col("n_test"), 4)
              .as("coverage"))
          .orderBy("event_type")
      }
    },
    Some(s"""
      WITH ev AS (SELECT event_id, event_type, $centsEv AS v FROM events),
        pred AS (SELECT event_type,
                   CAST(sum(v) AS BIGINT) // count(*) AS pred
                 FROM ev WHERE event_id % 2 = 0 GROUP BY 1),
        calib AS (SELECT ev.event_type, abs(v - pred) AS a
                  FROM ev JOIN pred ON ev.event_type = pred.event_type
                  WHERE event_id % 4 = 1),
        q90 AS (SELECT event_type, quantile_cont(a, 0.9) AS q90,
                  CAST(count(*) AS BIGINT) AS n_calib
                FROM calib GROUP BY 1),
        test AS (SELECT ev.event_type,
                   CAST(count(*) AS BIGINT) AS n_test,
                   CAST(sum(CASE WHEN CAST(abs(v - pred) AS DOUBLE) <= q90.q90
                     THEN 1 ELSE 0 END) AS BIGINT) AS covered
                 FROM ev
                 JOIN pred ON ev.event_type = pred.event_type
                 JOIN q90 ON ev.event_type = q90.event_type
                 WHERE event_id % 4 = 3 GROUP BY 1)
      SELECT test.event_type, q90.n_calib, test.n_test,
             ${oround("q90.q90 / 100.0", 4)} AS q90,
             ${oround("CAST(covered AS DOUBLE) / n_test", 4)} AS coverage
      FROM test JOIN q90 ON test.event_type = q90.event_type
      ORDER BY test.event_type"""))

  // -- Population Stability Index between the first and second calendar
  //    halves of the event stream (the drift monitor every deployed
  //    model/pipeline runs): PSI = Σ (p−q)·ln(p/q) over 16 fixed value
  //    buckets, with add-one smoothing so empty buckets stay finite. One
  //    conditional-count scan to a 16-row frame per type; every
  //    proportion derives from exact counts.
  private val psiDrift = QueryDef(
    "q_psi_drift",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"), expr("ts_us div 86400000000").as("day"),
          expr(s"least(15, $centsEv div 3125)").as("bkt"))
      Cached.withPinned(ev) { case Seq(ev) => // r15: pin + plan-truncate
        val mid = ev.agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
        val cells = ev.crossJoin(broadcast(mid))
          .groupBy("event_type", "bkt")
          .agg(sum(when(col("day") < col("mid"), 1L).otherwise(0L)).as("ca"),
            sum(when(col("day") >= col("mid"), 1L).otherwise(0L)).as("cb"))
        val tots = cells.groupBy(col("event_type").as("tt"))
          .agg(sum("ca").as("na"), sum("cb").as("nb"),
            count(lit(1)).as("k"))
        cells.join(broadcast(tots), col("event_type") === col("tt"))
          .withColumn("p", (col("ca") + 1L).cast("double")
            / (col("na") + col("k")))
          .withColumn("q", (col("cb") + 1L).cast("double")
            / (col("nb") + col("k")))
          .groupBy("event_type")
          .agg(first("na").as("n_first"), first("nb").as("n_second"),
            dround(sum((col("p") - col("q")) * log(col("p") / col("q"))), 6)
              .as("psi"))
          .orderBy("event_type")
      }
    },
    Some(s"""
      WITH ev AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                    least(15, $centsEv // 3125) AS bkt
                  FROM events),
        mid AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM ev),
        cells AS (SELECT event_type, bkt,
                    CAST(sum(CASE WHEN day < mid.mid THEN 1 ELSE 0 END)
                      AS BIGINT) AS ca,
                    CAST(sum(CASE WHEN day >= mid.mid THEN 1 ELSE 0 END)
                      AS BIGINT) AS cb
                  FROM ev, mid GROUP BY 1, 2),
        tots AS (SELECT event_type AS tt, CAST(sum(ca) AS BIGINT) AS na,
                   CAST(sum(cb) AS BIGINT) AS nb,
                   CAST(count(*) AS BIGINT) AS k
                 FROM cells GROUP BY 1),
        sm AS (SELECT cells.event_type, tots.na, tots.nb,
                 CAST(ca + 1 AS DOUBLE) / (na + k) AS p,
                 CAST(cb + 1 AS DOUBLE) / (nb + k) AS q
               FROM cells JOIN tots ON cells.event_type = tots.tt)
      SELECT event_type, any_value(na) AS n_first, any_value(nb) AS n_second,
             ${oround("sum((p - q) * ln(p / q))", 6)} AS psi
      FROM sm GROUP BY event_type ORDER BY event_type"""))

  // -- Bradley–Terry preference strengths via fixed MM iterations
  //    (Hunter 2004) — the aggregation a preference/reward-modeling
  //    pipeline runs over pairwise comparison data. Contests: within
  //    each (user, day), event type A beats B when A's exact cents total
  //    is strictly larger (ties skipped). The duel generation is a
  //    per-(user, day) self-join over ≤|types| rows — linear in events,
  //    never corpus×corpus — and everything after the (winner, loser)
  //    tally runs on a |types|²-row table.
  //
  //    Determinism: strengths live on a 1e-6 integer grid (micro-units).
  //    Each MM term floor-quantizes (m_ij·1e12/(pu_i+pu_j)) — identical
  //    double arithmetic in both engines — and sums as BIGINT, so the
  //    order-dependent float summation never happens; the unrolled
  //    DuckDB rounds replay bit-identically. The 1-micro floor clamp
  //    keeps a never-winning type's strength positive so later
  //    denominators stay finite, and bounds every intermediate under
  //    2^63 (term ≤ m·1e12/2 with m ≤ ~1e6 at sf1 → < 9.2e18).
  private val BtRounds = 8

  private val bradleyTerry = QueryDef(
    "q_bradley_terry",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("user_id"), expr("ts_us div 86400000000").as("day"),
          col("event_type"))
        .agg(sum(expr(centsEv)).as("sv"))
      val duels = daily.as("a").join(daily.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.day") === col("b.day") &&
            col("a.event_type") < col("b.event_type"))
        .filter(col("a.sv") =!= col("b.sv"))
        .select(
          when(col("a.sv") > col("b.sv"), col("a.event_type"))
            .otherwise(col("b.event_type")).as("winner"),
          when(col("a.sv") > col("b.sv"), col("b.event_type"))
            .otherwise(col("a.event_type")).as("loser"))
      val n = duels.groupBy("winner", "loser").agg(count(lit(1)).as("cnt"))
      Cached.withPinned(n) { case Seq(n) => // r15: pin + plan-truncate
        // Loop-invariant inputs materialized ONCE (≤ |types|² rows) — the
        // same discipline as PageRank.scala:46: every MM round below joins
        // `m` and `wins`, and without truncation each reference re-derives
        // the whole duel subtree into the plan.
        val m = n.select(col("winner").as("i"), col("loser").as("j"), col("cnt"))
          .unionByName(n.select(col("loser").as("i"), col("winner").as("j"), col("cnt")))
          .groupBy("i", "j").agg(sum("cnt").as("m"))
          .localCheckpoint(true)
        val types = m.select(col("i").as("t")).distinct().localCheckpoint(true)
        val wins = types.join(
            n.groupBy(col("winner").as("t")).agg(sum("cnt").as("w")),
            Seq("t"), "left_outer")
          .withColumn("w", coalesce(col("w"), lit(0L)))
          .localCheckpoint(true)
        // |types| as a 1-row broadcast frame, NOT a driver-side count():
        // an action inside the builder would make merely constructing the
        // plan launch jobs (round-7 ADVICE), and every registry-walking
        // audit constructs all plans.
        val tc = types.agg(count(lit(1)).cast("double").as("tc"))
        var p = types.select(col("t"), lit(1000000L).as("pu"))
        for (_ <- 1 to BtRounds) {
          val denom = m
            .join(p.select(col("t").as("i"), col("pu").as("pi")), Seq("i"))
            .join(p.select(col("t").as("j"), col("pu").as("pj")), Seq("j"))
            .withColumn("term",
              floor(col("m").cast("double") * lit(1e12)
                / (col("pi") + col("pj")).cast("double")).cast("long"))
            .groupBy(col("i").as("t")).agg(sum("term").as("du"))
          val raw = wins.join(denom, Seq("t"))
            .withColumn("raw",
              floor(col("w").cast("double") * lit(1e12)
                / col("du").cast("double")).cast("long"))
            .select("t", "raw")
          val tot = raw.agg(sum("raw").as("tot"))
          // Truncate EVERY round: p is referenced twice next round (pi/pj)
          // and raw twice this round (raw + tot), so an untruncated plan
          // grows ~4^rounds and Catalyst analysis never finishes — this
          // exact shape emptied CORRECTNESS_r07 and timed out BENCH_r07.
          // p is |types| rows; the eager materialization costs microseconds.
          p = raw.crossJoin(broadcast(tot)).crossJoin(broadcast(tc))
            .select(col("t"),
              greatest(lit(1L),
                floor(col("raw").cast("double") * col("tc") * lit(1e6)
                  / col("tot").cast("double")).cast("long")).as("pu"))
            .localCheckpoint(true)
        }
        val contests = m.groupBy(col("i").as("t")).agg(sum("m").as("contests"))
        p.join(wins, Seq("t")).join(contests, Seq("t"))
          .select(col("t").as("event_type"), col("w").as("wins"),
            col("contests"), col("pu").as("strength_micro"))
          .orderBy(col("strength_micro").desc, col("event_type").asc)
      }
    },
    Some {
      val rounds = (1 to BtRounds).map { r =>
        val prev = if (r == 1) "p0" else s"p${r - 1}"
        s"""denom$r AS MATERIALIZED (SELECT m.i AS t,
               CAST(sum(CAST(floor(CAST(m.m AS DOUBLE) * 1e12
                 / CAST(pi.pu + pj.pu AS DOUBLE)) AS BIGINT)) AS BIGINT) AS du
             FROM m JOIN $prev pi ON m.i = pi.t
                    JOIN $prev pj ON m.j = pj.t
             GROUP BY m.i),
        raw$r AS MATERIALIZED (SELECT w.t,
               CAST(floor(CAST(w.w AS DOUBLE) * 1e12
                 / CAST(d.du AS DOUBLE)) AS BIGINT) AS raw
             FROM w JOIN denom$r d ON w.t = d.t),
        p$r AS MATERIALIZED (SELECT t, greatest(1, CAST(floor(CAST(raw AS DOUBLE)
                 * (SELECT CAST(count(*) AS DOUBLE) FROM types) * 1e6
                 / (SELECT CAST(sum(raw) AS DOUBLE) FROM raw$r))
               AS BIGINT)) AS pu
             FROM raw$r)"""
      }.mkString(",\n        ")
      s"""
      WITH daily AS MATERIALIZED (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                       event_type, CAST(sum($centsEv) AS BIGINT) AS sv
                     FROM events GROUP BY 1, 2, 3),
        duels AS MATERIALIZED (SELECT CASE WHEN a.sv > b.sv THEN a.event_type
                              ELSE b.event_type END AS winner,
                         CASE WHEN a.sv > b.sv THEN b.event_type
                              ELSE a.event_type END AS loser
                  FROM daily a JOIN daily b
                    ON a.user_id = b.user_id AND a.day = b.day
                   AND a.event_type < b.event_type
                  WHERE a.sv <> b.sv),
        n AS MATERIALIZED (SELECT winner, loser, CAST(count(*) AS BIGINT) AS cnt
              FROM duels GROUP BY 1, 2),
        m AS MATERIALIZED (SELECT i, j, CAST(sum(cnt) AS BIGINT) AS m
              FROM (SELECT winner AS i, loser AS j, cnt FROM n
                    UNION ALL
                    SELECT loser AS i, winner AS j, cnt FROM n)
              GROUP BY 1, 2),
        types AS MATERIALIZED (SELECT DISTINCT i AS t FROM m),
        w AS MATERIALIZED (SELECT types.t, CAST(coalesce(wn.w, 0) AS BIGINT) AS w
              FROM types LEFT JOIN (SELECT winner AS t, CAST(sum(cnt) AS BIGINT) AS w
                                    FROM n GROUP BY 1) wn
                ON types.t = wn.t),
        p0 AS MATERIALIZED (SELECT t, CAST(1000000 AS BIGINT) AS pu FROM types),
        $rounds,
        contests AS MATERIALIZED (SELECT i AS t, CAST(sum(m) AS BIGINT) AS contests
                     FROM m GROUP BY 1)
      SELECT p.t AS event_type, w.w AS wins, contests.contests,
             p.pu AS strength_micro
      FROM p$BtRounds p JOIN w ON p.t = w.t
      JOIN contests ON p.t = contests.t
      ORDER BY strength_micro DESC, event_type ASC"""
    })

  def queries: Seq[QueryDef] = Seq(
    ksTwoSample, mannWhitney, chiSquare, welchT, giniSpend, acfDaily,
    cusumChange, cupedAb, survivalKm, theilIndex, lorenzDeciles,
    conformalInterval, psiDrift, bradleyTerry)
}
