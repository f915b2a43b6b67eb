package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import Det.{dround, oround}

/** Temporal operators: time-based sliding-frame aggregation, interval
  * (event-to-event attribution) joins, and skew-resistant shuffle joins.
  * These extend the W/J families of SURVEY.md §2.5/§2.3 with the shapes a
  * clickstream/feature-engineering pipeline runs at 100 TB:
  *
  *   - a RANGE frame ("trailing 30 days") instead of a ROWS frame — the
  *     window is partitioned by the entity key, so scale-out is by customer
  *     and no global ordering exists anywhere;
  *   - conversion attribution (purchase ← nearest preceding click within
  *     1 h) as an equi-join on the entity key with a time-band predicate —
  *     the 100 TB plan is a per-user-partition join, NOT an all-pairs
  *     time join; the streaming twin (graft.streaming.StreamJoin) runs the
  *     same semantics incrementally with watermarked state;
  *   - a SALTED shuffle join against a hot-key side (every row of the fact
  *     carries one of 5 join keys — maximal skew). Salting replicates the
  *     small side across `Salts` buckets so no single reducer owns a hot
  *     key. The same trick q_salted_type_counts applies to aggregation,
  *     here applied to the join operator itself.
  */
object TemporalQueries extends QueryModule {

  // -- W: trailing 30-day spend per customer (RANGE frame over days).
  //    The frame key is datediff-days (integer), so the frame is a true
  //    time interval: same-day orders are peers and the result is
  //    independent of their relative order — deterministic under any
  //    partitioning. Money sums run on the integer cent grid (BASELINE.md
  //    round-3 convention). The customer filter is on the PARTITION key, so
  //    it commutes with the window and Catalyst pushes it to the scan.
  private val slidingSpend = QueryDef(
    "q_sliding_spend_30d",
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(col("o_custkey") % 50 === 0)
        .withColumn("d", datediff(col("o_orderdate"), lit("1992-01-01").cast("date")))
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      val w = Window.partitionBy("o_custkey").orderBy("d").rangeBetween(-30, 0)
      o.withColumn("trail_cents", sum("cents").over(w))
        .withColumn("n_trail", count(lit(1)).over(w))
        .select(col("o_orderkey"), col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          (col("trail_cents").cast("double") / 100.0).as("trailing_spend_30d"),
          col("n_trail"))
        .orderBy("o_custkey", "order_date", "o_orderkey")
    },
    Some("""
      WITH o AS (SELECT o_orderkey, o_custkey, o_orderdate,
                   datediff('day', DATE '1992-01-01', o_orderdate) AS d,
                   CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
                 FROM orders WHERE o_custkey % 50 = 0)
      SELECT o_orderkey, o_custkey,
             strftime(o_orderdate, '%Y-%m-%d') AS order_date,
             CAST(sum(cents) OVER w AS DOUBLE) / 100.0 AS trailing_spend_30d,
             count(*) OVER w AS n_trail
      FROM o
      WINDOW w AS (PARTITION BY o_custkey ORDER BY d
                   RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, order_date, o_orderkey"""))

  /** Attribution lookback window (µs). */
  private val LookbackUs = 3600L * 1000000L

  // -- J: conversion attribution — each purchase is attributed to the
  //    NEAREST preceding click by the same user within 1 h. Join shape at
  //    scale: equi-join on user_id (shuffle/broadcast decided by AQE) with
  //    the time band as a post-join predicate — per-user event counts are
  //    bounded, so the pair blowup is per-user-quadratic at worst, never
  //    corpus-quadratic. The min-gap argmin then collapses candidates with
  //    one map-side-combinable aggregate. Streaming twin: StreamJoin.
  private val clickAttribution = QueryDef(
    "q_click_attribution",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("c_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us").as("p_ts"))
      val pairs = purchases.join(clicks, "user_id")
        .filter(col("c_ts") <= col("p_ts") &&
          col("p_ts") - col("c_ts") <= LookbackUs)
      val best = pairs.groupBy("event_id", "user_id")
        .agg(min(col("p_ts") - col("c_ts")).as("gap_us"))
      best.groupBy("user_id")
        .agg(count(lit(1)).as("n_attributed"),
          dround(avg(col("gap_us").cast("double") / 60000000.0), 4)
            .as("avg_gap_min"))
        .orderBy("user_id")
    },
    Some(s"""
      WITH c AS (SELECT user_id, epoch_us(ts) AS c_ts FROM events
                 WHERE event_type = 'click'),
        p AS (SELECT event_id, user_id, epoch_us(ts) AS p_ts FROM events
              WHERE event_type = 'purchase'),
        best AS (SELECT p.event_id, p.user_id,
                   min(p.p_ts - c.c_ts) AS gap_us
                 FROM p JOIN c ON p.user_id = c.user_id
                 WHERE c.c_ts <= p.p_ts AND p.p_ts - c.c_ts <= $LookbackUs
                 GROUP BY p.event_id, p.user_id)
      SELECT user_id, count(*) AS n_attributed,
             ${oround("avg(CAST(gap_us AS DOUBLE) / 60000000.0)", 4)}
               AS avg_gap_min
      FROM best GROUP BY user_id ORDER BY user_id"""))

  /** Salt fan-out for the hot-key join. */
  private val Salts = 16

  // -- J: salted shuffle join. The "dim" side is the per-type global mean
  //    (5 rows — every fact row joins one of 5 keys: the worst-case hot-key
  //    distribution for a shuffle join). Replicating the small side ×Salts
  //    and scattering the fact by a deterministic hash salt makes every
  //    reducer own 1/Salts of each hot key. (AQE skew-join splits oversized
  //    partitions too, but salting works even when one KEY exceeds a single
  //    executor — AQE cannot split within a key.) Broadcast is disabled
  //    locally so the salted SHUFFLE path is what actually executes; at
  //    100 TB this is the shape for joining two fact tables on a skewed key
  //    where neither side broadcasts.
  private val saltedSkewJoin = QueryDef(
    "q_salted_skew_join",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), col("value"))
      val typeStats = ev.groupBy("event_type")
        .agg((sum(round(col("value") * 100).cast("long")).cast("double")
          / lit(100.0) / count(lit(1))).as("type_mean"))
      val salted = typeStats.withColumn("salt",
        explode(array((0 until Salts).map(lit): _*)))
      val fact = ev.withColumn("salt", pmod(hash(col("event_id")), lit(Salts)))
      val joined = fact.hint("shuffle_hash")
        .join(salted, Seq("event_type", "salt"))
      // mean_abs_dev on the 1e-4 integer grid: a raw avg() of doubles is
      // summation-order-dependent at the ulp level (same hazard class the
      // sector mean in ScorePipeline closes) — quantize each |dev|, sum as
      // longs (order-free), divide once; identical arithmetic in DuckDB
      joined.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          dround(
            sum(floor(abs(col("value") - col("type_mean")) * 1e4 + 0.5)
              .cast("long")).cast("double") / lit(1e4) / count(lit(1)),
            4).as("mean_abs_dev"),
          dround(first("type_mean"), 4).as("type_mean"))
        .orderBy("event_type")
    },
    Some("""
      WITH ts AS (SELECT event_type,
                    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
                      / 100.0 / count(*) AS type_mean
                  FROM events GROUP BY event_type),
        j AS (SELECT e.event_type, e.value, ts.type_mean
              FROM events e JOIN ts ON e.event_type = ts.event_type)
      SELECT event_type, count(*) AS n,
             (CASE WHEN (CAST(sum(CAST(floor(abs(value - type_mean) * 1e4 + 0.5) AS BIGINT)) AS DOUBLE) / 1e4 / count(*)) >= 0
                THEN floor((CAST(sum(CAST(floor(abs(value - type_mean) * 1e4 + 0.5) AS BIGINT)) AS DOUBLE) / 1e4 / count(*)) * 1e4 + 0.5)
                ELSE ceil((CAST(sum(CAST(floor(abs(value - type_mean) * 1e4 + 0.5) AS BIGINT)) AS DOUBLE) / 1e4 / count(*)) * 1e4 - 0.5) END / 1e4)
               AS mean_abs_dev,
             (CASE WHEN min(type_mean) >= 0
                THEN floor(min(type_mean) * 1e4 + 0.5)
                ELSE ceil(min(type_mean) * 1e4 - 0.5) END / 1e4) AS type_mean
      FROM j GROUP BY event_type ORDER BY event_type"""))

  /** Epoch-µs per week, and the corpus epoch the cohort grid hangs off. */
  private val WeekUs = 7L * 86400L * 1000000L
  private val EpochUs = 1704067200000000L // 2024-01-01 UTC

  // -- cohort retention: users bucketed by first-activity week; for each
  //    (cohort, week-offset) cell, how many of the cohort's users were
  //    active. Two aggregations and one join, ALL keyed on user/cohort —
  //    the canonical product-analytics matrix with no global operation
  //    anywhere. Week arithmetic is pure integer FLOOR division: Spark's
  //    `div` truncates toward zero while DuckDB's `//` floors, so the
  //    truncating quotient is corrected by one when the remainder is
  //    nonzero and negative — events before the 2024-01-01 epoch land in
  //    week -1 in BOTH engines, not 0 vs -1.
  private val cohortRetention = QueryDef(
    "q_cohort_retention",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("week", expr(
          s"""(ts_us - $EpochUs) div $WeekUs
              - (CASE WHEN (ts_us - $EpochUs) % $WeekUs != 0
                           AND ts_us < $EpochUs THEN 1 ELSE 0 END)"""))
      val cohort = ev.groupBy("user_id").agg(min("week").as("cohort_week"))
      val active = ev.select("user_id", "week").distinct()
      active.join(cohort, "user_id")
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct("user_id").as("n_active"))
        .orderBy("cohort_week", "week_offset")
    },
    Some(s"""
      WITH ev AS (SELECT user_id,
                    (epoch_us(ts) - $EpochUs) // $WeekUs AS week
                  FROM events),
        cohort AS (SELECT user_id, min(week) AS cohort_week
                   FROM ev GROUP BY user_id),
        active AS (SELECT DISTINCT user_id, week FROM ev)
      SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
             count(DISTINCT a.user_id) AS n_active
      FROM active a JOIN cohort c ON a.user_id = c.user_id
      GROUP BY c.cohort_week, week_offset
      ORDER BY c.cohort_week, week_offset"""))

  // -- ordered funnel: signup → first click AFTER signup → first purchase
  //    AFTER that click, per user; report how many users reach each stage.
  //    Sequential "first X after Y" via chained conditional-min window
  //    aggregates over ONE user-partitioned exchange (three Window nodes,
  //    same partitioning → Catalyst plans a single shuffle). No self-joins,
  //    no per-user explosion.
  private val funnelStages = QueryDef(
    "q_funnel_stages",
    (s, dir) => {
      val w = Window.partitionBy("user_id")
      val staged = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts_us"))
        .withColumn("s_ts",
          min(when(col("event_type") === "signup", col("ts_us"))).over(w))
        .withColumn("c_ts",
          min(when(col("event_type") === "click" &&
            col("ts_us") >= col("s_ts"), col("ts_us"))).over(w))
        .withColumn("p_ts",
          min(when(col("event_type") === "purchase" &&
            col("ts_us") >= col("c_ts"), col("ts_us"))).over(w))
      staged.select(col("user_id"),
          when(col("p_ts").isNotNull, 3)
            .when(col("c_ts").isNotNull, 2)
            .when(col("s_ts").isNotNull, 1)
            .otherwise(0).cast("long").as("stage"))
        .distinct()
        .groupBy("stage").agg(count(lit(1)).as("n_users"))
        .orderBy("stage")
    },
    Some("""
      WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
        s AS (SELECT user_id,
                min(CASE WHEN event_type = 'signup' THEN t END) AS s_ts
              FROM ev GROUP BY user_id),
        c AS (SELECT e.user_id,
                min(CASE WHEN e.event_type = 'click' AND e.t >= s.s_ts
                         THEN e.t END) AS c_ts
              FROM ev e JOIN s ON e.user_id = s.user_id GROUP BY e.user_id),
        p AS (SELECT e.user_id,
                min(CASE WHEN e.event_type = 'purchase' AND e.t >= c.c_ts
                         THEN e.t END) AS p_ts
              FROM ev e JOIN c ON e.user_id = c.user_id GROUP BY e.user_id)
      SELECT stage, count(*) AS n_users FROM (
        SELECT s.user_id,
               CASE WHEN p.p_ts IS NOT NULL THEN 3
                    WHEN c.c_ts IS NOT NULL THEN 2
                    WHEN s.s_ts IS NOT NULL THEN 1
                    ELSE 0 END AS stage
        FROM s JOIN c ON s.user_id = c.user_id
               JOIN p ON s.user_id = p.user_id)
      GROUP BY stage ORDER BY stage"""))

  // -- first-order Markov transition matrix over per-user event streams:
  //    lead() inside user-partitioned windows forms (current, next) pairs,
  //    then P(next | current) = pair count / current's out-mass. Both
  //    windows partition by user (embarrassingly parallel); the ratio
  //    window runs over the ~|types|² aggregated matrix, never the facts.
  //    Counts are exact longs, so the division is bit-deterministic.
  private val eventTransitions = QueryDef(
    "q_event_transitions",
    (s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_us").asc, col("event_id").asc)
      val pairs = Tables.events(s, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          col("event_type"))
        .withColumn("nxt", lead("event_type", 1).over(w))
        .filter(col("nxt").isNotNull)
      val counts = pairs
        .groupBy(col("event_type").as("cur"), col("nxt"))
        .agg(count(lit(1)).as("n"))
      counts.select(col("cur"), col("nxt"), col("n"),
          dround(col("n") / sum("n").over(Window.partitionBy("cur")), 4)
            .as("p"))
        .orderBy("cur", "nxt")
    },
    Some(s"""
      WITH pairs AS (
        SELECT event_type AS cur,
               lead(event_type, 1) OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts) ASC, event_id ASC) AS nxt
        FROM events),
        counts AS (SELECT cur, nxt, count(*) AS n FROM pairs
                   WHERE nxt IS NOT NULL GROUP BY cur, nxt)
      SELECT cur, nxt, n,
             ${oround(
               "CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY cur)", 4)} AS p
      FROM counts ORDER BY cur, nxt"""))

  // -- week-over-week revenue change: calendar-week aggregation (cent
  //    grid) + lag() over the AGGREGATED series. The unpartitioned window
  //    touches only ~#weeks rows — the fact table never funnels through
  //    one task. Weeks are emitted as formatted strings (determinism rule:
  //    no raw timestamps in results).
  private val weeklyRevenueWow = QueryDef(
    "q_weekly_revenue_wow",
    (s, dir) => {
      val wk = Tables.orders(s, dir)
        .groupBy(date_trunc("week", col("o_orderdate")).as("wk"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      // constant partition key: the window runs over ~#weeks aggregate rows
      // (bounded); explicit spec silences WindowExec's no-partition warning
      // (pmod(cents,1) ≡ 0, non-foldable so the optimizer keeps it)
      val w = Window.partitionBy(pmod(col("cents"), lit(1))).orderBy("wk")
      wk.withColumn("prev", lag("cents", 1).over(w))
        .filter(col("prev").isNotNull && col("prev") =!= 0)
        .select(date_format(col("wk"), "yyyy-MM-dd").as("week_start"),
          dround(col("cents") / 100.0, 2).as("revenue"),
          dround((col("cents") - col("prev")).cast("double")
            / col("prev") * 100, 4).as("wow_pct"))
        .orderBy("week_start")
    },
    Some(s"""
      WITH wk AS (SELECT date_trunc('week', o_orderdate) AS wk,
                    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
                  FROM orders GROUP BY 1),
        lagged AS (SELECT wk, cents,
                     lag(cents, 1) OVER (ORDER BY wk) AS prev
                   FROM wk)
      SELECT strftime(wk, '%Y-%m-%d') AS week_start,
             ${oround("cents / 100.0", 2)} AS revenue,
             ${oround(
               "CAST(cents - prev AS DOUBLE) / prev * 100", 4)} AS wow_pct
      FROM lagged WHERE prev IS NOT NULL AND prev <> 0
      ORDER BY week_start"""))

  // -- join-key skew profiler: the diagnostic that DECIDES between plain
  //    shuffle join, broadcast, and salting (q_salted_skew_join is the
  //    treatment; this is the measurement). For each candidate key, the
  //    per-key count distribution: #keys, max key share, p50/p99 of
  //    per-key counts and their ratio. One groupBy per key (map-side
  //    combined) then stats over the (small) per-key count frame — the
  //    profile of a 100 TB fact table costs one pass per key column.
  //    Counts are ints, so quantile_cont lands on the exact half grid.
  private val skewProfile = QueryDef(
    "q_skew_profile",
    (s, dir) => {
      def profile(df: org.apache.spark.sql.DataFrame, label: String,
          key: String) = {
        val counts = df.groupBy(key).agg(count(lit(1)).as("c"))
        counts.agg(
          count(lit(1)).as("n_keys"),
          sum("c").as("n_rows"),
          max("c").as("max_c"),
          expr("percentile(c, 0.5)").as("p50"),
          expr("percentile(c, 0.99)").as("p99"))
          .select(lit(label).as("key_col"), col("n_keys"), col("n_rows"),
            dround(col("max_c") / col("n_rows"), 6).as("max_key_share"),
            dround(col("p50"), 4).as("p50_c"),
            dround(col("p99"), 4).as("p99_c"),
            dround(col("p99") / col("p50"), 4).as("skew_ratio"))
      }
      profile(Tables.events(s, dir), "events.user_id", "user_id")
        .unionByName(profile(Tables.events(s, dir), "events.event_type",
          "event_type"))
        .unionByName(profile(Tables.lineitem(s, dir), "lineitem.l_suppkey",
          "l_suppkey"))
        .orderBy("key_col")
    },
    Some {
      def one(label: String, table: String, key: String) =
        s"""SELECT '$label' AS key_col,
             count(*) AS n_keys,
             CAST(sum(c) AS BIGINT) AS n_rows,
             ${oround("CAST(max(c) AS DOUBLE) / sum(c)", 6)}
               AS max_key_share,
             ${oround("quantile_cont(c, 0.5)", 4)} AS p50_c,
             ${oround("quantile_cont(c, 0.99)", 4)} AS p99_c,
             ${oround("quantile_cont(c, 0.99) / quantile_cont(c, 0.5)", 4)}
               AS skew_ratio
           FROM (SELECT $key, count(*) AS c FROM $table GROUP BY $key)"""
      Seq(one("events.user_id", "events", "user_id"),
        one("events.event_type", "events", "event_type"),
        one("lineitem.l_suppkey", "lineitem", "l_suppkey"))
        .mkString("", "\n      UNION ALL\n      ", "\n      ORDER BY key_col")
    })

  /** EWMA half-life weights: alpha = 1/2 so every weight is a power of
    * two — exactly representable in binary, making the fold's double
    * arithmetic bit-identical in both engines. */
  private val EwmaN = 16

  // -- exponential smoothing (EWMA, alpha=0.5) of each user's event-value
  //    stream: the trailing-16 frame is collected IN FRAME ORDER by a
  //    user-partitioned window and folded left (s ← s/2 + x/2). The fold
  //    order is pinned by the window's ORDER BY in both engines, and
  //    halving is exact in binary — no summation-order or ulp hazard.
  //    Scale: window partitions by user; frame is bounded (16 rows), so
  //    state per key is constant. Emitted per user at the LAST event only.
  private val ewmaValue = QueryDef(
    "q_ewma_value",
    (s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_us").asc, col("event_id").asc)
      val frame = w.rowsBetween(-(EwmaN - 1), Window.currentRow)
      val ev = Tables.events(s, dir)
        .filter(col("user_id") < 200)
        .withColumn("c", expr("CAST(round(value * 100) AS BIGINT)"))
      ev.withColumn("xs", collect_list("c").over(frame))
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id")
            .orderBy(col("ts_us").desc, col("event_id").desc)))
        .filter(col("rn") === 1)
        .select(col("user_id"),
          size(col("xs")).cast("long").as("n_in_frame"),
          dround(expr(
            "aggregate(xs, CAST(0.0 AS DOUBLE)," +
              " (acc, x) -> acc / 2 + x / 2) / 100"), 6).as("ewma"))
        .orderBy("user_id")
    },
    Some(s"""
      WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                    CAST(round(value * 100) AS BIGINT) AS c
                  FROM events WHERE user_id < 200),
        fr AS (SELECT user_id,
                 array_agg(c) OVER (PARTITION BY user_id
                   ORDER BY ts_us ASC, event_id ASC
                   ROWS BETWEEN ${EwmaN - 1} PRECEDING AND CURRENT ROW)
                   AS xs,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY ts_us DESC, event_id DESC) AS rn
               FROM ev)
      SELECT user_id, CAST(len(xs) AS BIGINT) AS n_in_frame,
             ${oround(
               "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), xs)," +
                 " (acc, x) -> acc / 2 + x / 2) / 100", 6)} AS ewma
      FROM fr WHERE rn = 1 ORDER BY user_id"""))

  // -- TWAP (time-weighted average): per user, the duration-weighted mean
  //    of `value` held between consecutive events — the financial/sensor
  //    aggregate where a value "holds" until superseded (the batch twin of
  //    the as-of family's point-in-time semantics). Window is partitioned
  //    by user (embarrassingly parallel); arithmetic is EXACT integers:
  //    cents (≤1e5) × µs gaps summed per user stay ≤ ~6e18 over the
  //    two-year fixture span, inside Long under ANSI mode, and the single
  //    final division of two exact longs is bit-identical cross-engine.
  private val twapValue = QueryDef(
    "q_twap_value",
    (s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_us").asc, col("event_id").asc)
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          expr("CAST(round(value * 100) AS BIGINT)").as("c"))
        .withColumn("next_ts", lead("ts_us", 1).over(w))
        .filter(col("next_ts").isNotNull)
        .withColumn("dur", col("next_ts") - col("ts_us"))
      ev.groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"),
          sum("dur").as("held_us"),
          sum(col("c") * col("dur")).as("wsum"))
        .filter(col("held_us") > 0)
        .select(col("user_id"), col("n_gaps"), col("held_us"),
          dround(col("wsum").cast("double") / col("held_us") / 100.0, 4)
            .as("twap"))
        .orderBy("user_id")
    },
    Some(s"""
      WITH g AS (SELECT user_id,
                   CAST(round(value * 100) AS BIGINT) AS c,
                   lead(epoch_us(ts)) OVER (PARTITION BY user_id
                     ORDER BY epoch_us(ts) ASC, event_id ASC)
                     - epoch_us(ts) AS dur
                 FROM events),
        pu AS (SELECT user_id, count(*) AS n_gaps,
                 CAST(sum(dur) AS BIGINT) AS held_us,
                 CAST(sum(c * dur) AS BIGINT) AS wsum
               FROM g WHERE dur IS NOT NULL GROUP BY user_id)
      SELECT user_id, n_gaps, held_us,
             ${oround("CAST(wsum AS DOUBLE) / held_us / 100.0", 4)} AS twap
      FROM pu WHERE held_us > 0 ORDER BY user_id"""))

  // -- interval-union coverage (sweep line): each event opens a 30-minute
  //    activity interval [ts, ts+30min); per user, the total time covered
  //    by the UNION of those intervals (overlaps merged) and the count of
  //    merged islands. The classic sweep: sort by start, carry the running
  //    max of interval ends (cummax window), clip each interval's
  //    contribution to what extends past that horizon. All integer µs
  //    arithmetic on PARTITIONED windows — per-user sweeps run in
  //    parallel, nothing global anywhere, exact cross-engine.
  private val IntervalUs = 30L * 60L * 1000000L

  private val intervalCoverage = QueryDef(
    "q_interval_coverage",
    (s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_us").asc, col("event_id").asc)
      // horizon BEFORE this row: furthest end among preceding intervals
      val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_us"))
        .withColumn("end_us", col("ts_us") + lit(IntervalUs))
        .withColumn("horizon", max("end_us").over(wPrev))
        .withColumn("covered",
          greatest(lit(0L),
            col("end_us") - greatest(col("ts_us"),
              coalesce(col("horizon"), col("ts_us")))))
        .withColumn("island_start",
          when(col("horizon").isNull ||
            col("ts_us") >= col("horizon"), 1L).otherwise(0L))
      ev.groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum("covered").as("covered_us"),
          sum("island_start").as("n_islands"))
        .orderBy("user_id")
    },
    Some(s"""
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                   epoch_us(ts) + $IntervalUs AS end_us
                 FROM events),
        sw AS (SELECT user_id, ts_us, end_us,
                 max(end_us) OVER (PARTITION BY user_id
                   ORDER BY ts_us ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS horizon
               FROM e)
      SELECT user_id, count(*) AS n_events,
             CAST(sum(greatest(0, end_us - greatest(ts_us,
               coalesce(horizon, ts_us)))) AS BIGINT) AS covered_us,
             CAST(sum(CASE WHEN horizon IS NULL OR ts_us >= horizon
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_islands
      FROM sw GROUP BY user_id ORDER BY user_id"""))

  // -- OHLC bars: per (user, week) open/high/low/close of `value` — the
  //    canonical downsampling aggregate for time series. Open/close are
  //    positional (first/last by (ts, event_id)) and resolved via
  //    row_number over PARTITIONED windows + conditional aggregation —
  //    identical tie semantics in both engines, no arg_min/arg_max
  //    cross-engine comparator quirks. All values on the exact cent grid.
  private val ohlcBars = QueryDef(
    "q_ohlc_bars",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          expr("CAST(round(value * 100) AS BIGINT)").as("c"))
        .withColumn("week", expr("(ts_us div 86400000000) div 7"))
        .filter(col("user_id") < 500)
      val wAsc = Window.partitionBy("user_id", "week")
        .orderBy(col("ts_us").asc, col("event_id").asc)
      val wDesc = Window.partitionBy("user_id", "week")
        .orderBy(col("ts_us").desc, col("event_id").desc)
      ev.withColumn("rn_a", row_number().over(wAsc))
        .withColumn("rn_d", row_number().over(wDesc))
        .groupBy("user_id", "week")
        .agg(count(lit(1)).as("n"),
          (max(when(col("rn_a") === 1, col("c"))) / 100.0).as("open"),
          (max("c") / 100.0).as("high"),
          (min("c") / 100.0).as("low"),
          (max(when(col("rn_d") === 1, col("c"))) / 100.0).as("close"))
        .orderBy("user_id", "week")
    },
    Some("""
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                   CAST(round(value * 100) AS BIGINT) AS c,
                   (epoch_us(ts) // 86400000000) // 7 AS week
                 FROM events WHERE user_id < 500),
        r AS (SELECT *,
                row_number() OVER (PARTITION BY user_id, week
                  ORDER BY ts_us ASC, event_id ASC) AS rn_a,
                row_number() OVER (PARTITION BY user_id, week
                  ORDER BY ts_us DESC, event_id DESC) AS rn_d
              FROM e)
      SELECT user_id, week, count(*) AS n,
             max(CASE WHEN rn_a = 1 THEN c END) / 100.0 AS open,
             max(c) / 100.0 AS high,
             min(c) / 100.0 AS low,
             max(CASE WHEN rn_d = 1 THEN c END) / 100.0 AS close
      FROM r GROUP BY user_id, week ORDER BY user_id, week"""))

  // -- activity streaks (gaps-and-islands): per user, consecutive-day
  //    runs of activity via the classic day − row_number() island key —
  //    consecutive days share a constant difference, a gap shifts it.
  //    Pure integer arithmetic over PARTITIONED windows; the calendar-day
  //    twin of q_interval_coverage's µs sweep line.
  private val activityStreaks = QueryDef(
    "q_activity_streaks",
    (s, dir) => {
      val days = Tables.events(s, dir)
        .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      val islands = days
        .withColumn("grp", col("day") - row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(count(lit(1)).as("len"))
      islands.groupBy("user_id")
        .agg(count(lit(1)).as("n_streaks"),
          max("len").as("longest_streak"),
          sum("len").as("active_days"))
        .orderBy("user_id")
    },
    Some("""
      WITH days AS (SELECT DISTINCT user_id,
                      epoch_us(ts) // 86400000000 AS day
                    FROM events),
        isl AS (SELECT user_id,
                  day - row_number() OVER (PARTITION BY user_id
                    ORDER BY day) AS grp,
                  day
                FROM days),
        g AS (SELECT user_id, grp, count(*) AS len
              FROM isl GROUP BY user_id, grp)
      SELECT user_id, count(*) AS n_streaks,
             CAST(max(len) AS BIGINT) AS longest_streak,
             CAST(sum(len) AS BIGINT) AS active_days
      FROM g GROUP BY user_id ORDER BY user_id"""))

  // -- seasonal-baseline anomaly detection: daily revenue per event type,
  //    de-seasonalized against the same-weekday mean, flagged where the
  //    residual exceeds 3×MAD (median absolute deviation — the robust
  //    dispersion that one genuine outlier cannot inflate, unlike σ).
  //    The standard ops-metric monitor shape: seasonal naive baseline +
  //    robust residual gate.
  //
  //    Scale + determinism shape: the ONLY corpus-sized operation is the
  //    daily rollup (map-side-combined sum of cents-integers — exact
  //    longs); everything downstream (weekday baselines, residuals, the
  //    per-type exact median) operates on the days×types frame, hundreds
  //    of rows regardless of corpus size. Weekday comes from pure integer
  //    arithmetic on epoch-days ((day + 4) mod 7 — 1970-01-01 was a
  //    Thursday), identical in both engines — never dayofweek(), whose
  //    0-vs-1 base differs across engines.
  private val seasonalAnomaly = QueryDef(
    "q_seasonal_anomaly",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .select(col("event_type"),
          expr("ts_us div 86400000000").as("day"),
          expr("CAST(round(value * 100) AS BIGINT)").as("c"))
        .groupBy("event_type", "day")
        .agg(sum("c").as("daily_c"))
        .withColumn("dow", expr("(day + 4) % 7"))
      val base = daily.groupBy("event_type", "dow")
        .agg(avg("daily_c").as("wd_avg"))
      val resid = daily.join(base, Seq("event_type", "dow"))
        .withColumn("resid", col("daily_c") - col("wd_avg"))
        .withColumn("aresid", abs(col("resid")))
      val mad = resid.groupBy("event_type")
        .agg(expr("percentile(aresid, 0.5)").as("mad"))
      resid.join(mad, Seq("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          dround(first("mad") / lit(100.0), 4).as("mad_rev"),
          sum(when(col("aresid") > lit(3.0) * col("mad"), 1L).otherwise(0L))
            .as("n_anomalies"),
          dround(max("aresid") / lit(100.0), 4).as("max_abs_resid"))
        .orderBy("event_type")
    },
    Some(s"""
      WITH daily AS MATERIALIZED (SELECT event_type,
                       epoch_us(ts) // 86400000000 AS day,
                       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                         AS daily_c
                     FROM events GROUP BY 1, 2),
        d AS (SELECT *, (day + 4) % 7 AS dow FROM daily),
        base AS (SELECT event_type, dow, avg(daily_c) AS wd_avg
                 FROM d GROUP BY 1, 2),
        resid AS MATERIALIZED (SELECT d.event_type, d.day,
                    abs(d.daily_c - b.wd_avg) AS aresid
                  FROM d JOIN base b
                    ON d.event_type = b.event_type AND d.dow = b.dow),
        mad AS (SELECT event_type, median(aresid) AS mad
                FROM resid GROUP BY 1)
      SELECT r.event_type, count(*) AS n_days,
             ${oround("any_value(m.mad) / 100.0", 4)} AS mad_rev,
             CAST(sum(CASE WHEN r.aresid > 3.0 * m.mad THEN 1 ELSE 0 END)
               AS BIGINT) AS n_anomalies,
             ${oround("max(r.aresid) / 100.0", 4)} AS max_abs_resid
      FROM resid r JOIN mad m ON r.event_type = m.event_type
      GROUP BY r.event_type ORDER BY r.event_type"""))

  // -- calendar densification + last-observation-carried-forward: turn a
  //    sparse per-user daily series into a dense one (every day between
  //    the user's first and last observation) with gaps filled by the
  //    most recent value — the standard prep before any fixed-step
  //    time-series model, and the LOCF join a feature store executes at
  //    serving time. Gap-fill uses the portable two-window trick (running
  //    count of non-nulls forms a group key per observation run; the
  //    group max IS the carried value) instead of IGNORE NULLS, which
  //    not every engine supports with identical semantics.
  //
  //    Scale + determinism: the per-(user, day) last-value pick is a
  //    partitioned row_number with a total (ts, event_id) tie-break; the
  //    dense grid is sequence()-exploded per user (bounded by the span,
  //    never a global calendar cross join); both LOCF windows are
  //    partitioned by user. Values ride as exact cents-longs; the only
  //    division is the final per-user sum / 100.
  private val gapFillLocf = QueryDef(
    "q_gap_fill_locf",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("user_id") < 50)
        .select(col("user_id"),
          expr("ts_us div 86400000000").as("day"),
          col("ts_us"), col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      val wLast = Window.partitionBy("user_id", "day")
        .orderBy(col("ts_us").desc, col("event_id").desc)
      val daily = ev.withColumn("rn", row_number().over(wLast))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("day"), col("c").as("v"))
      val grid = daily.groupBy("user_id")
        .agg(min("day").as("mn"), max("day").as("mx"))
        .select(col("user_id"),
          explode(expr("sequence(mn, mx)")).as("day"))
      val wCum = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val filled = grid.join(daily, Seq("user_id", "day"), "left")
        .withColumn("grp", count(col("v")).over(wCum))
      val wGrp = Window.partitionBy("user_id", "grp")
      filled.withColumn("fv", max("v").over(wGrp))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_days"),
          sum(when(col("v").isNotNull, 1L).otherwise(0L)).as("n_observed"),
          sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_filled"),
          (sum("fv") / lit(100.0)).as("sum_filled"))
        .orderBy("user_id")
    },
    Some("""
      WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                    epoch_us(ts) AS ts_us, event_id,
                    CAST(round(value * 100) AS BIGINT) AS c
                  FROM events WHERE user_id < 50),
        daily AS MATERIALIZED (
              SELECT user_id, day, c AS v
              FROM (SELECT *, row_number() OVER (PARTITION BY user_id, day
                      ORDER BY ts_us DESC, event_id DESC) AS rn
                    FROM ev)
              WHERE rn = 1),
        grid AS (SELECT user_id, unnest(generate_series(mn, mx)) AS day
                 FROM (SELECT user_id, min(day) AS mn, max(day) AS mx
                       FROM daily GROUP BY user_id)),
        j AS (SELECT g.user_id, g.day, d.v,
                count(d.v) OVER (PARTITION BY g.user_id ORDER BY g.day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
              FROM grid g LEFT JOIN daily d
                ON g.user_id = d.user_id AND g.day = d.day),
        f AS (SELECT *, max(v) OVER (PARTITION BY user_id, grp) AS fv FROM j)
      SELECT user_id, count(*) AS n_days,
             CAST(sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_observed,
             CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_filled,
             CAST(sum(fv) AS BIGINT) / 100.0 AS sum_filled
      FROM f GROUP BY user_id ORDER BY user_id"""))

  // -- rolling EXACT median (trailing 7 days) of the per-type daily
  //    revenue series: the robust-smoothing sibling of q_ewma_value (mean
  //    smoothing) and q_seasonal_anomaly (MAD gate). The raw stream
  //    collapses to one row per (type, day) — a calendar-bounded frame —
  //    before any window runs, so the percentile frames are ≤7 rows and
  //    the window partitions by event_type. Exact interpolated median on
  //    integer cents: odd frames pick an element, even frames average two
  //    — both reproducible bit-for-bit in DuckDB's quantile_cont.
  private val rollingMedian = QueryDef(
    "q_rolling_median_7d",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("x"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
      daily
        .withColumn("med", percentile(col("x"), lit(0.5)).over(w))
        .select(col("event_type"), col("day"),
          dround(col("x") / 100.0, 2).as("revenue"),
          dround(col("med") / 100.0, 2).as("med_7d"))
        .orderBy("event_type", "day")
    },
    Some(s"""
      WITH daily AS (SELECT event_type,
                       epoch_us(ts) // 86400000000 AS day,
                       CAST(sum(CAST(round(value * 100) AS BIGINT))
                         AS BIGINT) AS x
                     FROM events GROUP BY 1, 2),
        r AS (SELECT event_type, day, x,
                quantile_cont(x, 0.5) OVER (PARTITION BY event_type
                  ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                  AS med
              FROM daily)
      SELECT event_type, day, ${oround("x / 100.0", 2)} AS revenue,
             ${oround("med / 100.0", 2)} AS med_7d
      FROM r ORDER BY event_type, day"""))

  // -- Burstiness coefficient (Goh & Barabási 2008) of per-user
  //    inter-event times: B = (σ−μ)/(σ+μ) over each user's gap sequence
  //    (−1 = metronome, 0 = Poisson, →1 = bursty). Gaps come from a
  //    user-partitioned lag window in SECONDS (µs² sums would overflow
  //    Long); per-user moments are exact integer sums, B is one double
  //    expression on them, and the report is a per-bin census over
  //    dround-snapped B — bounded output at any scale, no boundary
  //    ambiguity between engines.
  private val burstiness = QueryDef(
    "q_burstiness",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts_us").asc, col("event_id").asc)
      val gaps = Tables.events(s, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"))
        .withColumn("prev", lag("ts_us", 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("user_id"),
          expr("(ts_us - prev) div 1000000").as("g"))
      val perUser = gaps.groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("g").as("sg"),
          sum(expr("g * g")).as("sgg"))
        .filter(col("n") >= 5)
        .withColumn("mu", col("sg").cast("double") / col("n"))
        .withColumn("sig", sqrt(col("sgg").cast("double") / col("n")
          - col("mu") * col("mu")))
        .withColumn("b", dround((col("sig") - col("mu"))
          / (col("sig") + col("mu")), 4))
        // bi: b on the exact 1e-4 integer grid, so the per-bin mean is a
        // LONG sum (partition-order-proof); bin via floor on the double
        // (floor, not DIV — Spark DIV truncates toward zero on negatives,
        // DuckDB // floors; floor() agrees in both)
        .withColumn("bi", expr("CAST(round(b * 1e4) AS BIGINT)"))
      perUser.groupBy(floor(col("b") * 10).cast("long").as("bin"))
        .agg(count(lit(1)).as("n_users"),
          dround(sum("bi").cast("double") / count(lit(1)) / 1e4, 4)
            .as("mean_b"))
        .orderBy("bin")
    },
    Some(s"""
      WITH gaps AS (SELECT user_id,
                      (epoch_us(ts) - lag(epoch_us(ts)) OVER
                        (PARTITION BY user_id
                         ORDER BY epoch_us(ts) ASC, event_id ASC))
                        // 1000000 AS g
                    FROM events),
        pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(g) AS BIGINT) AS sg,
                 CAST(sum(g * g) AS BIGINT) AS sgg
               FROM gaps WHERE g IS NOT NULL GROUP BY 1),
        b AS (SELECT user_id, n,
                ${oround(
                  """(sqrt(CAST(sgg AS DOUBLE) / n
                       - (CAST(sg AS DOUBLE) / n) * (CAST(sg AS DOUBLE) / n))
                     - CAST(sg AS DOUBLE) / n)
                   / (sqrt(CAST(sgg AS DOUBLE) / n
                       - (CAST(sg AS DOUBLE) / n) * (CAST(sg AS DOUBLE) / n))
                     + CAST(sg AS DOUBLE) / n)""", 4)} AS b
              FROM pu WHERE n >= 5)
      SELECT CAST(floor(b * 10) AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS n_users,
             ${oround(
               "CAST(CAST(sum(CAST(round(b * 1e4) AS BIGINT)) AS BIGINT) AS DOUBLE) / count(*) / 1e4",
               4)} AS mean_b
      FROM b GROUP BY 1 ORDER BY bin"""))

  // -- batch twin of the transformWithState streaming anomaly flagger
  //    (graft.streaming.StreamAnomaly): flag events exceeding 3× the
  //    user's running mean after a ≥5-event baseline, via an exclusive
  //    user-partitioned window and the same cross-multiplied integer test
  //    the processor runs — StreamAnomalySpec asserts row parity between
  //    this plan and the streaming state machine on a shared fixture, and
  //    this oracle certifies both.
  private val runningAnomalyFlags = QueryDef(
    "q_running_anomaly_flags",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      graft.streaming.StreamAnomaly.batchFlags(ev)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_flags"),
          dround(max(col("v").cast("double")
            / (col("bs").cast("double") / col("bn"))), 4).as("max_ratio"))
        .filter(col("n_flags") >= 1L)
        .orderBy(col("n_flags").desc, col("user_id").asc)
        .limit(20)
    },
    Some(s"""
      WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                    CAST(round(value * 100) AS BIGINT) AS v
                  FROM events),
        run AS (SELECT user_id, event_id, v,
                  count(*) OVER w AS bn,
                  coalesce(CAST(sum(v) OVER w AS BIGINT), 0) AS bs
                FROM ev
                WINDOW w AS (PARTITION BY user_id
                  ORDER BY ts_us ASC, event_id ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        fl AS (SELECT user_id, v, bn, bs FROM run
               WHERE bn >= 5 AND v * bn > 3 * bs)
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_flags,
             ${oround(
               "max(CAST(v AS DOUBLE) / (CAST(bs AS DOUBLE) / bn))", 4)}
               AS max_ratio
      FROM fl GROUP BY user_id HAVING count(*) >= 1
      ORDER BY n_flags DESC, user_id ASC LIMIT 20"""))

  // -- DAU / WAU / MAU active-user ladder with the stickiness ratio: for
  //    every observed day, distinct users active that day, in the
  //    trailing 7, and in the trailing 30. The raw stream first collapses
  //    to distinct (day, user) pairs — the grid every later step runs on
  //    — then each pair fans out to the ≤30 target days it supports via a
  //    broadcast range join against the tiny day list (bounded fan, no
  //    row explosion), and one exact distinct-count per (target day,
  //    window) finishes. Day cardinality is calendar-bounded, so the
  //    output frame never grows with volume.
  private val dauWauMau = QueryDef(
    "q_dau_wau_mau",
    (s, dir) => {
      val du = Tables.events(s, dir)
        .select(expr("ts_us div 86400000000").as("day"), col("user_id"))
        .distinct()
      Cached.withPinned(du) { case Seq(du) => // r15: pin + plan-truncate
        val days = du.select(col("day").as("d")).distinct()
        val fan = du.join(broadcast(days),
          col("day") <= col("d") && col("day") > col("d") - 30L)
        fan.groupBy("d")
          .agg(countDistinct(when(col("day") === col("d"), col("user_id")))
            .as("dau"),
            countDistinct(when(col("day") > col("d") - 7L, col("user_id")))
              .as("wau"),
            countDistinct("user_id").as("mau"))
          .select(col("d").as("day"), col("dau"), col("wau"), col("mau"),
            dround(col("dau").cast("double") / col("mau"), 4)
              .as("stickiness"))
          .orderBy("day")
      }
    },
    Some(s"""
      WITH du AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
                    user_id
                  FROM events),
        days AS (SELECT DISTINCT day AS d FROM du),
        fan AS (SELECT days.d, du.day, du.user_id
                FROM du JOIN days ON du.day <= days.d
                                 AND du.day > days.d - 30),
        agg AS (SELECT d,
                  CAST(count(DISTINCT CASE WHEN day = d THEN user_id END)
                    AS BIGINT) AS dau,
                  CAST(count(DISTINCT CASE WHEN day > d - 7 THEN user_id END)
                    AS BIGINT) AS wau,
                  CAST(count(DISTINCT user_id) AS BIGINT) AS mau
                FROM fan GROUP BY d)
      SELECT d AS day, dau, wau, mau,
             ${oround("CAST(dau AS DOUBLE) / mau", 4)} AS stickiness
      FROM agg ORDER BY day"""))

  // -- Seasonality-strength diagnostic per event type: the share of
  //    daily-mean variance explained by the day-of-week profile,
  //    1 − var(residual)/var(total) (the STL "strength of seasonality"
  //    statistic on a weekly period). Two grouped aggregates over the
  //    calendar-bounded daily frame; every variance comes from exact
  //    cents sums at the leaves.
  private val seasonalityStrength = QueryDef(
    "q_seasonality_strength",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sc"),
          count(lit(1)).as("c"))
        .withColumn("x", col("sc").cast("double") / col("c") / 100.0)
        .withColumn("dow", expr("(day + 4) % 7"))
      Cached.withPinned(daily) { case Seq(daily) => // r15: pin + plan-truncate
        val dowMean = daily.groupBy("event_type", "dow")
          .agg((sum("x") / count(lit(1))).as("dm"))
        daily.join(broadcast(dowMean), Seq("event_type", "dow"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_days"),
            ((sum(col("x") * col("x")) / count(lit(1)))
              - (sum("x") / count(lit(1))) * (sum("x") / count(lit(1))))
              .as("var_tot"),
            (sum((col("x") - col("dm")) * (col("x") - col("dm")))
              / count(lit(1))).as("var_res"))
          .select(col("event_type"), col("n_days"),
            dround(greatest(lit(0.0),
              lit(1.0) - col("var_res") / col("var_tot")), 4)
              .as("seasonality_strength"))
          .orderBy("event_type")
      }
    },
    Some(s"""
      WITH daily AS (SELECT event_type,
                       epoch_us(ts) // 86400000000 AS day,
                       CAST(sum(CAST(round(value * 100) AS BIGINT))
                         AS BIGINT) AS sc,
                       CAST(count(*) AS BIGINT) AS c
                     FROM events GROUP BY 1, 2),
        d2 AS (SELECT event_type, CAST(sc AS DOUBLE) / c / 100.0 AS x,
                 (day + 4) % 7 AS dow
               FROM daily),
        dm AS (SELECT event_type, dow, sum(x) / count(*) AS dm
               FROM d2 GROUP BY 1, 2),
        agg AS (SELECT d2.event_type,
                  CAST(count(*) AS BIGINT) AS n_days,
                  sum(d2.x * d2.x) / count(*)
                    - (sum(d2.x) / count(*)) * (sum(d2.x) / count(*))
                    AS var_tot,
                  sum((d2.x - dm.dm) * (d2.x - dm.dm)) / count(*) AS var_res
                FROM d2 JOIN dm ON d2.event_type = dm.event_type
                              AND d2.dow = dm.dow
                GROUP BY 1)
      SELECT event_type, n_days,
             ${oround("greatest(0.0, 1.0 - var_res / var_tot)", 4)}
               AS seasonality_strength
      FROM agg ORDER BY event_type"""))

  // -- Lagged cross-correlation between the view and purchase daily
  //    revenue series (lead–lag detection: does view activity lead
  //    purchases?): Pearson r of (view[t], purchase[t+k]) for k ∈
  //    −3..3, each series standardized by its own full-series moments.
  //    The ACF machinery applied across two series; everything runs on
  //    the calendar-bounded daily frame.
  private val xcorrLagged = QueryDef(
    "q_xcorr_lagged",
    (s, dir) => {
      import s.implicits._
      val daily = Tables.events(s, dir)
        .filter(col("event_type").isin("view", "purchase"))
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("x"))
      Cached.withPinned(daily) { case Seq(daily) => // r15: pin + plan-truncate
        val a = daily.filter(col("event_type") === "view")
          .select(col("day"), col("x").as("xa"))
        val b = daily.filter(col("event_type") === "purchase")
          .select(col("day").as("dayb"), col("x").as("xb"))
        val lags = (-3 to 3).toDF("lag")
        val pairs = a.crossJoin(broadcast(lags))
          .join(b, col("dayb") === col("day") + col("lag"))
        pairs.groupBy("lag")
          .agg(count(lit(1)).as("n_pairs"),
            sum("xa").as("sa"), sum("xb").as("sb"),
            sum(expr("xa * xb")).as("sab"),
            sum(expr("xa * xa")).as("saa"),
            sum(expr("xb * xb")).as("sbb"))
          .select(col("lag"), col("n_pairs"),
            dround((col("sab").cast("double")
              - col("sa").cast("double") * col("sb") / col("n_pairs"))
              / sqrt((col("saa").cast("double")
                - col("sa").cast("double") * col("sa") / col("n_pairs"))
                * (col("sbb").cast("double")
                  - col("sb").cast("double") * col("sb") / col("n_pairs"))), 6)
              .as("xcorr"))
          .orderBy("lag")
      }
    },
    Some(s"""
      WITH daily AS (SELECT event_type,
                       epoch_us(ts) // 86400000000 AS day,
                       CAST(sum(CAST(round(value * 100) AS BIGINT))
                         AS BIGINT) AS x
                     FROM events
                     WHERE event_type IN ('view', 'purchase')
                     GROUP BY 1, 2),
        a AS (SELECT day, x AS xa FROM daily WHERE event_type = 'view'),
        b AS (SELECT day AS dayb, x AS xb FROM daily
              WHERE event_type = 'purchase'),
        pairs AS (SELECT l.lag, a.xa, b.xb
                  FROM a
                  CROSS JOIN (SELECT unnest(generate_series(-3, 3)) AS lag) l
                  JOIN b ON b.dayb = a.day + l.lag),
        m AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(sum(xa) AS BIGINT) AS sa, CAST(sum(xb) AS BIGINT) AS sb,
                CAST(sum(xa * xb) AS BIGINT) AS sab,
                CAST(sum(xa * xa) AS BIGINT) AS saa,
                CAST(sum(xb * xb) AS BIGINT) AS sbb
              FROM pairs GROUP BY lag)
      SELECT lag, n_pairs,
             ${oround(
               """(CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * sb / n_pairs)
                / sqrt((CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / n_pairs)
                  * (CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / n_pairs))""",
               6)} AS xcorr
      FROM m ORDER BY lag"""))

  // -- Daily new-vs-returning active users: each day's actives split by
  //    whether it is the user's FIRST observed day — the standard product
  //    growth panel next to q_dau_wau_mau. One distinct (day, user) grid,
  //    one min-day per user, one grouped count; day cardinality is
  //    calendar-bounded.
  private val newReturning = QueryDef(
    "q_new_returning",
    (s, dir) => {
      val du = Tables.events(s, dir)
        .select(expr("ts_us div 86400000000").as("day"), col("user_id"))
        .distinct()
      Cached.withPinned(du) { case Seq(du) => // r15: pin + plan-truncate
        val first = du.groupBy("user_id").agg(min("day").as("first_day"))
        du.join(first, "user_id")
          .groupBy("day")
          .agg(count(lit(1)).as("n_active"),
            sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
              .as("n_new"))
          .select(col("day"), col("n_active"), col("n_new"),
            (col("n_active") - col("n_new")).as("n_returning"),
            dround(col("n_new").cast("double") / col("n_active"), 4)
              .as("pct_new"))
          .orderBy("day")
      }
    },
    Some(s"""
      WITH du AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
                    user_id FROM events),
        f AS (SELECT user_id, min(day) AS first_day FROM du GROUP BY 1),
        agg AS (SELECT day, CAST(count(*) AS BIGINT) AS n_active,
                  CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new
                FROM du JOIN f ON du.user_id = f.user_id
                GROUP BY day)
      SELECT day, n_active, n_new, n_active - n_new AS n_returning,
             ${oround("CAST(n_new AS DOUBLE) / n_active", 4)} AS pct_new
      FROM agg ORDER BY day"""))

  // -- Multi-touch Shapley attribution vs last-touch: each converting
  //    user's pre-purchase channel set splits the conversion credit
  //    equally (the Shapley value under a symmetric coalition function —
  //    the standard data-driven-attribution baseline), compared against
  //    the last-touch count. Credits stay EXACT: with ≤4 channels the
  //    per-channel share is 12/k twelfths — integer arithmetic end-to-end,
  //    one /12 at the end. Windows partition by user.
  private val shapleyAttribution = QueryDef(
    "q_shapley_attribution",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("event_type"))
      Cached.withPinned(ev) { case Seq(ev) => // r15: pin + plan-truncate
        val fp = ev.filter(col("event_type") === "purchase")
          .groupBy("user_id").agg(min("ts_us").as("fp_ts"))
        val pre = ev.join(fp, "user_id")
          .filter(col("ts_us") < col("fp_ts")
            && col("event_type") =!= "purchase")
        val channels = pre.select("user_id", "event_type").distinct()
        val k = channels.groupBy("user_id").agg(count(lit(1)).as("k"))
        val shap = channels.join(k, "user_id")
          .groupBy(col("event_type").as("channel"))
          .agg(count(lit(1)).as("n_users"),
            sum(expr("12 div k")).as("credit_twelfths"))
        val wL = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id")
          .orderBy(col("ts_us").desc, col("event_id").desc)
        val last = pre.withColumn("rn", row_number().over(wL))
          .filter(col("rn") === 1)
          .groupBy(col("event_type").as("channel"))
          .agg(count(lit(1)).as("last_touch"))
        shap.join(last, Seq("channel"), "full_outer")
          .select(col("channel"),
            coalesce(col("n_users"), lit(0L)).as("n_users"),
            dround(coalesce(col("credit_twelfths"), lit(0L)).cast("double")
              / 12.0, 4).as("shapley_credit"),
            coalesce(col("last_touch"), lit(0L)).as("last_touch"))
          .orderBy("channel")
      }
    },
    Some(s"""
      WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                    event_type FROM events),
        fp AS (SELECT user_id, min(ts_us) AS fp_ts FROM ev
               WHERE event_type = 'purchase' GROUP BY 1),
        pre AS (SELECT ev.* FROM ev JOIN fp ON ev.user_id = fp.user_id
                WHERE ev.ts_us < fp.fp_ts AND ev.event_type <> 'purchase'),
        ch AS (SELECT DISTINCT user_id, event_type FROM pre),
        k AS (SELECT user_id, CAST(count(*) AS BIGINT) AS k
              FROM ch GROUP BY 1),
        shap AS (SELECT ch.event_type AS channel,
                   CAST(count(*) AS BIGINT) AS n_users,
                   CAST(sum(12 // k.k) AS BIGINT) AS credit_twelfths
                 FROM ch JOIN k ON ch.user_id = k.user_id
                 GROUP BY 1),
        last AS (SELECT event_type AS channel,
                   CAST(count(*) AS BIGINT) AS last_touch
                 FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                         ORDER BY ts_us DESC, event_id DESC) AS rn
                       FROM pre)
                 WHERE rn = 1 GROUP BY 1)
      SELECT coalesce(shap.channel, last.channel) AS channel,
             CAST(coalesce(n_users, 0) AS BIGINT) AS n_users,
             ${oround(
               "CAST(coalesce(credit_twelfths, 0) AS DOUBLE) / 12.0", 4)}
               AS shapley_credit,
             CAST(coalesce(last_touch, 0) AS BIGINT) AS last_touch
      FROM shap FULL OUTER JOIN last ON shap.channel = last.channel
      ORDER BY channel"""))

  // -- Funnel conversion-time quantiles: seconds from a user's FIRST
  //    signup to their FIRST subsequent purchase, with exact p50/p90 over
  //    the converted population (HistQuantiles on the seconds grid — the
  //    audited bounded-window two-pass) plus the conversion rate. One
  //    conditional-min scan per user; non-converters (purchase before
  //    signup or never) count only in the rate denominator.
  private val conversionTime = QueryDef(
    "q_conversion_time",
    (s, dir) => {
      import graft.operators.HistQuantiles
      val firsts = Tables.events(s, dir)
        .filter(col("event_type").isin("signup", "purchase"))
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "signup", col("ts_us"))).as("su"),
          min(when(col("event_type") === "purchase", col("ts_us"))).as("pu"))
        .filter(col("su").isNotNull)
      Cached.withPinned(firsts) { case Seq(firsts) => // r15: pin + plan-truncate
        val conv = firsts.filter(col("pu") > col("su"))
          .select(expr("(pu - su) div 1000000").as("delay_s"))
        val qs = HistQuantiles.quantiles(conv, col("delay_s"), Seq(0.5, 0.9))
          .agg(min(when(col("q") === 0.5, col("value"))).as("p50_s"),
            min(when(col("q") === 0.9, col("value"))).as("p90_s"))
        val rates = firsts.agg(count(lit(1)).as("n_signup"),
          sum(when(col("pu") > col("su"), 1L).otherwise(0L)).as("n_converted"))
        rates.crossJoin(broadcast(qs))
          .select(col("n_signup"), col("n_converted"),
            dround(col("n_converted").cast("double") / col("n_signup"), 4)
              .as("conversion_rate"),
            dround(col("p50_s"), 2).as("p50_s"),
            dround(col("p90_s"), 2).as("p90_s"))
      }
    },
    Some(s"""
      WITH firsts AS (SELECT user_id,
                        min(CASE WHEN event_type = 'signup'
                          THEN epoch_us(ts) END) AS su,
                        min(CASE WHEN event_type = 'purchase'
                          THEN epoch_us(ts) END) AS pu
                      FROM events
                      WHERE event_type IN ('signup', 'purchase')
                      GROUP BY 1),
        sgn AS (SELECT * FROM firsts WHERE su IS NOT NULL),
        conv AS (SELECT (pu - su) // 1000000 AS delay_s FROM sgn
                 WHERE pu > su),
        qs AS (SELECT quantile_cont(delay_s, 0.5) AS p50_s,
                      quantile_cont(delay_s, 0.9) AS p90_s
               FROM conv),
        rates AS (SELECT CAST(count(*) AS BIGINT) AS n_signup,
                    CAST(sum(CASE WHEN pu > su THEN 1 ELSE 0 END) AS BIGINT)
                      AS n_converted
                  FROM sgn)
      SELECT n_signup, n_converted,
             ${oround("CAST(n_converted AS DOUBLE) / n_signup", 4)}
               AS conversion_rate,
             ${oround("p50_s", 2)} AS p50_s,
             ${oround("p90_s", 2)} AS p90_s
      FROM rates, qs"""))

  // -- Cohort LTV curves: cumulative revenue per signup-week cohort by
  //    age-week — the revenue companion to q_cohort_retention's user
  //    counts. Cohort = the user's first event week, age = weeks since;
  //    revenue accumulates along age via a window partitioned by cohort
  //    (calendar-bounded frames). Exact cents end-to-end; LTV divides by
  //    cohort size once at the end.
  private val cohortLtv = QueryDef(
    "q_cohort_ltv",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), expr("ts_us div 604800000000").as("wk"),
          expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      Cached.withPinned(ev) { case Seq(ev) => // r15: pin + plan-truncate
        val firstWk = ev.groupBy("user_id").agg(min("wk").as("cohort"))
        val sized = firstWk.groupBy("cohort").agg(count(lit(1)).as("n_users"))
        val rev = ev.join(firstWk, "user_id")
          .groupBy(col("cohort"), (col("wk") - col("cohort")).as("age"))
          .agg(sum("v").as("rev"))
        val wC = org.apache.spark.sql.expressions.Window
          .partitionBy("cohort").orderBy("age")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        rev.withColumn("cum_rev", sum("rev").over(wC))
          .join(broadcast(sized), "cohort")
          .select(col("cohort"), col("age"), col("n_users"),
            dround(col("cum_rev") / 100.0, 2).as("cum_revenue"),
            dround(col("cum_rev").cast("double") / col("n_users") / 100.0, 4)
              .as("ltv_per_user"))
          .orderBy("cohort", "age")
      }
    },
    Some(s"""
      WITH ev AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk,
                    CAST(round(value * 100) AS BIGINT) AS v
                  FROM events),
        fw AS (SELECT user_id, min(wk) AS cohort FROM ev GROUP BY 1),
        sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_users
               FROM fw GROUP BY 1),
        rev AS (SELECT fw.cohort, ev.wk - fw.cohort AS age,
                  CAST(sum(v) AS BIGINT) AS rev
                FROM ev JOIN fw ON ev.user_id = fw.user_id
                GROUP BY 1, 2),
        cum AS (SELECT cohort, age,
                  CAST(sum(rev) OVER (PARTITION BY cohort ORDER BY age)
                    AS BIGINT) AS cum_rev
                FROM rev)
      SELECT cum.cohort, cum.age, sz.n_users,
             ${oround("cum_rev / 100.0", 2)} AS cum_revenue,
             ${oround("CAST(cum_rev AS DOUBLE) / sz.n_users / 100.0", 4)}
               AS ltv_per_user
      FROM cum JOIN sz ON cum.cohort = sz.cohort
      ORDER BY cum.cohort, age"""))

  // -- Holt linear (double exponential) smoothing of the per-type daily
  //    revenue series — the trend-aware sibling of q_ewma_value (level
  //    only) and the forecasting primitive a monitoring pipeline runs per
  //    metric. A LEVEL+TREND recurrence is inherently sequential, so it
  //    cannot be a window frame; the engine-honest shape is: collapse the
  //    stream to one bounded series per key (calendar days — ≤ fixture
  //    span regardless of corpus size), collect IN ORDER, and fold with
  //    the `aggregate` higher-order function. Scale-out is across keys
  //    (millions of metrics at 100 TB, each series bounded); the fold is
  //    per-row driver-free codegen'd work, never a corpus-wide window.
  //    Determinism: α = β = 1/2 with floor() after each halving keeps
  //    level and trend on the INTEGER cent grid at every step (stored in
  //    doubles — exact below 2^53), so the fold is bit-identical in both
  //    engines; the zero-initial-trend variant (l₁ = y₁, b₁ = 0) keeps
  //    the init single-element [Holt 1957 / Hyndman & Athanasopoulos §8.2
  //    form with grid arithmetic]. The trend update folds the nested
  //    floors into one: b' = ⌊(l' − l + b)/2⌋ = ⌊(x − l + 3b)/4⌋ for
  //    integer inputs — each accumulator slot is then a pure function of
  //    the OLD accumulator, and the state rides a 2-element DOUBLE array:
  //    DuckDB 1.0's list_reduce evaluates STRUCT result fields in place
  //    (a later field's `acc.l` sees the already-updated l), so a struct
  //    accumulator silently computes a different recurrence; arrays
  //    evaluate atomically in both engines.
  private val holtLinear = QueryDef(
    "q_holt_linear",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("c"))
      daily.groupBy("event_type")
        .agg(array_sort(collect_list(struct(col("day"), col("c")))).as("sd"))
        .withColumn("xs", expr("transform(sd, e -> CAST(e.c AS DOUBLE))"))
        .select(col("event_type"),
          size(col("xs")).cast("long").as("n_days"),
          expr("""aggregate(slice(xs, 2, size(xs) - 1),
              array(xs[0], CAST(0.0 AS DOUBLE)),
              (acc, x) -> array(
                CAST(floor((x + acc[0] + acc[1]) / 2) AS DOUBLE),
                CAST(floor((x - acc[0] + 3 * acc[1]) / 4) AS DOUBLE)))""")
            .as("hb"))
        .select(col("event_type"), col("n_days"),
          dround(expr("hb[0]") / 100.0, 4).as("level"),
          dround(expr("hb[1]") / 100.0, 4).as("trend"),
          dround((expr("hb[0]") + lit(7) * expr("hb[1]")) / 100.0, 4)
            .as("forecast_7d"))
        .orderBy("event_type")
    },
    Some(s"""
      WITH daily AS (SELECT event_type,
                       epoch_us(ts) // 86400000000 AS day,
                       CAST(sum(CAST(round(value * 100) AS BIGINT))
                         AS BIGINT) AS c
                     FROM events GROUP BY 1, 2),
        s AS (SELECT event_type,
                list_transform(list(c ORDER BY day), v -> CAST(v AS DOUBLE))
                  AS xs
              FROM daily GROUP BY event_type),
        f AS (SELECT event_type, CAST(len(xs) AS BIGINT) AS n_days,
                list_reduce(
                  list_prepend([xs[1], CAST(0.0 AS DOUBLE)],
                    list_transform(xs[2:],
                      v -> [v, CAST(0.0 AS DOUBLE)])),
                  (acc, e) -> [
                    CAST(floor((e[1] + acc[1] + acc[2]) / 2) AS DOUBLE),
                    CAST(floor((e[1] - acc[1] + 3 * acc[2]) / 4) AS DOUBLE)])
                  AS hb
              FROM s)
      SELECT event_type, n_days,
             ${oround("hb[1] / 100.0", 4)} AS level,
             ${oround("hb[2] / 100.0", 4)} AS trend,
             ${oround("(hb[1] + 7 * hb[2]) / 100.0", 4)} AS forecast_7d
      FROM f ORDER BY event_type"""))

  // -- Theil–Sen estimator [Sen 1968]: the median of all pairwise slopes
  //    of the per-type daily revenue series — the robust trend that a
  //    single anomalous day cannot move (the regression sibling of
  //    q_mad_outliers' location robustness). O(n²) pairs per key, bounded
  //    by the CALENDAR (30-day fixture → ≤435 pairs) — never by corpus
  //    size — and generated map-side by the same collect+posexplode+slice
  //    expansion as q_adamic_adar: one shuffle to the daily rollup, one to
  //    the per-type median; no self-join of an exploded frame. Slopes are
  //    exact-integer ratios evaluated once in IEEE double (identical in
  //    both engines); the even-count median interpolates two identical
  //    doubles identically (q_rolling_median_7d's certified pairing).
  private val theilSen = QueryDef(
    "q_theil_sen",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("c"))
      daily.groupBy("event_type")
        .agg(array_sort(collect_list(struct(col("day"), col("c")))).as("ps"))
        .select(col("event_type"), posexplode(col("ps")).as(Seq("i", "a")),
          col("ps"))
        .select(col("event_type"), col("a"),
          explode(expr("slice(ps, i + 2, size(ps))")).as("b"))
        .select(col("event_type"),
          ((col("b.c") - col("a.c")).cast("double")
            / (col("b.day") - col("a.day")).cast("double")).as("slope"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_pairs"),
          expr("percentile(slope, 0.5)").as("m"))
        .select(col("event_type"), col("n_pairs"),
          dround(col("m") / 100.0, 6).as("sen_slope"))
        .orderBy("event_type")
    },
    Some(s"""
      WITH daily AS (SELECT event_type,
                       epoch_us(ts) // 86400000000 AS day,
                       CAST(sum(CAST(round(value * 100) AS BIGINT))
                         AS BIGINT) AS c
                     FROM events GROUP BY 1, 2),
        p AS (SELECT x.event_type,
                CAST(y.c - x.c AS DOUBLE) / CAST(y.day - x.day AS DOUBLE)
                  AS slope
              FROM daily x JOIN daily y
                ON x.event_type = y.event_type AND x.day < y.day)
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
             ${oround("quantile_cont(slope, 0.5) / 100.0", 6)} AS sen_slope
      FROM p GROUP BY event_type ORDER BY event_type"""))

  // -- Mann–Kendall trend test [Mann 1945; Kendall 1975]: the
  //    non-parametric S statistic over the per-type daily revenue series
  //    — Theil–Sen's hypothesis-test sibling (Sen estimates the slope,
  //    MK decides whether a monotone trend exists at all). S, the tie
  //    term, and the variance NUMERATOR are exact BIGINT (the /18 and
  //    sqrt happen once, in double, identically in both engines — the
  //    q_cohens_kappa lesson: never let an integer intermediate differ
  //    from the oracle's). Pair mass is CALENDAR-bounded (≤435 pairs per
  //    key on the 30-day fixture) via the same map-side collect+
  //    posexplode+slice expansion as q_theil_sen — one shuffle to the
  //    daily rollup, zero self-joins.
  private val mannKendall = QueryDef(
    "q_mann_kendall",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("c"))
      val sStat = daily.groupBy("event_type")
        .agg(array_sort(collect_list(struct(col("day"), col("c")))).as("ps"))
        .select(col("event_type"), posexplode(col("ps")).as(Seq("i", "a")),
          col("ps"))
        .select(col("event_type"), col("a"),
          explode(expr("slice(ps, i + 2, size(ps))")).as("b"))
        .groupBy("event_type")
        .agg(sum(when(col("b.c") > col("a.c"), 1L)
          .when(col("b.c") < col("a.c"), -1L).otherwise(0L)).as("s_stat"))
      // tie correction: groups of equal daily values; Σ t(t-1)(2t+5)
      val ties = daily.groupBy("event_type", "c")
        .agg(count(lit(1)).as("t"))
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n_days"),
          sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tie_term"))
      sStat.join(ties, "event_type")
        .withColumn("var_num",
          col("n_days") * (col("n_days") - 1) * (col("n_days") * 2 + 5)
            - col("tie_term"))
        .withColumn("z", when(col("var_num") <= 0, lit(0.0))
          .when(col("s_stat") > 0,
            (col("s_stat") - 1).cast("double")
              / sqrt(col("var_num").cast("double") / 18.0))
          .when(col("s_stat") < 0,
            (col("s_stat") + 1).cast("double")
              / sqrt(col("var_num").cast("double") / 18.0))
          .otherwise(lit(0.0)))
        .select(col("event_type"), col("n_days"), col("s_stat"),
          col("var_num"), dround(col("z"), 6).as("z"))
        .orderBy("event_type")
    },
    Some(s"""
      WITH daily AS (SELECT event_type,
                       epoch_us(ts) // 86400000000 AS day,
                       CAST(sum(CAST(round(value * 100) AS BIGINT))
                         AS BIGINT) AS c
                     FROM events GROUP BY 1, 2),
        sp AS (SELECT x.event_type,
                 CAST(sum(CASE WHEN y.c > x.c THEN 1
                               WHEN y.c < x.c THEN -1 ELSE 0 END)
                   AS BIGINT) AS s_stat
               FROM daily x JOIN daily y
                 ON x.event_type = y.event_type AND x.day < y.day
               GROUP BY 1),
        tie AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                  CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
                FROM (SELECT event_type, c, CAST(count(*) AS BIGINT) AS t
                      FROM daily GROUP BY 1, 2)
                GROUP BY 1),
        j AS (SELECT sp.event_type, tie.n_days, sp.s_stat,
                n_days * (n_days - 1) * (2 * n_days + 5) - tie_term
                  AS var_num
              FROM sp JOIN tie ON sp.event_type = tie.event_type)
      SELECT event_type, n_days, s_stat, CAST(var_num AS BIGINT) AS var_num,
             ${oround("""CASE WHEN var_num <= 0 THEN 0.0
               WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
                 / sqrt(CAST(var_num AS DOUBLE) / 18.0)
               WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
                 / sqrt(CAST(var_num AS DOUBLE) / 18.0)
               ELSE 0.0 END""", 6)} AS z
      FROM j ORDER BY event_type"""))

  override def queries: Seq[QueryDef] =
    Seq(slidingSpend, clickAttribution, saltedSkewJoin,
      cohortRetention, funnelStages, eventTransitions, weeklyRevenueWow,
      skewProfile, ewmaValue, twapValue, intervalCoverage, ohlcBars,
      activityStreaks, seasonalAnomaly, gapFillLocf, rollingMedian,
      burstiness, runningAnomalyFlags, dauWauMau, seasonalityStrength,
      xcorrLagged, conversionTime, cohortLtv, shapleyAttribution,
      newReturning, holtLinear, theilSen, mannKendall)
}
