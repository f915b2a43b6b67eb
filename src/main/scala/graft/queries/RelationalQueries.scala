package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import Det.{dround, oround}

/** Relational parity set — scans, filters, joins, aggregates, windows,
  * sorts, set ops (SURVEY.md §2.1–§2.7) expressed over the TPC-H-ish
  * testdata. Each query names the SURVEY operator(s) it certifies.
  *
  * Scale notes (100 TB design): every query here keeps its filters and
  * projections directly over the parquet scan (pushdown + pruning), joins
  * dimension tables with explicit `broadcast()`, and lets AQE pick shuffle
  * plans for the fact-fact joins. No collect(), no UDFs — everything stays
  * inside whole-stage codegen.
  */
object RelationalQueries extends QueryModule {

  // -- A1/A18/F6: grouped aggregation over the big fact table (TPC-H Q1
  //    shape). Money sums run on the EXACT INTEGER GRID (price/discount
  //    carry 2 decimals → ×100 fits in long): a double accumulation over
  //    millions of rows drifts by more than the 1e-4 rounding grid at a
  //    ~5e10 magnitude (the sf1 sweep caught a last-digit mismatch), and
  //    integer sums are bit-exact under ANY partitioning — the 100 TB
  //    answer (a real warehouse declares DECIMAL; at ~1e12 rows the ×1e4
  //    products need int128/decimal, noted here).
  private val pricingSummary = QueryDef(
    "q_pricing_summary",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("p100", round(col("l_extendedprice") * 100).cast("long"))
        .withColumn("d100", round(col("l_discount") * 100).cast("long"))
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"), // integer-valued: exact
          round(sum("p100").cast("double") / 100.0, 2).as("sum_base_price"),
          round(sum(col("p100") * (lit(100L) - col("d100"))).cast("double")
            / 10000.0, 4).as("sum_disc_price"),
          dround(avg("l_quantity"), 4).as("avg_qty"),
          dround(sum("p100").cast("double") / 100.0 / count(lit(1)), 4).as("avg_price"),
          dround(sum("d100").cast("double") / 100.0 / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some(s"""
      WITH g AS (SELECT l_returnflag, l_linestatus, l_quantity,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS p100,
                   CAST(round(l_discount * 100) AS BIGINT) AS d100
                 FROM lineitem)
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2)       AS sum_qty,
             round(CAST(sum(p100) AS DOUBLE) / 100.0, 2) AS sum_base_price,
             round(CAST(sum(p100 * (100 - d100)) AS DOUBLE) / 10000.0, 4) AS sum_disc_price,
             ${oround("avg(l_quantity)", 4)} AS avg_qty,
             ${oround("CAST(sum(p100) AS DOUBLE) / 100.0 / count(*)", 4)} AS avg_price,
             ${oround("CAST(sum(d100) AS DOUBLE) / 100.0 / count(*)", 6)} AS avg_disc,
             count(*)                        AS count_order
      FROM g
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  // -- P1/P3-style predicate + pushdown filter over the fact table
  private val filteredRevenue = QueryDef(
    "q_filtered_revenue",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") > lit(0.02) && col("l_quantity") < lit(24.0))
        // exact 1e-4 grid: price(2dp)·disc(2dp) is a 1e-4 multiple and the
        // single global group grows with the corpus — a double sum drifts
        // n·ulp and flips round-4 boundaries at decade totals (the
        // q_part_type_revenue sf10 lesson, fixed fleet-wide in r14)
        .agg((sum(round(col("l_extendedprice") * col("l_discount") * lit(1e4))
               .cast("long")).cast("double") / lit(1e4)).as("revenue"),
             count(lit(1)).as("n_rows"))
    },
    Some("""
      SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 1e4)
               AS BIGINT)) AS DOUBLE) / 1e4 AS revenue,
             count(*) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
        AND l_discount > 0.02 AND l_quantity < 24.0"""))

  // -- J1: dim-chain broadcast joins (customer ⟕ nation ⟕ region)
  private val customerGeo = QueryDef(
    "q_customer_geo",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
             round(sum("c_acctbal"), 2).as("sum_acctbal"),
             round(avg("c_acctbal"), 4).as("avg_acctbal"))
        .orderBy("r_name", "n_name")
    },
    Some("""
      SELECT r_name, n_name,
             count(*) AS n_customers,
             round(sum(c_acctbal), 2) AS sum_acctbal,
             round(avg(c_acctbal), 4) AS avg_acctbal
      FROM customer
      LEFT JOIN nation ON c_nationkey = n_nationkey
      LEFT JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name"""))

  // -- J2/O3: fact-fact join + top-k (orders ⋈ lineitem, top revenue)
  private val topRevenueOrders = QueryDef(
    "q_top_revenue_orders",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      li.groupBy("l_orderkey")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
        .join(o, col("l_orderkey") === o("o_orderkey"))
        .select(col("o_orderkey"), col("o_orderpriority"), col("revenue"),
                date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(20)
    },
    Some("""
      SELECT o_orderkey, o_orderpriority,
             round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
             strftime(o_orderdate, '%Y-%m-%d') AS order_date
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderkey, o_orderpriority, o_orderdate
      ORDER BY revenue DESC, o_orderkey ASC
      LIMIT 20"""))

  // -- J-filter: lineitem ⋈ part with LIKE predicate (pushdown through join)
  private val partTypeRevenue = QueryDef(
    "q_part_type_revenue",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir).filter(col("p_type").like("%PROMO%"))
      // no broadcast hint: the LIKE-filtered side GROWS with the data (part
      // is fact-sized, not a dim) — a forced broadcast measured 27.7× on
      // 10× data and at 100× would exceed the broadcast threshold outright.
      // AQE picks broadcast at runtime when the filtered side actually fits.
      // revenue on the EXACT 1e-4 integer grid: price (2 dp) × (1−disc)
      // (2 dp) is a 1e-4 multiple, so round(x·1e4)::long sums are exact
      // and order-free. The double accumulation this replaces drifted
      // ~n·ulp and at sf10 (~1.8e10 totals over millions of rows per
      // brand) crossed a round-4 boundary between the engines
      // (18631170939.25 vs .2499 — the first sf10 full-sweep failure).
      li.join(p, li("l_partkey") === p("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
             (sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
               * lit(1e4)).cast("long")).cast("double") / lit(1e4)).as("revenue"))
        .orderBy("p_brand")
    },
    Some("""
      SELECT p_brand, count(*) AS n_items,
             CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 1e4)
               AS BIGINT)) AS DOUBLE) / 1e4 AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_type LIKE '%PROMO%'
      GROUP BY p_brand
      ORDER BY p_brand"""))

  // -- W1: latest-per-key dedup window (SURVEY W1/W2/W3)
  private val latestEventPerUser = QueryDef(
    "q_latest_event_per_user",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val w = Window.partitionBy("user_id").orderBy(col("ts_us").desc, col("event_id").desc)
      ev.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
                round(col("value"), 2).as("value"), col("ts_us"))
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id, event_id, event_type, round(value, 2) AS value,
             epoch_us(ts) AS ts_us
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1
      ORDER BY user_id"""))

  // -- W3: latest-per-(key, form): last event per (user, type)
  private val latestPerUserType = QueryDef(
    "q_latest_event_per_user_type",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts_us").desc, col("event_id").desc)
      ev.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"), col("ts_us"))
        .orderBy("user_id", "event_type")
    },
    Some("""
      SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1
      ORDER BY user_id, event_type"""))

  // -- W4/A9: top-k within group with total tie order
  private val topEventTypes = QueryDef(
    "q_top3_event_types_per_user",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val counts = ev.groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("user_id").orderBy(col("n").desc, col("event_type").asc)
      counts.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .orderBy("user_id", "rnk")
    },
    Some("""
      SELECT user_id, event_type, n, rnk
      FROM (SELECT user_id, event_type, count(*) AS n,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY count(*) DESC, event_type ASC) AS rnk
            FROM events GROUP BY user_id, event_type)
      WHERE rnk <= 3
      ORDER BY user_id, rnk"""))

  // -- O2: pagination (LIMIT/OFFSET semantics) via BUCKETED TWO-PASS rank —
  // the same trick ScorePipeline uses for percentile. A bare
  // `row_number() OVER (ORDER BY …)` funnels every row through one task;
  // instead: bucket by order date (the leading sort key), aggregate
  // per-bucket counts, cumulative-sum them into global offsets (the only
  // unpartitioned window runs over BUCKET rows, not orders), keep only the
  // buckets intersecting [101,150], then rank within those buckets in
  // parallel — global rn = bucket offset + within-bucket row_number, exact
  // because (o_orderdate DESC, o_orderkey ASC) is a total order. Rows
  // outside the page's buckets never reach a window at all.
  private val ordersPage = QueryDef(
    "q_orders_pagination",
    (s, dir) => {
      val (lo, hi) = (101, 150)
      val o = Tables.orders(s, dir)
      val counts = o.groupBy(col("o_orderdate").as("_d"))
        .agg(count(lit(1)).as("_c"))
      // constant partition key: window over ~#order-dates aggregate rows
      // (bounded); explicit spec silences WindowExec's no-partition
      // warning (pmod(_c,1) ≡ 0, non-foldable so the optimizer keeps it)
      val offsets = counts
        .withColumn("_off", coalesce(
          sum("_c").over(Window.partitionBy(pmod(col("_c"), lit(1)))
            .orderBy(col("_d").desc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .filter(col("_off") < hi && col("_off") + col("_c") >= lo)
        .select(col("_d"), col("_off"))
      val wIn = Window.partitionBy("_d").orderBy(col("o_orderkey").asc)
      o.join(broadcast(offsets), o("o_orderdate") === offsets("_d"))
        .withColumn("rn", (col("_off") + row_number().over(wIn)).cast("int"))
        .filter(col("rn").between(lo, hi))
        .select(col("rn"), col("o_orderkey"),
                round(col("o_totalprice"), 2).as("o_totalprice"),
                date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .orderBy("rn")
    },
    Some("""
      SELECT rn, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
             strftime(o_orderdate, '%Y-%m-%d') AS order_date
      FROM (SELECT *, row_number() OVER (ORDER BY o_orderdate DESC,
                      o_orderkey ASC) AS rn FROM orders)
      WHERE rn BETWEEN 101 AND 150
      ORDER BY rn"""))

  // -- O3 at scale: KEYSET pagination — "the 50 rows after cursor (date,
  //    key)". The predicate prunes at the scan (pushed filters), TakeOrdered
  //    replaces the global window: no row numbering, no single-task funnel,
  //    cost independent of how deep the page is.
  private val ordersKeysetPage = QueryDef(
    "q_orders_keyset_page",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      // cursor = last row of the previous page (fixed here so the oracle
      // can mirror it; a service would thread it through)
      val curDate = "1997-06-30"
      val curKey = 1500L
      o.filter(col("o_orderdate") < lit(curDate).cast("timestamp") ||
          (col("o_orderdate") === lit(curDate).cast("timestamp") &&
            col("o_orderkey") > curKey))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
        .limit(50)
        .select(col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
    },
    Some("""
      SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice,
             strftime(o_orderdate, '%Y-%m-%d') AS order_date
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1997-06-30'
         OR (o_orderdate = TIMESTAMP '1997-06-30' AND o_orderkey > 1500)
      ORDER BY o_orderdate DESC, o_orderkey ASC
      LIMIT 50"""))

  // -- batch twin of streaming/Sessionize: gap-based sessions via the
  //    lag → new-session flag → running-sum pattern (all integer µs
  //    arithmetic — partition-order independent by construction). The
  //    oracle certifies the same session semantics the stateful streaming
  //    operator implements incrementally.
  private val eventSessions = QueryDef(
    "q_event_sessions",
    (s, dir) => {
      val gapUs = 3600L * 1000000L // 1-hour inactivity gap
      val wOrd = Window.partitionBy("user_id")
        .orderBy(col("ts_us").asc, col("event_id").asc)
      val flagged = Tables.events(s, dir)
        .withColumn("prev_us", lag("ts_us", 1).over(wOrd))
        .withColumn("is_new",
          when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("session_seq",
          sum("is_new").over(wOrd.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
      flagged.groupBy("user_id", "session_seq")
        .agg(count(lit(1)).as("n_events"),
          min("ts_us").as("start_us"), max("ts_us").as("end_us"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          max("n_events").as("max_session_events"),
          sum(col("end_us") - col("start_us")).as("total_session_us"))
        .orderBy("user_id")
    },
    Some("""
      WITH flagged AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 3600000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      seqd AS (
        SELECT user_id, ts_us,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged),
      sessions AS (
        SELECT user_id, session_seq, count(*) AS n_events,
               min(ts_us) AS start_us, max(ts_us) AS end_us
        FROM seqd GROUP BY 1, 2)
      SELECT user_id, count(*) AS n_sessions,
             max(n_events) AS max_session_events,
             CAST(sum(end_us - start_us) AS BIGINT) AS total_session_us
      FROM sessions GROUP BY user_id ORDER BY user_id"""))

  // -- CUBE grouping sets with grouping_id (beyond-parity, pairs with the
  //    rollup query)
  private val cubeVolumes = QueryDef(
    "q_cube_volumes",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"),
          count(lit(1)).as("n"),
          round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             GROUPING(l_returnflag, l_linestatus) AS gid,
             count(*) AS n,
             round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  // -- skew-salted two-stage aggregation certified against the plain-SQL
  //    answer: event_type is a 5-value hot-key column (worst-case skew for
  //    a groupBy), so the salted path spreads each hot key over 16
  //    reducers before the tiny re-agg. The oracle computes the PLAIN
  //    group-by — equality proves salting is semantics-preserving.
  private val saltedTypeCounts = QueryDef(
    "q_salted_type_counts",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      // value snaps to its centi-grid as an exact long BEFORE summing —
      // floor(x+0.5) explicitly, because a bare double→long cast truncates
      // in Spark but rounds in DuckDB
      graft.plans.Scale.saltedCount(ev, Seq("event_type"))
        .join(graft.plans.Scale.saltedSum(
          ev.withColumn("v100", floor(col("value") * 100 + 0.5).cast("long")),
          Seq("event_type"), "v100"), "event_type")
        .select(col("event_type"), col("count").as("n"),
          (col("sum_v100").cast("double") / 100).as("sum_value"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100
               AS sum_value
      FROM events GROUP BY event_type ORDER BY event_type"""))

  // -- SCD2 version history (warehouse CDC shape): each (user, type)
  //    change stream becomes validity intervals via lead() — valid_to null
  //    marks the current version. One shuffle on the SCD key; integer-µs
  //    arithmetic end to end.
  private val scd2History = QueryDef(
    "q_scd2_history",
    (s, dir) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts_us").asc, col("event_id").asc)
      Tables.events(s, dir).filter(col("user_id") < 10)
        .select(col("user_id"), col("event_type"), col("event_id"),
          round(col("value"), 2).as("value"), col("ts_us"))
        .withColumn("valid_from_us", col("ts_us"))
        .withColumn("valid_to_us", lead("ts_us", 1).over(w))
        .withColumn("is_current", col("valid_to_us").isNull)
        .select("user_id", "event_type", "event_id", "value",
          "valid_from_us", "valid_to_us", "is_current")
        .orderBy("user_id", "event_type", "valid_from_us", "event_id")
    },
    Some("""
      SELECT user_id, event_type, event_id, round(value, 2) AS value,
             epoch_us(ts) AS valid_from_us,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
               ORDER BY epoch_us(ts), event_id) AS valid_to_us,
             (lead(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
               ORDER BY epoch_us(ts), event_id)) IS NULL AS is_current
      FROM events WHERE user_id < 10
      ORDER BY user_id, event_type, valid_from_us, event_id"""))

  // -- J-coverage: explicit FULL OUTER join with unmatched rows on both
  //    sides (spend-per-customer ⟗ high-balance customers)
  private val fullOuterSpend = QueryDef(
    "q_full_outer_spend",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val spend = o.groupBy(col("o_custkey").as("custkey"))
        .agg(round(sum("o_totalprice"), 2).as("spend"))
      val rich = c.filter(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("custkey"), round(col("c_acctbal"), 2).as("acctbal"))
      spend.join(rich, Seq("custkey"), "full_outer")
        .select(col("custkey"), col("spend"), col("acctbal"),
          col("spend").isNotNull.as("has_orders"),
          col("acctbal").isNotNull.as("is_rich"))
        .orderBy("custkey")
    },
    Some("""
      WITH spend AS (SELECT o_custkey AS custkey,
                       round(sum(o_totalprice), 2) AS spend
                     FROM orders GROUP BY 1),
        rich AS (SELECT c_custkey AS custkey, round(c_acctbal, 2) AS acctbal
                 FROM customer WHERE c_acctbal > 9000)
      SELECT coalesce(s.custkey, r.custkey) AS custkey, s.spend, r.acctbal,
             s.spend IS NOT NULL AS has_orders,
             r.acctbal IS NOT NULL AS is_rich
      FROM spend s FULL OUTER JOIN rich r ON s.custkey = r.custkey
      ORDER BY custkey"""))

  // -- O5: exact median / quantiles (percentile ≡ quantile_cont)
  private val quantiles = QueryDef(
    "q_quantity_quantiles",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.groupBy("l_returnflag")
        .agg(round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
             round(expr("percentile(l_quantity, 0.9)"), 4).as("p90_qty"),
             round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25_price"),
             count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
             round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
             round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
             round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
             count(*) AS n
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  // -- anti-join (S12/U4 dedup-gate shape): customers with no urgent order.
  // This is exactly the content-hash ingest gate: "incoming" rows anti-joined
  // against the "already present" key set.
  private val customersNoOrders = QueryDef(
    "q_customers_without_urgent_orders",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"), min("c_custkey").as("min_key"))
        .orderBy("c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment, count(*) AS n_customers, min(c_custkey) AS min_key
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""))

  // -- semi-join: customers having ≥1 urgent order
  private val urgentCustomers = QueryDef(
    "q_customers_with_urgent_orders",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment, count(*) AS n_customers
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""))

  // -- A2: two-level aggregation (per-key then portfolio mean)
  private val twoLevelAgg = QueryDef(
    "q_orders_per_customer_stats",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val per = o.groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), sum("o_totalprice").as("spend"))
      per.agg(count(lit(1)).as("n_customers_with_orders"),
              round(avg("n_orders"), 4).as("avg_orders_per_customer"),
              round(avg("spend"), 2).as("avg_spend_per_customer"),
              round(max("spend"), 2).as("max_spend"))
    },
    Some("""
      SELECT count(*) AS n_customers_with_orders,
             round(avg(n_orders), 4) AS avg_orders_per_customer,
             round(avg(spend), 2) AS avg_spend_per_customer,
             round(max(spend), 2) AS max_spend
      FROM (SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS spend
            FROM orders GROUP BY o_custkey)"""))

  // -- A5: pivoted per-type counts (SUM(CASE WHEN …)) per user
  private val pivotEventCounts = QueryDef(
    "q_event_type_pivot",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      def n(t: String) = sum(when(col("event_type") === t, 1).otherwise(0)).as(s"n_$t")
      ev.groupBy("user_id")
        .agg(n("click"), n("view"), n("purchase"), n("signup"), n("error"),
             count(lit(1)).as("n_total"))
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id,
             CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
             CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
             CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
             CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
             count(*) AS n_total
      FROM events GROUP BY user_id ORDER BY user_id"""))

  // -- A6/F9: JSON metadata extraction + aggregation
  private val jsonMetaAvg = QueryDef(
    "q_json_meta_avg",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      ev.withColumn("k", get_json_object(col("props"), "$.k").cast("double"))
        .groupBy("event_type")
        .agg(round(avg("k"), 4).as("avg_k"),
             round(sum("k"), 2).as("sum_k"),
             count(col("k")).as("n_with_k"))
        .orderBy("event_type")
    },
    // regexp on the oracle side: avoids a DuckDB JSON-extension dependency;
    // props is flat {"k": <int>} so the two extractions agree.
    Some("""
      SELECT event_type,
             round(avg(k), 4) AS avg_k,
             round(sum(k), 2) AS sum_k,
             count(k) AS n_with_k
      FROM (SELECT event_type,
                   CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS DOUBLE) AS k
            FROM events)
      GROUP BY event_type ORDER BY event_type"""))

  // -- §2.10: tumbling 7-day event-time window (epoch-aligned, as Spark's)
  private val tumblingWindow = QueryDef(
    "q_tumbling_window_7d",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      ev.groupBy(window(col("ts"), "7 days").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(unix_micros(col("w.start")).as("window_start_us"),
                col("event_type"), col("n"), col("sum_value"))
        .orderBy("window_start_us", "event_type")
    },
    Some("""
      SELECT (epoch_us(ts) // 604800000000) * 604800000000 AS window_start_us,
             event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY window_start_us, event_type"""))

  // -- frame window: running revenue per customer ordered by date
  private val runningTotal = QueryDef(
    "q_running_spend_per_customer",
    (s, dir) => {
      val o = Tables.orders(s, dir).filter(col("o_custkey") < 100)
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.select(col("o_custkey"), col("o_orderkey"),
               round(sum("o_totalprice").over(w), 2).as("running_spend"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey,
             round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_spend
      FROM orders
      WHERE o_custkey < 100
      ORDER BY o_custkey, o_orderkey"""))

  // -- ratio-to-report window: each nation's revenue as a share of its
  //    region's total, plus its in-region revenue rank. The window runs
  //    AFTER the group-by — it partitions |nations| aggregated rows, never
  //    the order facts, so the plan is a fact-side hash aggregate (map-side
  //    combined) + two broadcast dim joins + a 25-row window: the share
  //    step costs nothing more at 100 TB than it does here. Revenue is
  //    summed on the integer-cent grid (order-free long addition, identical
  //    in both engines) so the ratio is bit-deterministic.
  private val nationRevenueShare = QueryDef(
    "q_nation_revenue_share",
    (s, dir) => {
      val rev = Tables.orders(s, dir)
        .join(Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val part = Window.partitionBy("r_name")
      rev.select(col("r_name"), col("n_name"),
          dround(col("cents") / 100.0, 2).as("rev"),
          dround(col("cents").cast("double")
            / sum("cents").over(part) * 100, 4).as("share_pct"),
          rank().over(part.orderBy(col("cents").desc, col("n_name").asc))
            .cast("long").as("rnk"))
        .orderBy("r_name", "n_name")
    },
    Some(s"""
      WITH rev AS (
        SELECT r_name, n_name,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name)
      SELECT r_name, n_name,
             ${oround("cents / 100.0", 2)} AS rev,
             ${oround(
               "CAST(cents AS DOUBLE) / sum(cents) OVER (PARTITION BY r_name) * 100",
               4)} AS share_pct,
             CAST(rank() OVER (PARTITION BY r_name
                    ORDER BY cents DESC, n_name ASC) AS BIGINT) AS rnk
      FROM rev
      ORDER BY r_name, n_name"""))

  // -- lag: days between consecutive orders per customer
  private val orderGaps = QueryDef(
    "q_order_gaps",
    (s, dir) => {
      val o = Tables.orders(s, dir).filter(col("o_custkey") < 200)
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      o.withColumn("prev_date", lag("o_orderdate", 1).over(w))
        .filter(col("prev_date").isNotNull)
        .select(col("o_custkey"), col("o_orderkey"),
                datediff(col("o_orderdate"), col("prev_date")).as("gap_days"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey,
             date_diff('day', prev_date, o_orderdate) AS gap_days
      FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                   lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_date
            FROM orders WHERE o_custkey < 200)
      WHERE prev_date IS NOT NULL
      ORDER BY o_custkey, o_orderkey"""))

  // -- U1: union of heterogeneous sources into a common evidence schema
  private val unionEvidence = QueryDef(
    "q_union_evidence",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(lit("document").as("origin"),
                col("doc_id").cast("long").as("item_id"),
                col("text"), col("source"))
      val ev = Tables.events(s, dir)
        .select(lit("event").as("origin"),
                col("event_id").cast("long").as("item_id"),
                col("props").as("text"), col("event_type").as("source"))
      docs.unionByName(ev)
        .withColumn("content_hash", sha2(col("text"), 256))
        .groupBy("origin")
        .agg(count(lit(1)).as("n_items"),
             countDistinct("content_hash").as("n_distinct"),
             countDistinct("source").as("n_sources"))
        .orderBy("origin")
    },
    Some("""
      WITH unioned AS (
        SELECT 'document' AS origin, doc_id AS item_id, text, source
        FROM documents
        UNION ALL
        SELECT 'event' AS origin, event_id AS item_id, props AS text,
               event_type AS source
        FROM events)
      SELECT origin, count(*) AS n_items,
             count(DISTINCT sha256(text)) AS n_distinct,
             count(DISTINCT source) AS n_sources
      FROM unioned GROUP BY origin ORDER BY origin"""))

  // -- intersect / except set ops
  private val setOps = QueryDef(
    "q_set_ops",
    (s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_custkey").as("k")).distinct()
      val rich = Tables.customer(s, dir).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("k"))
      val both = o.intersect(rich).withColumn("op", lit("intersect"))
      val onlyRich = rich.except(o).withColumn("op", lit("except"))
      both.unionByName(onlyRich)
        .groupBy("op").agg(count(lit(1)).as("n"), min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("op")
    },
    Some("""
      WITH o AS (SELECT DISTINCT o_custkey AS k FROM orders),
           rich AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000),
           u AS (
             SELECT 'intersect' AS op, k FROM (SELECT k FROM o INTERSECT SELECT k FROM rich)
             UNION ALL
             SELECT 'except' AS op, k FROM (SELECT k FROM rich EXCEPT SELECT k FROM o))
      SELECT op, count(*) AS n, min(k) AS min_k, max(k) AS max_k
      FROM u GROUP BY op ORDER BY op"""))

  // -- F8/F18: banding cascade + normalization (score→label semantics)
  private val acctbalBands = QueryDef(
    "q_acctbal_bands",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val band = when(col("c_acctbal") <= 0, "negative")
        .when(col("c_acctbal") <= 2000, "low")
        .when(col("c_acctbal") <= 6000, "mid")
        .otherwise("high")
      c.withColumn("band", band)
        .withColumn("seg", upper(trim(col("c_mktsegment"))))
        .groupBy("band", "seg")
        .agg(count(lit(1)).as("n"), round(avg("c_acctbal"), 4).as("avg_bal"))
        .orderBy("band", "seg")
    },
    Some("""
      SELECT CASE WHEN c_acctbal <= 0 THEN 'negative'
                  WHEN c_acctbal <= 2000 THEN 'low'
                  WHEN c_acctbal <= 6000 THEN 'mid'
                  ELSE 'high' END AS band,
             upper(trim(c_mktsegment)) AS seg,
             count(*) AS n, round(avg(c_acctbal), 4) AS avg_bal
      FROM customer
      GROUP BY 1, 2 ORDER BY band, seg"""))

  // -- grouping sets beyond parity: rollup supplier → nation
  private val rollupSuppliers = QueryDef(
    "q_supplier_rollup",
    (s, dir) => {
      val sup = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      sup.join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .rollup(col("n_name"))
        // supplier count per nation grows with the corpus → exact cent
        // grid (the q_part_type_revenue sf10 lesson)
        .agg(count(lit(1)).as("n_suppliers"),
          (sum(round(col("s_acctbal") * 100).cast("long")).cast("double")
            / 100.0).as("sum_bal"))
        .withColumn("n_name", coalesce(col("n_name"), lit("ALL")))
        .orderBy("n_name")
    },
    Some("""
      SELECT coalesce(n_name, 'ALL') AS n_name,
             count(*) AS n_suppliers,
             CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_bal
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      GROUP BY ROLLUP (n_name)
      ORDER BY n_name"""))

  // -- A: GROUPING SETS — the general form of rollup/cube: exactly the
  //    requested group-bys ((priority), (status), ()) computed in ONE pass
  //    over the fact table (Catalyst expands to a single Expand + aggregate,
  //    not three scans). Disambiguation by the rollup sentinel convention:
  //    a set's absent keys read 'ALL'.
  private val groupingSetsAgg = QueryDef(
    "q_grouping_sets",
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      o.groupingSets(
          Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")), Seq()),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          (sum("cents").cast("double") / 100.0).as("sum_price"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n_orders"), col("sum_price"))
        .orderBy("priority", "status")
    },
    Some("""
      SELECT coalesce(o_orderpriority, 'ALL') AS priority,
             coalesce(o_orderstatus, 'ALL') AS status,
             count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price
      FROM orders
      GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
      ORDER BY priority, status"""))

  // -- 3-way fact join + filtered agg + top-k (TPC-H Q3 shipping-priority
  //    shape): two shuffle joins the optimizer must order well
  private val shippingPriority = QueryDef(
    "q_shipping_priority",
    (s, dir) => {
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit("1997-06-15").cast("timestamp"))
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit("1997-06-15").cast("timestamp"))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(li, o("o_orderkey") === li("l_orderkey"))
        .groupBy(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_orderpriority"))
        .agg(Det.dround(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    },
    Some(s"""
      SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
             o_orderpriority,
             ${Det.oround("sum(l_extendedprice * (1.0 - l_discount))", 4)} AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-06-15'
        AND l_shipdate > TIMESTAMP '1997-06-15'
      GROUP BY o_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, o_orderkey ASC
      LIMIT 10"""))

  // -- 5-way dim-chain + fact join (TPC-H Q5 local-supplier-volume shape):
  //    broadcasts for every dim, one fact-fact shuffle join
  private val regionVolume = QueryDef(
    "q_region_supplier_volume",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = Tables.lineitem(s, dir)
      val sup = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(li, o("o_orderkey") === li("l_orderkey"))
        .join(sup, li("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        // per-nation groups grow with the corpus → exact 1e-4 grid (the
        // q_part_type_revenue sf10 lesson)
        .agg((sum(round((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            * lit(1e4)).cast("long")).cast("double") / lit(1e4)).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some(s"""
      SELECT r_name, n_name,
             CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 1e4)
               AS BIGINT)) AS DOUBLE) / 1e4 AS revenue,
             count(*) AS n_items
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON o_orderkey = l_orderkey
                    JOIN supplier ON l_suppkey = s_suppkey
                                 AND c_nationkey = s_nationkey
                    JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name"""))

  // -- as-of join (beyond parity; brief §custom operators): for each
  //    purchase, the latest click by the same user at-or-before it.
  //    Single-shuffle union+window implementation (graft.operators.AsOfJoin)
  //    — no range-join explosion on hot users.
  private val asofJoin = QueryDef(
    "q_asof_join",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts_us").as("click_ts"), col("value").as("click_value"))
      graft.operators.AsOfJoin.asOf(purchases, clicks, "user_id",
          "ts_us", "click_ts", Seq("click_id", "click_value"), "click_id")
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("asof_click_id"),
          graft.queries.Det.dround(col("asof_click_value"), 2).as("asof_click_value"))
        .orderBy("user_id", "event_id")
    },
    Some(s"""
      WITH r AS (SELECT user_id, epoch_us(ts) AS ts_us, 0 AS side,
                   event_id AS tie, event_id AS v_id, value AS v_val,
                   NULL::BIGINT AS l_event_id
                 FROM events WHERE event_type = 'click'),
        l AS (SELECT user_id, epoch_us(ts) AS ts_us, 1 AS side,
                9223372036854775807 AS tie, NULL::BIGINT AS v_id,
                NULL::DOUBLE AS v_val, event_id AS l_event_id
              FROM events WHERE event_type = 'purchase'),
        u AS (SELECT * FROM r UNION ALL SELECT * FROM l),
        filled AS (SELECT *,
                 last_value(v_id IGNORE NULLS) OVER w AS asof_click_id,
                 last_value(v_val IGNORE NULLS) OVER w AS asof_val
               FROM u
               WINDOW w AS (PARTITION BY user_id
                 ORDER BY ts_us ASC, side ASC, tie ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT user_id, l_event_id AS event_id, ts_us, asof_click_id,
             ${Det.oround("asof_val", 2)} AS asof_click_value
      FROM filled WHERE side = 1
      ORDER BY user_id, event_id"""))

  // -- the SAME as-of semantics through the native tier-(c) operator
  //    (org.apache.spark.sql.graft.AsOfJoinExec: custom LogicalPlan +
  //    SparkStrategy + sort-merge SparkPlan with O(1) merge state — one
  //    buffered candidate right row — instead of the composition's
  //    unioned window frame). Certified by the identical oracle as
  //    q_asof_join: the hash gate proves the physical operator computes
  //    the window composition's exact row set.
  private val asofNative = QueryDef(
    "q_asof_native",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts_us").as("click_ts"), col("value").as("click_value"))
      org.apache.spark.sql.graft.AsOfJoinNative.asOf(
          purchases, clicks, "user_id", "ts_us", "click_ts", "click_id")
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("click_id").as("asof_click_id"),
          graft.queries.Det.dround(col("click_value"), 2).as("asof_click_value"))
        .orderBy("user_id", "event_id")
    },
    Some(s"""
      WITH r AS (SELECT user_id, epoch_us(ts) AS ts_us, 0 AS side,
                   event_id AS tie, event_id AS v_id, value AS v_val,
                   NULL::BIGINT AS l_event_id
                 FROM events WHERE event_type = 'click'),
        l AS (SELECT user_id, epoch_us(ts) AS ts_us, 1 AS side,
                9223372036854775807 AS tie, NULL::BIGINT AS v_id,
                NULL::DOUBLE AS v_val, event_id AS l_event_id
              FROM events WHERE event_type = 'purchase'),
        u AS (SELECT * FROM r UNION ALL SELECT * FROM l),
        filled AS (SELECT *,
                 last_value(v_id IGNORE NULLS) OVER w AS asof_click_id,
                 last_value(v_val IGNORE NULLS) OVER w AS asof_val
               FROM u
               WINDOW w AS (PARTITION BY user_id
                 ORDER BY ts_us ASC, side ASC, tie ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT user_id, l_event_id AS event_id, ts_us, asof_click_id,
             ${Det.oround("asof_val", 2)} AS asof_click_value
      FROM filled WHERE side = 1
      ORDER BY user_id, event_id"""))

  // -- as-of join with a STALENESS BOUND (kdb wj / pandas merge_asof
  //    tolerance semantics): the latest preceding click only counts when
  //    it is at most 3 days old — the youngest preceding row is the only
  //    candidate that can be fresh, so null-after-fill IS the tolerance
  //    semantics, at the same single-shuffle linear shape as q_asof_join.
  private val AsofTolUs = 3L * 24 * 3600 * 1000000
  private val asofTolerance = QueryDef(
    "q_asof_tolerance",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts_us").as("click_ts"), col("value").as("click_value"))
      graft.operators.AsOfJoin.asOfTolerance(purchases, clicks, "user_id",
          "ts_us", "click_ts", Seq("click_id", "click_value"), "click_id",
          AsofTolUs)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("asof_click_id"),
          graft.queries.Det.dround(col("asof_click_value"), 2).as("asof_click_value"),
          col("asof_age_us"))
        .orderBy("user_id", "event_id")
    },
    Some(s"""
      WITH r AS (SELECT user_id, epoch_us(ts) AS ts_us, 0 AS side,
                   event_id AS tie, epoch_us(ts) AS v_ts, event_id AS v_id,
                   value AS v_val, NULL::BIGINT AS l_event_id
                 FROM events WHERE event_type = 'click'),
        l AS (SELECT user_id, epoch_us(ts) AS ts_us, 1 AS side,
                9223372036854775807 AS tie, NULL::BIGINT AS v_ts,
                NULL::BIGINT AS v_id, NULL::DOUBLE AS v_val,
                event_id AS l_event_id
              FROM events WHERE event_type = 'purchase'),
        u AS (SELECT * FROM r UNION ALL SELECT * FROM l),
        filled AS (SELECT *,
                 last_value(v_ts IGNORE NULLS) OVER w AS m_ts,
                 last_value(v_id IGNORE NULLS) OVER w AS m_id,
                 last_value(v_val IGNORE NULLS) OVER w AS m_val
               FROM u
               WINDOW w AS (PARTITION BY user_id
                 ORDER BY ts_us ASC, side ASC, tie ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        gated AS (SELECT user_id, l_event_id AS event_id, ts_us,
                    CASE WHEN m_ts IS NOT NULL AND ts_us - m_ts <= $AsofTolUs
                         THEN m_id END AS asof_click_id,
                    CASE WHEN m_ts IS NOT NULL AND ts_us - m_ts <= $AsofTolUs
                         THEN m_val END AS asof_val,
                    CASE WHEN m_ts IS NOT NULL AND ts_us - m_ts <= $AsofTolUs
                         THEN ts_us - m_ts END AS asof_age_us
                  FROM filled WHERE side = 1)
      SELECT user_id, event_id, ts_us, asof_click_id,
             ${Det.oround("asof_val", 2)} AS asof_click_value,
             CAST(asof_age_us AS BIGINT) AS asof_age_us
      FROM gated ORDER BY user_id, event_id"""))

  // -- incremental aggregate maintenance (materialized-view refresh): a
  //    per-user aggregate STATE table (n, sum, min, max — all mergeable)
  //    folded batch-by-batch via full-outer merge of partial aggregates,
  //    instead of re-aggregating history. This is the warehouse rollup-
  //    maintenance pattern: each refresh aggregates ONLY the new batch
  //    (map-side combined) and merges O(|keys|) state rows; avg derives
  //    from (sum, n) at read time — never stored, since averages don't
  //    merge. The oracle certifies the invariant that justifies the whole
  //    pattern: folded state ≡ direct aggregation over all the data.
  private val incrementalAgg = QueryDef(
    "q_incremental_agg",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("user_id").agg(count(lit(1)).as("n"),
          sum("c").as("sum_c"), min("c").as("min_c"), max("c").as("max_c"))
      def mergeState(state: org.apache.spark.sql.DataFrame,
          batch: org.apache.spark.sql.DataFrame) =
        state.as("s").join(batch.as("b"), Seq("user_id"), "full_outer")
          .select(col("user_id"),
            (coalesce(col("s.n"), lit(0L)) + coalesce(col("b.n"), lit(0L))).as("n"),
            (coalesce(col("s.sum_c"), lit(0L)) + coalesce(col("b.sum_c"), lit(0L))).as("sum_c"),
            least(coalesce(col("s.min_c"), col("b.min_c")),
              coalesce(col("b.min_c"), col("s.min_c"))).as("min_c"),
            greatest(coalesce(col("s.max_c"), col("b.max_c")),
              coalesce(col("b.max_c"), col("s.max_c"))).as("max_c"))
      // three refresh cycles over disjoint batch slices
      val state = (0 until 3).map(i => partial(ev.filter(col("event_id") % 3 === i)))
        .reduce(mergeState)
      state.select(col("user_id"), col("n"),
          (col("sum_c") / 100.0).as("sum_value"),
          (col("min_c") / 100.0).as("min_value"),
          (col("max_c") / 100.0).as("max_value"),
          dround(col("sum_c").cast("double") / col("n") / 100.0, 4).as("avg_value"))
        .orderBy("user_id")
    },
    Some(s"""
      SELECT user_id, count(*) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value,
             min(CAST(round(value * 100) AS BIGINT)) / 100.0 AS min_value,
             max(CAST(round(value * 100) AS BIGINT)) / 100.0 AS max_value,
             ${Det.oround("CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / count(*) / 100.0", 4)} AS avg_value
      FROM events GROUP BY user_id ORDER BY user_id"""))

  // -- range (band) join (beyond parity): events bucketed into value bands
  //    via the bucketized equi-join (graft.operators.RangeJoin) instead of
  //    a nested-loop theta join
  private val rangeJoin = QueryDef(
    "q_range_join_banded",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir).select(col("event_id"), col("value"))
      val bands = (0 until 10).map(i => (s"band_$i", i * 50.0, i * 50.0 + 49.999))
        .toDF("band", "lo", "hi")
      graft.operators.RangeJoin.banded(ev, broadcast(bands), "value", "lo", "hi", 50.0)
        .groupBy("band")
        .agg(count(lit(1)).as("n_events"),
          Det.dround(avg("value"), 4).as("avg_value"),
          Det.dround(min("value"), 2).as("min_value"),
          Det.dround(max("value"), 2).as("max_value"))
        .orderBy("band")
    },
    Some {
      val bandRows = (0 until 10)
        .map(i => s"('band_$i', ${i * 50.0}, ${i * 50.0 + 49.999})").mkString(", ")
      s"""
      WITH bands(band, lo, hi) AS (VALUES $bandRows)
      SELECT band, count(*) AS n_events,
             ${Det.oround("avg(value)", 4)} AS avg_value,
             ${Det.oround("min(value)", 2)} AS min_value,
             ${Det.oround("max(value)", 2)} AS max_value
      FROM events JOIN bands ON value >= lo AND value <= hi
      GROUP BY band ORDER BY band"""
    })

  // -- market-basket association rules (Agrawal & Srikant 1994's
  //    support/confidence plus lift) over order baskets: items = distinct
  //    parts per urgent order, pairs ranked by lift = P(ab)/(P(a)·P(b)).
  //    The co-occurrence analytics class the reference's synergy-rule join
  //    (J6) hand-codes for one rule table, generalized to mining the rules
  //    from the data itself.
  //
  //    Scale shape (the q_triangle_count discipline): pair generation is
  //    per-basket — an order holds ≤7 lineitems, so candidates are LINEAR
  //    in orders (≤21 pairs each), never an item×item product; supports
  //    are map-side-combined counts; the final ranking is a top-10
  //    TakeOrderedAndProject, never a full sort. Lift's numerator and
  //    denominator stay exact longs until ONE division per surviving
  //    pair.
  private val marketBasket = QueryDef(
    "q_market_basket",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      Cached.withPinned(li) { case Seq(li) => // r15: pin + plan-truncate
        val nB = li.select("ok").distinct().count()
        val item = li.groupBy(col("pk")).agg(count(lit(1)).as("supp_i"))
        // map-side per-order pair expansion (GraphQueries.orderedCoPairs
        // discipline, multiplicity preserved): one base shuffle instead
        // of self-joining both copies of the pinned frame
        val pair = li.groupBy("ok")
          .agg(sort_array(collect_set(col("pk"))).as("ps"))
          .filter(size(col("ps")) >= 2)
          .select(posexplode(col("ps")).as(Seq("i", "a")), col("ps"))
          .select(col("a").as("p_a"),
            explode(expr("slice(ps, i + 2, size(ps))")).as("p_b"))
          .groupBy("p_a", "p_b")
          .agg(count(lit(1)).as("supp_ab"))
        pair
          .join(item.select(col("pk").as("p_a"), col("supp_i").as("supp_a")), "p_a")
          .join(item.select(col("pk").as("p_b"), col("supp_i").as("supp_b")), "p_b")
          .withColumn("confidence",
            col("supp_ab").cast("double") / col("supp_a"))
          .withColumn("lift",
            (col("supp_ab") * lit(nB)).cast("double")
              / (col("supp_a") * col("supp_b")).cast("double"))
          .orderBy(col("lift").desc, col("supp_ab").desc,
            col("p_a").asc, col("p_b").asc)
          .limit(10)
          .select(col("p_a"), col("p_b"), col("supp_ab"), col("supp_a"),
            col("supp_b"), Det.dround(col("confidence"), 4).as("confidence"),
            Det.dround(col("lift"), 4).as("lift"))
      }
    },
    Some(s"""
      WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  WHERE o_orderpriority = '1-URGENT'),
        nb AS (SELECT count(DISTINCT ok) AS n FROM li),
        item AS MATERIALIZED (SELECT pk, count(*) AS supp_i FROM li GROUP BY pk),
        pair AS MATERIALIZED (SELECT x.pk AS p_a, y.pk AS p_b, count(*) AS supp_ab
                 FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
                 GROUP BY 1, 2)
      SELECT p_a, p_b, supp_ab, a.supp_i AS supp_a, b.supp_i AS supp_b,
             ${Det.oround("CAST(supp_ab AS DOUBLE) / a.supp_i", 4)}
               AS confidence,
             ${Det.oround(
               "CAST(supp_ab * nb.n AS DOUBLE) / CAST(a.supp_i * b.supp_i AS DOUBLE)",
               4)} AS lift
      FROM pair
      JOIN item a ON pair.p_a = a.pk
      JOIN item b ON pair.p_b = b.pk
      CROSS JOIN nb
      ORDER BY CAST(supp_ab * nb.n AS DOUBLE)
                 / CAST(a.supp_i * b.supp_i AS DOUBLE) DESC,
               supp_ab DESC, p_a ASC, p_b ASC
      LIMIT 10"""))

  // -- 2-D skyline (Pareto frontier): parts no other part dominates on
  //    (cheaper price, larger size). The classic preference-query
  //    operator, computed WITHOUT the naive all-pairs dominance join: for
  //    two dimensions, a part is on the frontier iff it has the max size
  //    at its exact price AND beats the running max size over all
  //    strictly cheaper prices. That running max runs on the per-distinct-
  //    price frame (grid-bounded) with the GridCum two-pass shape: coarse
  //    price buckets get an exclusive cummax over the audited pmod window
  //    (bucket-count rows), then a per-bucket window finishes. Equal
  //    (price, size) twins don't dominate each other — strictness is in
  //    one dimension — so ties all survive, which the oracle replays.
  private val skylineParts = QueryDef(
    "q_skyline_parts",
    (s, dir) => {
      val p = Tables.part(s, dir)
        .withColumn("cents", expr("CAST(round(p_retailprice * 100) AS BIGINT)"))
      Cached.withPinned(p) { case Seq(p) => // r15: pin + plan-truncate
        val h = p.groupBy("cents").agg(max("p_size").as("msize"))
          .withColumn("b", expr("cents div 8192"))
        val bmax = h.groupBy("b").agg(max("msize").as("bm"))
        val wB = org.apache.spark.sql.expressions.Window
          .partitionBy(pmod(col("b"), lit(1L))).orderBy("b")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val off = bmax.withColumn("obm", coalesce(max("bm").over(wB), lit(-1)))
          .select("b", "obm")
        val wIn = org.apache.spark.sql.expressions.Window
          .partitionBy("b").orderBy("cents")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val m1 = h.join(broadcast(off), "b")
          .withColumn("m1", greatest(col("obm"),
            coalesce(max("msize").over(wIn), lit(-1))))
          .select("cents", "msize", "m1")
        p.join(broadcast(m1), "cents")
          .filter(col("p_size") === col("msize") && col("p_size") > col("m1"))
          .select(col("p_partkey"), dround(col("cents") / 100.0, 2).as("price"),
            col("p_size"))
          .orderBy("price", "p_partkey")
      }
    },
    Some(s"""
      WITH p AS (SELECT p_partkey, p_size,
                   CAST(round(p_retailprice * 100) AS BIGINT) AS cents
                 FROM part),
        h AS (SELECT cents, max(p_size) AS msize FROM p GROUP BY cents),
        c AS (SELECT cents, msize,
                coalesce(max(msize) OVER (ORDER BY cents
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  AS m1
              FROM h)
      SELECT p.p_partkey, ${oround("p.cents / 100.0", 2)} AS price, p.p_size
      FROM p JOIN c ON p.cents = c.cents
      WHERE p.p_size = c.msize AND p.p_size > c.m1
      ORDER BY price, p_partkey"""))

  // -- pivot → unpivot round trip (wide/long reshaping): order counts
  //    spread to one column per order status, then MELTED back to long
  //    form with Dataset.unpivot — the Spark-native melt operator the
  //    reference's pandas `.melt` users reach for. The unpivot side is
  //    pure metadata reshaping (an Expand node, no shuffle); absent
  //    (priority, status) cells surface as the nulls the pivot created
  //    and are zero-filled, so the round trip certifies the FULL grid,
  //    matching the oracle's cross-join skeleton.
  private val unpivotMelt = QueryDef(
    "q_unpivot_melt",
    (s, dir) => {
      val wide = Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
      wide.unpivot(Array(col("o_orderpriority")),
          Array(col("F"), col("O"), col("P")), "status", "n")
        .select(col("o_orderpriority"), col("status"),
          coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("o_orderpriority", "status")
    },
    Some("""
      WITH g AS (SELECT DISTINCT o_orderpriority FROM orders),
        s(status) AS (VALUES ('F'), ('O'), ('P')),
        c AS (SELECT o_orderpriority, o_orderstatus AS status,
                CAST(count(*) AS BIGINT) AS n
              FROM orders GROUP BY 1, 2)
      SELECT g.o_orderpriority, s.status,
             CAST(coalesce(c.n, 0) AS BIGINT) AS n
      FROM g CROSS JOIN s
      LEFT JOIN c ON c.o_orderpriority = g.o_orderpriority
                 AND c.status = s.status
      ORDER BY 1, 2"""))

  override def queries: Seq[QueryDef] = Seq(
    marketBasket,
    pricingSummary, filteredRevenue, customerGeo, topRevenueOrders,
    partTypeRevenue, latestEventPerUser, latestPerUserType, topEventTypes,
    ordersPage, ordersKeysetPage, eventSessions, cubeVolumes, saltedTypeCounts,
    scd2History, fullOuterSpend, quantiles,
    customersNoOrders, urgentCustomers, twoLevelAgg,
    pivotEventCounts, jsonMetaAvg, tumblingWindow, runningTotal,
    nationRevenueShare, orderGaps,
    unionEvidence, setOps, acctbalBands, rollupSuppliers, groupingSetsAgg,
    shippingPriority, regionVolume, asofJoin, asofNative, asofTolerance, rangeJoin,
    incrementalAgg, unpivotMelt, skylineParts)
}
