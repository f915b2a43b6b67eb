package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** TPC-H-shape correlated-subquery decorrelations (beyond-parity general
  * SQL semantics, SURVEY.md §2.3/§2.4 join+agg families at scale).
  *
  * The reference's warehouse queries are simple star joins; a user moving
  * real analytics onto this engine immediately writes the classic
  * correlated shapes (EXISTS / NOT EXISTS / scalar subquery per group).
  * Each query here is the SET-BASED decorrelation — semi/anti joins and
  * pre-aggregated subquery sides — while the DuckDB oracle runs the
  * textbook CORRELATED formulation, so the hash gate proves the rewrite
  * is semantics-preserving on real data.
  *
  * Scale posture: every decorrelated side is an aggregate (per-order
  * supplier census, per-part mean, one global scalar) — map-side
  * combinable, joined on the group key, broadcast where provably small
  * (the 1-row scalar). No per-row re-execution of a subquery anywhere,
  * which is exactly why the set-based form survives 100 TB and the
  * row-at-a-time form does not.
  *
  * Determinism: money/quantity comparisons run on the exact cents grid
  * with cross-multiplied integer inequalities (q < 0.2·avg becomes
  * 5·qc·n < sum_qc), so no engine ever divides before comparing.
  *
  * Columns differ from stock TPC-H where the driver schema lacks them
  * (no l_commitdate/l_receiptdate/c_phone/o_comment): lateness is
  * l_shipdate > o_orderdate + 60/45 days, Q13's comment filter becomes an
  * o_orderpriority filter, Q22's country code becomes c_mktsegment. The
  * join/subquery STRUCTURE — what these certify — is unchanged.
  */
object TpchQueries extends QueryModule {

  // -- Q4 shape: EXISTS decorrelated to a left-semi join whose condition
  //    mixes the equi key with an inequality on both sides' columns.
  //    Late = shipped more than 60 days after the order date.
  private val q4 = QueryDef(
    "q_tpch_q4_late_exists",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
      o.join(l, l("l_orderkey") === o("o_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("late_orders"))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS late_orders
      FROM orders o
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  // -- Q13 shape: left outer join + two-level aggregation (orders per
  //    customer, then customers per order-count). The outer join keeps
  //    zero-order customers — the distribution's head — which an inner
  //    join silently drops.
  private val q13 = QueryDef(
    "q_tpch_q13_custdist",
    (s, dir) => {
      val c = Tables.customer(s, dir).select("c_custkey")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_custkey", "o_orderkey")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""
      SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      FROM (SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
            FROM customer c
            LEFT OUTER JOIN orders o
              ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey)
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC"""))

  // -- Q17 shape: per-group scalar subquery (avg quantity per part)
  //    decorrelated to ONE aggregate over the probe side itself, joined
  //    back on the group key. The small-quantity test runs as the exact
  //    integer cross-multiplication 5·qc·n_part < sum_qc — no division,
  //    no float compare, bit-identical cross-engine.
  private val q17 = QueryDef(
    "q_tpch_q17_small_qty",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_orderkey"),
          expr("CAST(round(l_quantity * 100) AS BIGINT)").as("qc"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("pc"))
      Cached.withCached(li) {
        val perPart = li.groupBy("l_partkey")
          .agg(sum("qc").as("sum_qc"), count(lit(1)).as("n_part"))
        val brand = Tables.part(s, dir)
          .filter(col("p_brand") === "Brand#7")
          .select("p_partkey")
        li.join(broadcast(brand), col("l_partkey") === col("p_partkey"))
          .join(perPart, "l_partkey")
          .filter(col("qc") * col("n_part") * lit(5L) < col("sum_qc"))
          .agg(sum("pc").as("small_qty_cents"),
            count(lit(1)).as("n_lines"))
          .select(coalesce(col("small_qty_cents"), lit(0L)).as("small_qty_cents"),
            col("n_lines"))
      }
    },
    Some("""
      SELECT CAST(coalesce(sum(cents.pc), 0) AS BIGINT) AS small_qty_cents,
             CAST(count(*) AS BIGINT) AS n_lines
      FROM (SELECT l_partkey, CAST(round(l_quantity * 100) AS BIGINT) AS qc,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
            FROM lineitem) cents
      JOIN part p ON p.p_partkey = cents.l_partkey AND p.p_brand = 'Brand#7'
      WHERE cents.qc * 5 * (SELECT count(*) FROM lineitem l2
                            WHERE l2.l_partkey = cents.l_partkey)
            < (SELECT CAST(sum(round(l_quantity * 100)) AS BIGINT)
               FROM lineitem l3 WHERE l3.l_partkey = cents.l_partkey)"""))

  // -- Q21 shape: EXISTS + NOT EXISTS over the SAME fact (other supplier
  //    in the order / other LATE supplier in the order), decorrelated to
  //    one per-order supplier census: a late supplier qualifies iff the
  //    order has ≥2 distinct suppliers and exactly 1 late one (itself).
  //    One aggregation pass replaces two correlated self-joins of the
  //    largest table — the difference between O(|lineitem|) and a
  //    fact×fact blowup at 100 TB.
  private val q21 = QueryDef(
    "q_tpch_q21_waiting_supplier",
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      val l = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
      val flagged = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .withColumn("is_late",
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 45 DAYS"))
            .cast("int"))
      Cached.withCached(flagged) {
        val census = flagged.groupBy("l_orderkey")
          .agg(countDistinct("l_suppkey").as("n_supp"),
            countDistinct(when(col("is_late") === 1, col("l_suppkey")))
              .as("n_late_supp"))
        val lateLines = flagged.filter(col("is_late") === 1)
          .select("l_orderkey", "l_suppkey").distinct()
        val sup = Tables.supplier(s, dir).select("s_suppkey", "s_name")
        // pre-reduce per suppkey (map-side-combinable) BEFORE the name
        // join, then re-aggregate by s_name: supplier names are not
        // unique per key in the scaled data (key-shifted replicas share
        // the name), and Q21's output contract is per-NAME
        lateLines
          .join(census.filter(col("n_supp") >= 2 && col("n_late_supp") === 1),
            "l_orderkey")
          .groupBy("l_suppkey")
          .agg(count(lit(1)).as("nw_key"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_name")
          .agg(sum("nw_key").as("numwait"))
          .orderBy(col("numwait").desc, col("s_name").asc)
          .limit(20)
      }
    },
    Some("""
      SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
      FROM supplier s
      JOIN (SELECT DISTINCT l.l_orderkey, l.l_suppkey
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
                         AND o.o_orderstatus = 'F'
            WHERE l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY) l1
        ON l1.l_suppkey = s.s_suppkey
      WHERE EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 45 DAY)
      GROUP BY s.s_name
      ORDER BY numwait DESC, s_name ASC
      LIMIT 20"""))

  // -- Q22 shape: scalar subquery (global avg positive balance) + NOT
  //    EXISTS (no RECENT orders — time-bounded because at these SFs every
  //    customer has some order, and an empty result would certify
  //    nothing), decorrelated to a broadcast 1-row aggregate + left-anti
  //    join. The balance test cross-multiplies on the cents grid:
  //    cc·n_pos > sum_cc ⟺ acctbal > avg(positive acctbal).
  private val q22 = QueryDef(
    "q_tpch_q22_global_sales",
    (s, dir) => {
      val c = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cc"))
      Cached.withCached(c) {
        val avgPos = c.filter(col("cc") > 0L)
          .agg(sum("cc").as("sum_cc"), count(lit(1)).as("n_pos"))
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select("o_custkey").distinct()
        c.crossJoin(broadcast(avgPos))
          .filter(col("cc") * col("n_pos") > col("sum_cc"))
          .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("numcust"), sum("cc").as("totacctbal_cents"))
          .orderBy("c_mktsegment")
      }
    },
    Some("""
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
             CAST(sum(cc) AS BIGINT) AS totacctbal_cents
      FROM (SELECT c_custkey, c_mktsegment,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS cc
            FROM customer) c
      WHERE cc * (SELECT count(*) FROM customer c2
                  WHERE round(c2.c_acctbal * 100) > 0)
            > (SELECT CAST(sum(round(c3.c_acctbal * 100)) AS BIGINT)
               FROM customer c3 WHERE round(c3.c_acctbal * 100) > 0)
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '2000-01-01')
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""))

  override def queries: Seq[QueryDef] = Seq(q4, q13, q17, q21, q22)
}
