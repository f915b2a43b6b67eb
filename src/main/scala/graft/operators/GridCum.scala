package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact cumulative counts over an integral value grid, without a global
  * single-task window.
  *
  * Rank/CDF statistics (KS distance, Mann-Whitney midranks, Gini index)
  * need cumulative tallies ordered by value. A naive
  * `Window.orderBy(value)` puts the whole frame in ONE task — the exact
  * funnel the repo's design rules ban. This operator uses the same
  * two-pass histogram trick as [[HistQuantiles]]:
  *
  *   1. coarse bucket `b = v div bucketWidth`; per-(group, b) totals get an
  *      EXCLUSIVE prefix sum via a window over bucket-count frames only
  *      (range-bounded: #buckets = value-range / bucketWidth, independent
  *      of row count);
  *   2. within each (group, b) a partitioned window finishes the cumsum.
  *
  * Input must already be grouped to one row per (groups, v) — the counts
  * are per-distinct-value tallies, so shuffle traffic is bounded by the
  * value grid, never by the fact-row count. Output = input plus one
  * INCLUSIVE `cum_<c>` long column per count column.
  */
object GridCum {

  def cum(hist: DataFrame, groups: Seq[String], v: String,
      counts: Seq[String], bucketWidth: Long = 4096L): DataFrame = {
    require(counts.nonEmpty)
    val b = expr(s"$v div $bucketWidth")
    val withB = hist.withColumn("_gc_b", b)

    val gCols = groups.map(col)
    val bucketTotals = withB.groupBy((gCols :+ col("_gc_b")): _*)
      .agg(counts.map(c => sum(col(c)).as(s"_t_$c")).head,
        counts.map(c => sum(col(c)).as(s"_t_$c")).tail: _*)
    // pmod(_gc_b, 1): the repo's audited claim-key for bounded global
    // windows — non-foldable so WindowExec sees a partition spec, still
    // one partition. The frame is bucket-count rows (range/bucketWidth),
    // independent of input size; WindowAuditSpec forces every query using
    // this to declare the bound.
    val wB = (if (groups.isEmpty) Window.partitionBy(pmod(col("_gc_b"), lit(1L))) else
        Window.partitionBy(gCols: _*))
      .orderBy("_gc_b").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts.foldLeft(bucketTotals) { (d, c) =>
      d.withColumn(s"_o_$c", coalesce(sum(col(s"_t_$c")).over(wB), lit(0L)))
    }.select((gCols :+ col("_gc_b")) ++ counts.map(c => col(s"_o_$c")): _*)

    val wIn = (if (groups.isEmpty) Window.partitionBy(col("_gc_b")) else
        Window.partitionBy((gCols :+ col("_gc_b")): _*))
      .orderBy(v).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = withB.join(broadcast(offsets),
      groups :+ "_gc_b", "inner")
    counts.foldLeft(joined) { (d, c) =>
      d.withColumn(s"cum_$c", col(s"_o_$c") + sum(col(c)).over(wIn))
    }.drop((counts.map(c => s"_o_$c") :+ "_gc_b"): _*)
  }

  /** Convenience: one count column, no grouping. */
  def cum1(hist: DataFrame, v: String, count: String): DataFrame =
    cum(hist, Nil, v, Seq(count))
}
