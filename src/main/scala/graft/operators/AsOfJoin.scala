package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark lacks natively (build brief §custom
  * operators, preference (a): compose existing ops). For each left row,
  * attach the latest right row with the same key and `rightTs <= leftTs`.
  *
  * Implementation: tagged union + one window with `last_value(..,
  * ignoreNulls)` over (key) ordered by (ts, side, tiebreak) — right rows
  * sort before left rows at equal timestamps so equality qualifies.
  *
  * Scale: ONE shuffle on the key (the window partition), no range
  * explosion, no per-key collect — linear in |left| + |right| and
  * skew-handled by AQE like any window. This beats the naive
  * `left.join(right, rts <= lts)` + latest-per-key (a range join that
  * explodes quadratically on hot keys).
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry (renamed as-is onto the
    *                   left rows; null when no right row precedes).
    * @param tiebreak   right-side column ordering ties at equal rightTs
    *                   (larger wins).
    *
    * All value columns travel in ONE struct filled by a single
    * `last(ignoreNulls)` — per-column fills would mix fields across right
    * rows whenever the latest qualifying row has a null in one column. */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, valueCols: Seq[String],
      tiebreak: String): DataFrame = {
    val lCols = left.columns
    val vStructType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c)))
    val rTagged = right.select(
      (col(key) +: col(rightTs).as("_ts") +: lit(0).as("_side")
        +: col(tiebreak).cast("long").as("_tie")
        +: struct(valueCols.map(col): _*).as("_vs")
        +: lCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val lTagged = left.select(
      (col(key) +: col(leftTs).as("_ts") +: lit(1).as("_side")
        +: lit(Long.MaxValue).as("_tie")
        +: lit(null).cast(vStructType).as("_vs")
        +: lCols.filterNot(_ == key).map(col)): _*)
    val unioned = rTagged.unionByName(lTagged)
    val w = Window.partitionBy(key)
      .orderBy(col("_ts").asc, col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("_vs", last(col("_vs"), ignoreNulls = true).over(w))
    filled.filter(col("_side") === 1)
      .select((lCols.map(col)
        ++ valueCols.map(c => col(s"_vs.$c").as(s"asof_$c"))): _*)
  }

  /** As-of join with a STALENESS BOUND: like [[asOf]], but a match only
    * qualifies when `leftTs - rightTs <= toleranceUs` — the "ignore
    * quotes older than N" semantics of kdb's `wj`/pandas' `merge_asof
    * (tolerance=...)`. This is the variant BASELINE.md names as the case
    * a plain window cannot express *directly*; composed, it can: carry
    * the matched right timestamp INSIDE the filled struct and null the
    * whole match after the fill when it is too stale. Same single
    * shuffle, same linear shape; also emits `asof_age_us` (null when no
    * in-tolerance match) so callers can audit staleness.
    */
  def asOfTolerance(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, valueCols: Seq[String],
      tiebreak: String, toleranceUs: Long): DataFrame = {
    require(toleranceUs >= 0, s"negative tolerance: $toleranceUs")
    val lCols = left.columns
    val vStructType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("_rts",
        right.schema(rightTs).dataType) +: valueCols.map(c => right.schema(c)))
    val rTagged = right.select(
      (col(key) +: col(rightTs).as("_ts") +: lit(0).as("_side")
        +: col(tiebreak).cast("long").as("_tie")
        +: struct((col(rightTs).as("_rts") +: valueCols.map(col)): _*).as("_vs")
        +: lCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val lTagged = left.select(
      (col(key) +: col(leftTs).as("_ts") +: lit(1).as("_side")
        +: lit(Long.MaxValue).as("_tie")
        +: lit(null).cast(vStructType).as("_vs")
        +: lCols.filterNot(_ == key).map(col)): _*)
    val w = Window.partitionBy(key)
      .orderBy(col("_ts").asc, col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rTagged.unionByName(lTagged)
      .withColumn("_vs", last(col("_vs"), ignoreNulls = true).over(w))
    val fresh = col("_vs").isNotNull &&
      (col("_ts") - col("_vs._rts")) <= lit(toleranceUs)
    filled.filter(col("_side") === 1)
      .select((lCols.map(col)
        ++ valueCols.map(c => when(fresh, col(s"_vs.$c")).as(s"asof_$c"))
        :+ when(fresh, col("_ts") - col("_vs._rts")).as("asof_age_us")): _*)
  }
}
