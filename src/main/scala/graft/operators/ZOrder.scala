package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of several dimension
  * columns into one sort key so that sorting by the key co-locates rows
  * that are close in EVERY dimension at once.
  *
  * Why this is a first-class operator at 100 TB: parquet readers prune row
  * groups with per-column min/max statistics. A table sorted by ONE column
  * has tight stats on that column only — a range predicate on any other
  * column scans everything. Writing `repartitionByRange(zkey) +
  * sortWithinPartitions(zkey)` gives every file a small bounding BOX over
  * all z-ordered dimensions, so multi-dimensional range queries prune files
  * and row groups on every predicate column (the layout trick behind
  * Delta/Iceberg Z-ORDER clustering).
  *
  * The key is pure integer bit arithmetic (shift/and/or) — codegen'd,
  * no UDF, and bit-identical in any engine, so the key math itself is
  * oracle-checkable.
  */
object ZOrder {

  /** Morton key over `dims`, using the low `bits` bits of each (values are
    * masked, so callers should pre-scale coordinates into [0, 2^bits)).
    * Bit i of dimension d lands at position i * ndims + d. */
  def mortonKey(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty && bits * dims.size <= 62,
      s"key would overflow a long: $bits bits x ${dims.size} dims")
    val n = dims.size
    val parts = for {
      (dim, d) <- dims.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftright(dim.cast("long"), i).bitwiseAND(lit(1L)), i * n + d)
    parts.reduce(_.bitwiseOR(_))
  }

  /** Rewrite `df` into the z-ordered layout: range-partition by the Morton
    * key (balanced output files, globally ordered ranges) and sort within
    * each partition so parquet row groups inherit tight bounding boxes. */
  def layout(df: DataFrame, dims: Seq[Column], bits: Int,
      numFiles: Int): DataFrame = {
    val keyed = df.withColumn("_zkey", mortonKey(dims, bits))
    keyed.repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
  }
}
