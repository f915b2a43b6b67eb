package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (band) join — `left.value BETWEEN right.lo AND right.hi` — the
  * second operator Spark lacks natively (build brief §custom operators,
  * path (a): compose existing ops).
  *
  * Naive Spark plans this as BroadcastNestedLoopJoin (O(|L|·|R|)). Here:
  * bucketize — explode each right range into the fixed-width buckets it
  * overlaps, map each left value to its bucket, equi-join on the bucket,
  * re-filter exactly. Cost O(|L| + |R|·spans + |candidates|); the
  * equi-join shuffles on the bucket key, so AQE skew-splitting applies.
  * Bucket width trades replication (wide ranges → many buckets) against
  * candidate precision — pass the typical range width.
  */
object RangeJoin {

  /** Inner range join: all (left, right) pairs with lo <= value <= hi. */
  def banded(left: DataFrame, right: DataFrame, valueCol: String,
      loCol: String, hiCol: String, bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0)
    val lB = left.withColumn("_bucket",
      floor(col(valueCol) / lit(bucketWidth)).cast("long"))
    val rB = right.withColumn("_bucket",
      explode(sequence(
        floor(col(loCol) / lit(bucketWidth)).cast("long"),
        floor(col(hiCol) / lit(bucketWidth)).cast("long"))))
    lB.join(rB, Seq("_bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("_bucket")
  }
}
