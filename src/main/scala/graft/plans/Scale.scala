package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities for the 100 TB posture (README design rules):
  * skew-salted aggregation and hot-key-aware join salting. AQE's skew-join
  * handling covers sort-merge joins; these cover the cases AQE does not —
  * skewed partial aggregation and broadcast-side key explosion.
  */
object Scale {

  /** Two-stage salted aggregation: counts per (keys) where one key value
    * dominates. Stage 1 aggregates (keys, salt) partials — spreading a hot
    * key over `saltBuckets` reducers; stage 2 re-aggregates the tiny
    * partial table. Equivalent to groupBy(keys).count() for any data. */
  def saltedCount(df: DataFrame, keys: Seq[String], saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id()
      + monotonically_increasing_id(), lit(saltBuckets)))
    salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum("_partial").as("count"))
  }

  /** Salted sum with the same two-stage shape. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id()
      + monotonically_increasing_id(), lit(saltBuckets)))
    salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(valueCol).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum("_partial").as(s"sum_$valueCol"))
  }

  /** Skew-join salting: replicate the small side `saltBuckets`× with an
    * explicit salt column, salt the big side randomly-but-deterministically
    * (hash of a row-unique column), then equi-join on (key, salt). Use when
    * the big side has hot keys AND the join must stay shuffle-based
    * (small side too big to broadcast, AQE disabled or ineffective). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      bigRowId: String, saltBuckets: Int = 16): DataFrame = {
    val bigS = big.withColumn("_salt", pmod(hash(col(bigRowId)), lit(saltBuckets)))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }
}

/** Warehouse layout helpers: the write-side half of the shuffle-avoidance
  * story (SURVEY.md §4 "partition external_signals/document_chunks by
  * company_id or date on write"). */
object Warehouse {

  /** Write partitioned by entity-ish columns → downstream filters prune
    * partitions and per-entity aggregations co-locate. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      mode: String = "overwrite"): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Write bucketed (requires saveAsTable) → bucket-pruned point lookups
    * and shuffle-free joins between tables bucketed on the same key. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }
}
