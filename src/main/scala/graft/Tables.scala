package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata (see TESTDATA.md).
  *
  * All tables are plain parquet under `dir` (e.g. /root/testdata/sf0.01).
  * Loaders return the raw schema except `events`, which needs nanosecond
  * handling (below). Filters/projections applied downstream are pushed into
  * the parquet scan by Catalyst — keep these loaders bare so pushdown works.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** events.parquet stores TIMESTAMP(NANOS,false), which Spark's parquet
    * reader rejects outright ([PARQUET_TYPE_ILLEGAL]). Read the nanos as a
    * plain long (legacy conf) and derive:
    *   - ts_us: microseconds-since-epoch (long) — integer `div`, NOT `/`,
    *     because ns-since-epoch (~1.7e18) exceeds double's 53-bit mantissa;
    *   - ts:    a proper TimestampType column (µs precision, matching what
    *     DuckDB sees after its own ns→µs truncation).
    *
    * Generated scale-ups (GenScale's sf1) store ts as a plain µs TIMESTAMP
    * so DuckDB can run the oracle there directly — that branch only
    * derives ts_us.
    *
    * Round 6: the driver's regenerated testdata stores ts as timestamp[us]
    * WITHOUT timezone, which Spark reads as TIMESTAMP_NTZ and `unix_micros`
    * rejects. Every graft session pins spark.sql.session.timeZone=UTC, so
    * casting NTZ→TIMESTAMP is value-identity here and keeps the rest of the
    * engine (and the DuckDB oracle, which sees a naive µs timestamp either
    * way) unchanged. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_us", expr("ts div 1000L"))
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
          .withColumn("ts_us", unix_micros(col("ts")))
      case _ =>
        raw.withColumn("ts_us", unix_micros(col("ts")))
    }
  }
}
