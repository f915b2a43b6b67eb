package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic SKEWED-KEY variant of a generated SF dir (round-9 verdict
  * stretch #6: the salting machinery had only ever been proven on uniform
  * data). Events get two hot keys:
  *   - event_type: every even event_id is re-labeled 'purchase' → the hot
  *     type owns ~60% of the fact table (5 uniform types before);
  *   - user_id: event_id ≡ 1 (mod 4) is re-assigned to user 1 → one hot
  *     user owns ~25% of events.
  * Round 14 (verdict #7) adds a GRAPH HUB: lineitem rows with
  * l_orderkey ≡ 1 (mod 4) are re-assigned to supplier 1, so one supplier
  * node in the customer–supplier purchase graph carries ~25% of all
  * edges — the hub-degree skew that IterScale's partition-count scaling
  * does NOT fix (only per-round shuffle balance does), exercised by
  * q_pagerank_suppliers on this variant.
  * All re-labelings are pure projections of existing key columns, so the
  * variant is bit-reproducible and the DuckDB oracle replays the same
  * data. All other tables are rewritten unchanged.
  *
  * Usage: runMain graft.GenSkew [srcDir dstDir]
  * Defaults: /root/repo/testdata/sf1 → /root/repo/testdata/sf1skew.
  */
object GenSkew {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/repo/testdata/sf1"
    val dst = if (args.length > 1) args(1) else "/root/repo/testdata/sf1skew"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      val out = if (t == "events") {
        df.withColumn("event_type",
            when(pmod(col("event_id"), lit(2)) === 0, lit("purchase"))
              .otherwise(col("event_type")))
          .withColumn("user_id",
            when(pmod(col("event_id"), lit(4)) === 1, lit(1L))
              .otherwise(col("user_id")))
      } else if (t == "lineitem") {
        df.withColumn("l_suppkey",
          when(pmod(col("l_orderkey"), lit(4)) === 1, lit(1L))
            .otherwise(col("l_suppkey")))
      } else df
      out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"  wrote $dst/$t.parquet")
    }
    spark.stop()
  }
}
