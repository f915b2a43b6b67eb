package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  private val skewed = (Seq.fill(5000)("hot") ++ (1 to 500).map(i => s"k$i"))
    .zipWithIndex.map { case (k, i) => (k, i.toLong, (i % 7).toDouble) }
    .toDF("key", "row_id", "v")

  test("saltedCount ≡ groupBy().count() on skewed data") {
    val expect = skewed.groupBy("key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Scale.saltedCount(skewed, Seq("key"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expect)
  }

  test("saltedSum ≡ groupBy().sum() on skewed data") {
    val expect = skewed.groupBy("key").agg(sum("v").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = Scale.saltedSum(skewed, Seq("key"), "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    expect.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-9, k) }
  }

  test("saltedJoin ≡ plain join on skewed keys") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "label")
    val expect = skewed.join(dim, "key").count()
    val got = Scale.saltedJoin(skewed, dim, "key", "row_id").count()
    assert(got === expect)
    // row-level equality on a sample
    val a = Scale.saltedJoin(skewed, dim, "key", "row_id")
      .select("key", "row_id", "label").collect().map(_.toSeq).toSet
    val b = skewed.join(dim, "key").select("key", "row_id", "label")
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("tables bucketed on the same key join with ZERO exchange") {
    // The co-located join story at 100 TB: pay the shuffle ONCE at write
    // time (bucketBy), then every subsequent join/aggregation on the bucket
    // key is exchange-free. Broadcast is disabled so the join would
    // otherwise be a shuffled SMJ — the assertion is that bucketing alone
    // removes both Exchange nodes.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val dir = java.nio.file.Files.createTempDirectory("graft-bkt").toString
    try {
      val a = (0 until 1000).map(i => (i.toLong % 97, i.toLong))
        .toDF("k", "va")
      val b = (0 until 500).map(i => (i.toLong % 97, i.toLong * 2))
        .toDF("k", "vb")
      spark.sql("DROP TABLE IF EXISTS bj_a")
      spark.sql("DROP TABLE IF EXISTS bj_b")
      a.write.mode("overwrite").format("parquet").bucketBy(8, "k")
        .option("path", s"$dir/a").saveAsTable("bj_a")
      b.write.mode("overwrite").format("parquet").bucketBy(8, "k")
        .option("path", s"$dir/b").saveAsTable("bj_b")
      val j = spark.table("bj_a").join(spark.table("bj_b"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(3000)}")
      // and it is still the correct join
      val expect = a.join(b, "k").count()
      assert(j.count() === expect)
      // bucket-key aggregation is exchange-free too
      val agg = spark.table("bj_a").groupBy("k").agg(sum("va"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "bucket-key aggregation re-shuffled")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bj_a")
      spark.sql("DROP TABLE IF EXISTS bj_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
  }

  test("warehouse partitioned write prunes by partition column") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wh").toString
    Warehouse.writePartitioned(skewed.withColumn("bucket", col("key") === "hot"),
      s"$dir/t", Seq("bucket"))
    val back = spark.read.parquet(s"$dir/t").filter(col("bucket") === true)
    assert(back.count() === 5000)
    // physical plan shows partition filters, not a full scan
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || back.inputFiles.length < 4)
  }
}
