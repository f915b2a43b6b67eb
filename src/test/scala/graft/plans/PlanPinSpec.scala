package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanPin

/** Pins the r15 lineage-truncation wrapper: same rows, one-node logical
  * plan, reads the SQL cache while live, and recomputes correctly via RDD
  * lineage after unpersist (so a consumer plan built over the pin can
  * outlive the persist scope without wrong results). */
class PlanPinSpec extends SparkSpec {

  test("same rows, leaf-sized plan, survives unpersist") {
    import spark.implicits._
    val base = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .groupBy(expr("k % 7").as("g")).agg(count(lit(1)).as("n"),
        max("v").as("mx"))
    base.persist()
    base.count()
    val pinned = PlanPin.truncated(base)
    // one-node logical plan (LogicalRDD leaf)
    assert(pinned.queryExecution.analyzed.children.isEmpty)
    val expect = base.orderBy("g").collect().toSeq
    assert(pinned.orderBy("g").collect().toSeq == expect)
    // a consumer that buffers rows (join + agg) over the pin
    val consumer = pinned.as("a").join(pinned.as("b"), "g")
      .agg(sum(col("a.n") * col("b.n")).as("s"))
    val live = consumer.collect().head.getLong(0)
    base.unpersist(true)
    // recompute via RDD lineage after the cache is gone
    assert(consumer.collect().head.getLong(0) == live)
    assert(pinned.orderBy("g").collect().toSeq == expect)
  }

  test("no-copy pin: buffering consumers (sort, window) see distinct rows") {
    // r16: PlanPin no longer copies rows per read — RDDScanExec itself
    // re-projects every row into its own buffer before any downstream
    // operator sees it. If that were wrong, a buffering consumer over the
    // pin would alias one reused row: a global sort would collapse to
    // copies of a single value and window ranks would be garbage. This
    // test fails loudly in that world.
    import spark.implicits._
    val base = (1 to 5000).map(i => (i.toLong, s"s$i")).toDF("k", "v")
      .withColumn("g", expr("k % 13"))
    base.persist()
    base.count()
    val pinned = PlanPin.truncated(base)
    val sorted = pinned.orderBy(col("v")).collect()
    assert(sorted.map(_.getString(1)).distinct.length == 5000)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("k")
    val rnSum = pinned.withColumn("rn", row_number().over(w))
      .agg(sum("rn")).collect().head.getLong(0)
    val expect = (1 to 5000).groupBy(_ % 13).values
      .map { grp => val m = grp.size.toLong; m * (m + 1) / 2 }.sum
    assert(rnSum == expect)
    base.unpersist(true)
    spark.catalog.clearCache()
  }

  test("withPinned body receives truncated frames and returns same result") {
    import spark.implicits._
    val in = (1 to 100).map(i => (i % 5, i.toLong)).toDF("g", "x")
    val viaPin = graft.queries.Cached.withPinned(in) { case Seq(p) =>
      assert(p.queryExecution.analyzed.children.isEmpty)
      p.groupBy("g").agg(sum("x").as("s"))
    }.orderBy("g").collect().toSeq
    val direct = in.groupBy("g").agg(sum("x").as("s"))
      .orderBy("g").collect().toSeq
    assert(viaPin == direct)
    spark.catalog.clearCache()
  }
}
