package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (Catalyst's InjectRuntimeFilter): when
  * a shuffle join's build side carries a selective filter, the optimizer can
  * plant a bloom filter of the build-side keys on the probe side, discarding
  * non-joining fact rows BEFORE the shuffle. At 100 TB this is the
  * difference between shuffling the whole fact table and shuffling only the
  * ~selectivity fraction that can join. The rule is size-gated for exactly
  * scale reasons (creation side must be small enough to sketch, application
  * side big enough to bother), so the local fixture lowers the gates to
  * prove the PLAN SHAPE; production keeps the defaults.
  */
class RuntimeFilterSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("selective dim filter injects a bloom filter on the fact side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1000GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val o = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_extendedprice"))
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .agg(sum("l_extendedprice"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") ||
          optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n${optimized.take(3000)}")
      // the filter must sit on the FACT side scan subtree, pruning before
      // the join — and the result must still be correct
      val expected = li.join(o.hint("broadcast"),
        li("l_orderkey") === o("o_orderkey")).agg(sum("l_extendedprice"))
      // double sums differ in the last ulp across plan shapes — compare on
      // the cent grid like every oracle query does
      assert(math.rint(joined.collect().head.getDouble(0) * 100) ===
        math.rint(expected.collect().head.getDouble(0) * 100))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
