package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

/** Behavior + plan-posture checks for the sketch (KMV/theta) and curation
  * (caps / stratified sample / shard packing) operator families. */
class SketchCurationSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("q_kmv_distinct: estimates land within sketch tolerance of exact") {
    val rows = SparkEntry.queries("q_kmv_distinct")(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("kmv_est")
      // K=32 → stderr ≈ 1/sqrt(K-2) ≈ 18%; 35% is a ~2σ acceptance band
      assert(math.abs(est - exact) / exact < 0.35,
        s"lang=${r.getAs[String]("lang")} est=$est exact=$exact")
    }
  }

  test("q_theta_setops: set-algebra invariants hold for the estimates") {
    val r = SparkEntry.queries("q_theta_setops")(spark, sfDir).collect().head
    val (ea, eb, eu, ei) = (r.getAs[Double]("est_a"), r.getAs[Double]("est_b"),
      r.getAs[Double]("est_union"), r.getAs[Double]("est_inter"))
    assert(ei >= 0.0)
    assert(eu >= math.max(ea, eb) - 1e-9, s"union $eu < max($ea, $eb)")
    val j = r.getAs[Double]("jaccard_est")
    assert(j >= 0.0 && j <= 1.0)
    // exact columns: inclusion–exclusion must hold exactly
    val (na, nb, nu, ni) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("n_union"), r.getAs[Long]("n_inter"))
    assert(na + nb - ni == nu)
  }

  test("sketch hashes are partitioning-invariant (rerun equals itself)") {
    val a = SparkEntry.queries("q_kmv_distinct")(spark, sfDir).collect()
    val n = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "13")
    try {
      val b = SparkEntry.queries("q_kmv_distinct")(spark, sfDir).collect()
      assert(a.toSeq == b.toSeq)
    } finally spark.conf.set("spark.sql.shuffle.partitions", n)
  }

  test("q_source_caps: cap and mass-conservation invariants") {
    val rows = SparkEntry.queries("q_source_caps")(spark, sfDir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= 15L)
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("tokens_kept") <= r.getAs[Long]("tokens_total"))
      // top-k by length ⇒ kept token share ≥ kept doc share
      val docShare = r.getAs[Long]("n_kept").toDouble / r.getAs[Long]("n_docs")
      assert(r.getAs[Double]("token_keep_pct") / 100 >= docShare - 1e-9)
    }
  }

  test("q_stratified_sample: effective rates track the target rates") {
    val rows = SparkEntry.queries("q_stratified_sample")(spark, sfDir).collect()
    rows.foreach { r =>
      val (target, eff) =
        (r.getAs[Double]("target_rate"), r.getAs[Double]("eff_rate"))
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_total"))
      // Bernoulli(n≈64..218): 3σ ≈ 3·sqrt(p(1−p)/n) ≤ 0.19
      assert(math.abs(eff - target) < 0.19, s"eff=$eff target=$target")
    }
  }

  test("q_token_shards: shards respect the budget and pack contiguously") {
    val rows = SparkEntry.queries("q_token_shards")(spark, sfDir).collect()
    val budget = 2000L
    val maxDoc = { // upper bound on any single doc's token count
      import org.apache.spark.sql.functions._
      graft.Tables.documents(spark, sfDir)
        .agg(max(size(split(col("text"), " ")))).collect().head.getInt(0).toLong
    }
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val shards = rs.map(_.getAs[Long]("shard")).sorted.toSeq
      assert(shards.head == 0L, s"$lang shards start at ${shards.head}")
      assert(shards == (0L until shards.length.toLong).toSeq, s"$lang has gaps")
      // a doc assigned by start offset can straddle one boundary, so a
      // shard's total is < budget + the largest straddling doc
      rs.foreach { r =>
        assert(r.getAs[Long]("shard_tokens") < budget + maxDoc,
          s"$lang shard ${r.getAs[Long]("shard")} overflows")
      }
    }
  }

  test("q_token_shards: no unpartitioned window over the document frame") {
    // the running token total must use the bucketed two-pass prefix sum —
    // a bare sum() OVER (ORDER BY …) with empty partitioning would funnel
    // the whole corpus through one task at 100 TB
    val plan = SparkEntry.queries("q_token_shards")(spark, sfDir)
      .queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"unpartitioned window: $w"))
  }

  test("q_kmv_distinct: rank-K filter prunes via WindowGroupLimit") {
    val plan = SparkEntry.queries("q_kmv_distinct")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "bottom-K selection did not trigger the group-limit optimization")
  }
}
